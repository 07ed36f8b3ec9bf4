"""Time-reversal folding tests: the folded operator built from adjust_exact +
tr_diag must equal the dense spin-flip-symmetrized Hamiltonian block."""

import numpy as np
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu import dets
from fries_tpu.ops import molecule as mol
from fries_tpu.ops import time_reversal as tr


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(51)
    n_orb, n_elec = 4, 4
    h, eris = dense_fci.random_integrals(rng, n_orb)
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(h), eris=jnp.asarray(eris),
        symm=jnp.zeros(n_orb, jnp.int32), n_orb=n_orb, n_elec=n_elec,
    )
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, n_orb, 2, 2)
    return ham, dense_h, basis


def flip_mask(mask, n_orb):
    alpha = mask & ((1 << n_orb) - 1)
    beta = mask >> n_orb
    return beta | (alpha << n_orb)


def folded_dense(dense_h, basis, n_orb, parity):
    """Spin-flip-symmetrized dense block and its canonical-det basis order."""
    index = {m: i for i, m in enumerate(basis)}
    canon = []
    for m in basis:
        fm = flip_mask(m, n_orb)
        if m < fm or m == fm:
            if m == fm and parity == -1:
                continue
            canon.append(m)
    cols = []
    for m in canon:
        fm = flip_mask(m, n_orb)
        v = np.zeros(len(basis))
        if m == fm:
            v[index[m]] = 1.0
        else:
            v[index[m]] = 1 / np.sqrt(2)
            v[index[fm]] += parity / np.sqrt(2)
        cols.append(v)
    p_mat = np.stack(cols, axis=1)
    return p_mat.T @ dense_h @ p_mat, canon


@pytest.mark.parametrize("parity", [1, -1])
def test_folded_operator_matches_dense(system, parity):
    ham, dense_h, basis = system
    hf_fold, canon = folded_dense(dense_h, basis, ham.n_orb, parity)
    index = {m: i for i, m in enumerate(canon)}

    words = jnp.asarray(
        np.stack([dense_fci.mask_to_words(m, ham.n_bits) for m in canon])
    )
    occ = dets.occ_list(words, ham.n_bits, ham.n_elec)
    tmpl = mol.ExcitationTemplate.build(ham.n_orb, ham.n_elec)

    # off-diagonal: exact spawns + adjust_exact accumulate to the folded block
    got = np.zeros_like(hf_fold)
    # non-unit amplitudes and h_fac exercise the scale handling
    v_in = jnp.asarray(1.0 + 0.1 * np.arange(len(canon)))
    h_fac = -0.05
    nw, amps, _ = mol.exact_offdiag_batch(ham, tmpl, words, occ, v_in, h_fac)
    nc = amps.shape[1]
    parents = jnp.repeat(words, nc, axis=0)
    pocc = jnp.repeat(occ, nc, axis=0)
    tgt, adj = tr.adjust_exact(
        ham, parents, pocc, nw.reshape(-1, ham.n_words), amps.reshape(-1),
        parity, scale=jnp.repeat(v_in, nc) * h_fac,
    )
    adj = adj / jnp.repeat(v_in, nc) / h_fac  # back to bare elements
    tgt = np.asarray(tgt)
    adj = np.asarray(adj)
    flat_amps = np.asarray(amps.reshape(-1))
    for i in range(len(adj)):
        if adj[i] == 0 or flat_amps[i] == 0:
            continue
        col = i // nc
        m = 0
        for b in range(ham.n_bits):
            if (tgt[i, b // 32] >> (b % 32)) & 1:
                m |= 1 << b
        got[index[m], col] += adj[i]
    want_off = hf_fold - np.diag(np.diag(hf_fold))
    np.testing.assert_allclose(got, want_off, rtol=1e-9, atol=1e-10)

    # diagonal: bare diag + tr_diag delta
    base = np.asarray(mol.diag_matrel(ham, occ))
    delta, forbid = tr.tr_diag(ham, words, occ, parity)
    got_diag = base + np.asarray(delta)
    assert not np.asarray(forbid).any()  # canon excludes odd self-conjugates
    np.testing.assert_allclose(got_diag, np.diag(hf_fold), rtol=1e-9, atol=1e-10)


def test_folded_spectra_partition(system):
    """Even + odd folded spectra together must reproduce the full spectrum."""
    ham, dense_h, basis = system
    from scipy.linalg import eigh

    he, _ = folded_dense(dense_h, basis, ham.n_orb, 1)
    ho, _ = folded_dense(dense_h, basis, ham.n_orb, -1)
    all_evals = np.sort(
        np.concatenate([eigh(he, eigvals_only=True), eigh(ho, eigvals_only=True)])
    )
    np.testing.assert_allclose(
        all_evals, eigh(dense_h, eigvals_only=True), atol=1e-9
    )


def test_frifull_time_reversal_even_sector(system):
    """Exact FRI in the TR-even sector converges to the even-sector ground
    state (== global ground state for this system)."""
    from scipy.linalg import eigh
    from fries_tpu.drivers import frifull, power

    ham, dense_h, basis = system
    he, _ = folded_dense(dense_h, basis, ham.n_orb, 1)
    e0_even = eigh(he, eigvals_only=True)[0]
    cfg = power.PowerConfig(eps=0.05, target_nonz=256, capacity=128)
    step, run_steps, state, aux = frifull.build(ham, cfg, seed=0, spin_parity=1)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 400,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    e_est = np.asarray(traj["proj_num"])[-1] / np.asarray(traj["proj_den"])[-1]
    np.testing.assert_allclose(float(aux["e_ref"]) + e_est, e0_even, atol=3e-4)
