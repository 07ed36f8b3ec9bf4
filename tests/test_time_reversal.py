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


def test_sampled_tr_fold_matches_exact(system):
    """frisys HB-PP spawner with spin_parity: in the large-budget limit the
    folded sampled spawns reproduce the exact folded H application
    (apply_HBPP_piv spin_parity branch, heat_bathPP.cpp:1326-1407)."""
    import jax
    from fries_tpu.drivers import frisys
    from fries_tpu.ops import heat_bath as hb

    ham, dense_h, basis = system
    n_orb, n_elec = ham.n_orb, ham.n_elec
    syminfo = mol.SymmInfo.build(np.asarray(ham.symm))
    tens = hb.setup(ham)
    p_doub = frisys.hf_p_doub(ham, syminfo)
    hf_words, hf_occ, hf_en = mol.hf_reference(ham)

    # folded start vector: HF (self-conjugate) + one canonical excited det
    d2, _ = dets.double_parity(
        hf_words[None], jnp.asarray([0]), jnp.asarray([n_orb]),
        jnp.asarray([3]), jnp.asarray([n_orb + 3]),
    )
    keys = jnp.concatenate([hf_words[None], d2])
    canon, fac, selfc = tr.canonicalize(ham, keys, 1)
    keys = canon
    occ = dets.occ_list(keys, 2 * n_orb, n_elec)
    vals = jnp.asarray([1.0, -0.4])

    for parity in (1, -1):
        if parity == -1:
            use = ~np.asarray(dets.det_eq(keys, tr.flip(ham, keys)))
            v_use = jnp.where(jnp.asarray(use), vals, 0.0)
        else:
            v_use = vals
        cfg = frisys.FrisysConfig(
            eps=0.01, vec_nonz=64, matr_samp=200000, capacity=8,
            spawn_cap=2048, spin_parity=parity, stage_f32=False,
        )
        spawn = frisys.make_hbpp_spawner(
            ham, tens, syminfo, p_doub, cfg, e_ref=0.0
        )
        w, amp, _ = jax.jit(spawn)(
            keys, v_use, -cfg.eps, jax.random.key(0)
        )
        got = {}
        wn = np.asarray(w)
        an = np.asarray(amp)
        for i in range(len(an)):
            if an[i] != 0:
                k = tuple(int(x) for x in wn[i])
                got[k] = got.get(k, 0.0) + an[i]

        # exact folded reference: exact spawns + adjust_exact
        tmpl = mol.ExcitationTemplate.build(n_orb, n_elec)
        ew, ea, _ = mol.exact_offdiag_batch(ham, tmpl, keys, occ, v_use, -cfg.eps)
        nc = ea.shape[1]
        parents = jnp.repeat(keys, nc, axis=0)
        pocc = jnp.repeat(occ, nc, axis=0)
        scale = jnp.repeat(v_use, nc) * (-cfg.eps)
        fw, fa = tr.adjust_exact(
            ham, parents, pocc, ew.reshape(-1, ham.n_words), ea.reshape(-1),
            parity, scale=scale,
        )
        want = {}
        fwn = np.asarray(fw)
        fan = np.asarray(fa)
        for i in range(len(fan)):
            if fan[i] != 0:
                k = tuple(int(x) for x in fwn[i])
                want[k] = want.get(k, 0.0) + fan[i]

        for k in set(got) | set(want):
            np.testing.assert_allclose(
                got.get(k, 0.0), want.get(k, 0.0), rtol=1e-8, atol=1e-12,
                err_msg=f"parity={parity} det={k}",
            )
