"""Hubbard-Holstein tests: operator batch vs independent dense H, and the
frifull_hh driver vs dense diagonalization and the reference's own bundled
6-site ground-state energy (examples/hubbard_params.txt)."""

import numpy as np
import jax.numpy as jnp
import pytest

import dense_hubbard
from fries_tpu import dets
from fries_tpu.drivers import frifull_hh, power
from fries_tpu.ops import hubbard as hub

# Exact open-boundary ground state of the 6-site half-filled U=2 Hubbard
# chain from dense diagonalization (tests/dense_hubbard.py).  NOTE: the
# reference's examples/hubbard_params.txt carries gs_energy=-3.9879...,
# but parse_hh_input only uses that number as the diagonal energy-shift
# origin (io_utils.cpp:397-405), not as the exact eigenvalue; the true
# E0 for this geometry is the value below (reproduced independently here
# by two implementations).
EXACT_6SITE_U2_GS = -4.54631379443599


def small_hh():
    return hub.HubbardHolstein(
        n_sites=3, n_elec=2, ph_bits=2, u=1.5, omega=0.7, g=0.4, t=1.0
    )


@pytest.fixture(scope="module")
def dense_small():
    ham = small_hh()
    dense_h, basis = dense_hubbard.build_hamiltonian(
        ham.n_sites, 1, 1, ham.max_ph, ham.t, ham.u, ham.omega, ham.g
    )
    return ham, dense_h, basis


def test_offdiag_and_diag_match_dense(dense_small):
    ham, dense_h, basis = dense_small
    index = {
        dense_hubbard.state_to_mask(s, ham.n_sites, ham.ph_bits): i
        for i, s in enumerate(basis)
    }
    masks = list(index.keys())
    words = jnp.asarray(
        np.stack(
            [
                [(m >> (32 * w)) & 0xFFFFFFFF for w in range(ham.n_words)]
                for m in masks
            ]
        ).astype(np.uint32)
    )
    # diagonal
    got_diag = np.asarray(hub.diag_matrel(ham, words))
    want_diag = np.array([dense_h[index[m], index[m]] for m in masks])
    np.testing.assert_allclose(got_diag, want_diag, atol=1e-12)

    # off-diagonal columns (h_fac = 1)
    new_words, amps = hub.offdiag_batch(ham, words, jnp.ones(len(masks)), 1.0)
    new_words = np.asarray(new_words)
    amps = np.asarray(amps)
    got = np.zeros_like(dense_h)
    for ci, m in enumerate(masks):
        col = index[m]
        for c in range(amps.shape[1]):
            if amps[ci, c] == 0:
                continue
            mask = 0
            for b in range(ham.n_bits):
                if (new_words[ci, c, b // 32] >> (b % 32)) & 1:
                    mask |= 1 << b
            got[index[mask], col] += amps[ci, c]
    want = dense_h - np.diag(np.diag(dense_h))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_frifull_hh_converges_to_dense(dense_small):
    ham, dense_h, basis = dense_small
    from scipy.linalg import eigh

    e0 = eigh(dense_h, eigvals_only=True)[0]
    cfg = power.PowerConfig(eps=0.05, target_nonz=2048, capacity=1024)
    step, run_steps, state, aux = frifull_hh.build(ham, e_ref=float(e0), cfg=cfg, seed=0)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 600,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    est = np.asarray(traj["proj_num"])[-1] / np.asarray(traj["proj_den"])[-1]
    e_tot = float(e0) + est
    np.testing.assert_allclose(e_tot, e0, atol=5e-4)


def test_frifull_hh_6site_hubbard_reference_energy():
    """Pure 6-site Hubbard at half filling, U=2 (the reference's
    examples/run_hubbard.sh workload): energy must reproduce the exact
    dense-diagonalization ground state."""
    ham = hub.HubbardHolstein(n_sites=6, n_elec=6, ph_bits=0, u=2.0, t=1.0)
    # deliberately offset e_ref so the estimator has to recover the difference
    e_ref = EXACT_6SITE_U2_GS + 0.05
    cfg = power.PowerConfig(eps=0.05, target_nonz=2048, capacity=512)
    step, run_steps, state, aux = frifull_hh.build(ham, e_ref=e_ref, cfg=cfg, seed=1)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 1200,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    est = np.asarray(traj["proj_num"])[-1] / np.asarray(traj["proj_den"])[-1]
    e_tot = e_ref + est
    np.testing.assert_allclose(e_tot, EXACT_6SITE_U2_GS, atol=1e-3)


def test_frisys_hh_spawner_exact_when_budget_large():
    """Two-level factorized spawner reconstructs -eps*H_offdiag*v exactly when
    budgets exceed the branch counts."""
    import jax
    from fries_tpu.drivers import frisys_hh as fhh
    from fries_tpu.runtime import arena as ar
    from fries_tpu import dets as d

    ham = small_hh()
    cfg = fhh.FrisysHHConfig(
        eps=0.01, vec_nonz=64, matr_samp=4096, capacity=8, spawn_cap=512
    )
    spawn = fhh.make_spawner(ham, cfg, e_ref=0.0)

    neel = d.pack_bits(d.neel_bits_1d(ham.n_sites, ham.n_elec, ham.n_bits), ham.n_words)
    v1 = hub.with_phonon(ham, neel[None], jnp.asarray([1]), jnp.asarray([2]))[0]
    keys = jnp.stack([neel, v1])
    occ = hub.occ_list(ham, keys)
    vals = jnp.asarray([1.0, -0.4])

    a = ar.make(cfg.capacity, ham.n_words, 1)
    a = ar.from_unsorted(a, keys, vals[None, :])
    avals = jnp.where(a.valid, a.vals[0], 0.0)
    w, amp, _ = jax.jit(spawn)(a.keys, avals, -cfg.eps, jax.random.key(0))

    def dense_map(words, amps):
        out = {}
        words = np.asarray(words); amps = np.asarray(amps)
        for i in range(len(amps)):
            if amps[i] == 0:
                continue
            out[tuple(words[i])] = out.get(tuple(words[i]), 0.0) + amps[i]
        return out

    got = dense_map(w, amp)
    ew, ea = hub.offdiag_batch(ham, a.keys, avals, -cfg.eps)
    want = dense_map(ew.reshape(-1, ham.n_words), ea.reshape(-1))
    for k in set(got) | set(want):
        np.testing.assert_allclose(
            got.get(k, 0.0), want.get(k, 0.0), rtol=1e-9, atol=1e-12
        )


def test_frisys_hh_end_to_end(dense_small):
    """Stochastic two-level FRI on the small Hubbard-Holstein system."""
    from fries_tpu.drivers import frisys_hh as fhh
    from scipy.linalg import eigh

    ham, dense_h, basis = dense_small
    e0 = eigh(dense_h, eigvals_only=True)[0]
    cfg = fhh.FrisysHHConfig(
        eps=0.02, vec_nonz=60, matr_samp=120, capacity=1024, spawn_cap=512,
        target_norm=400.0,
    )
    step, run_steps, state, aux = fhh.build(ham, e_ref=float(e0), cfg=cfg, seed=3)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 2500,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[800:]
    den = np.asarray(traj["proj_den"])[800:]
    e_est = float(e0) + num.sum() / den.sum()
    blocks = np.array_split(num, 10)
    dblocks = np.array_split(den, 10)
    bm = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = bm.std() / np.sqrt(len(bm))
    assert abs(e_est - e0) < max(5 * sigma, 0.03), (e_est, e0, sigma)
