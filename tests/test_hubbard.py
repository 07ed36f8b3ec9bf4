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
