"""Accuracy anchor at a size where compression actually bites: an 8-orbital
6-electron dense-FCI cross-check (3136 determinants) with the kept-vector
budget well below the space size, reporting the error +- 2 sigma and
statistical efficiency in the reference's units (Benchmarks/calc_stats.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu import stats
from fries_tpu.drivers import frisys
from fries_tpu.ops import molecule as mol


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(77)
    n_orb, n_elec = 8, 6
    h, eris = dense_fci.random_integrals(rng, n_orb, scale_two=0.12)
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(h), eris=jnp.asarray(eris),
        symm=jnp.zeros(n_orb, jnp.int32), n_orb=n_orb, n_elec=n_elec,
    )
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, n_orb, 3, 3)
    e0, _ = dense_fci.ground_state(dense_h)
    return ham, float(e0), len(basis)


def test_compressed_frisys_error_and_efficiency(system):
    ham, e0, dim = system
    assert dim == 3136
    # budgets far below the space: compression is the dominant error source
    cfg = frisys.FrisysConfig(
        eps=0.04, vec_nonz=1200, matr_samp=6000, capacity=4096,
        spawn_cap=9000, target_norm=2000.0, init_thresh=1.0,
    )
    step, run_steps, state, aux = frisys.build(ham, cfg, seed=9)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 3000,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])
    den = np.asarray(traj["proj_den"])
    exact_corr = e0 - float(aux["e_ref"])
    out = stats.trajectory_stats(num, den, exact_corr=exact_corr, burn_in=800)
    # the estimator must be compatible with the exact correlation energy on
    # purely statistical grounds - no flat mEh slack that could hide a
    # systematic bias (measured 2026-08-17: error 2.76 mEh, 2sigma 3.99 mEh)
    assert abs(out["error_mEh"]) < 3 * out["two_sigma_mEh"], out
    assert 0.02 < out["two_sigma_mEh"] < 8.0, out
    assert out["iat"] >= 1.0
    assert out["efficiency"] > 0
    # the vector really is compressed (kept nonzeros bounded by the budget)
    nn = np.asarray(traj["nnonz"])[-100:]
    assert nn.max() <= cfg.vec_nonz * 1.2 + 64
