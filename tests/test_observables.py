"""Observable-estimator tests (Rayleigh + replica) vs dense ground state."""

import numpy as np
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu.drivers import observables
from fries_tpu.ops import molecule as mol


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(31)
    n_orb, n_elec = 5, 4
    h, eris = dense_fci.random_integrals(rng, n_orb)
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(h), eris=jnp.asarray(eris),
        symm=jnp.zeros(n_orb, jnp.int32), n_orb=n_orb, n_elec=n_elec,
    )
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, n_orb, 2, 2)
    e0, psi0 = dense_fci.ground_state(dense_h)
    return ham, dense_h, basis, psi0


def dense_one_elec(basis, n_orb, des, cre):
    """Dense matrix of O = sum_s a^+_cre a_des in the FCI basis."""
    index = {m: i for i, m in enumerate(basis)}
    dim = len(basis)
    op = np.zeros((dim, dim))
    for col, mask in enumerate(basis):
        for spin in range(2):
            d = des + spin * n_orb
            c = cre + spin * n_orb
            m1, s1 = dense_fci.annihilate(mask, d)
            if m1 is None:
                continue
            m2, s2 = dense_fci.create(m1, c)
            if m2 is None:
                continue
            op[index[m2], col] += s1 * s2
    return op


@pytest.mark.parametrize("replica", [False, True])
def test_observable_matches_dense_rdm(system, replica):
    ham, dense_h, basis, psi0 = system
    des, cre = 1, 2
    op = dense_one_elec(basis, ham.n_orb, des, cre)
    want = psi0 @ op @ psi0 / (psi0 @ psi0)

    cfg = observables.ObservablesConfig(
        eps=0.05, target_nonz=256, capacity=128, obs_des=des, obs_cre=cre,
        burn_in=300, n_obs=10, btw_obs=10, replica=replica,
    )
    step, run_steps, state, aux = observables.build(ham, cfg, seed=2)
    state, traj = run_steps(state, 600)
    assert not bool(np.asarray(traj["overflow"]).any())
    in_obs = np.asarray(traj["in_obs"])
    num = np.asarray(traj["obs_num"])
    den = np.asarray(traj["obs_den"])
    if replica:
        sel = np.arange(len(num)) >= cfg.burn_in
    else:
        sel = in_obs
    est = num[sel].sum() / den[sel].sum()
    # deterministic budgets (target_nonz >= Hilbert dim): tight agreement
    np.testing.assert_allclose(est, want, atol=5e-3)
