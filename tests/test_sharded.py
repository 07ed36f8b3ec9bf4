"""Multi-chip sharding equivalence: with budgets large enough that
compression is the identity, the hash-sharded n-device run must produce
EXACTLY the same projected-energy trajectory as the single-chip run
(deterministic power iterations; collectives only reorder float sums, so
tolerances are float-roundoff level)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu import parallel
from fries_tpu.drivers import frifull, frisys, power
from fries_tpu.ops import molecule as mol


@pytest.fixture(scope="module")
def ham():
    rng = np.random.default_rng(41)
    n_orb, n_elec = 5, 4
    h, eris = dense_fci.random_integrals(rng, n_orb)
    return mol.MolecularHamiltonian(
        hcore=jnp.asarray(h), eris=jnp.asarray(eris),
        symm=jnp.zeros(n_orb, jnp.int32), n_orb=n_orb, n_elec=n_elec,
    )


def test_sharded_exact_run_matches_single(ham):
    n_iter = 30
    # single chip
    cfg1 = power.PowerConfig(eps=0.05, target_nonz=256, capacity=128)
    step1, run1, st1, aux1 = frifull.build(ham, cfg1, seed=0)
    st1, tr1 = run1(
        st1, aux1["num_keys"], aux1["num_vals"], aux1["den_keys"],
        aux1["den_vals"], aux1["ref_key"], n_iter,
    )

    # 8 virtual devices, capacity per shard smaller
    n_dev = 8
    mesh = parallel.make_mesh(n_dev)
    cfg8 = power.PowerConfig(
        eps=0.05, target_nonz=256, capacity=64,
        axis_name=parallel.AXIS, n_shards=n_dev, exchange_cap=512,
    )
    step8, run8, st8, aux8 = frifull.build_sharded(ham, cfg8, seed=0, mesh=mesh)
    st8, tr8 = run8(
        st8, aux8["num_keys"], aux8["num_vals"], aux8["den_keys"],
        aux8["den_vals"], aux8["ref_key"], n_iter,
    )

    assert not bool(np.asarray(tr1["overflow"]).any())
    assert not bool(np.asarray(tr8["overflow"]).any())
    e1 = np.asarray(tr1["proj_num"]) / np.asarray(tr1["proj_den"])
    e8 = np.asarray(tr8["proj_num"]) / np.asarray(tr8["proj_den"])
    np.testing.assert_allclose(e8, e1, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(tr8["norm"]), np.asarray(tr1["norm"]), rtol=1e-9
    )
    np.testing.assert_array_equal(
        np.asarray(tr8["n_dets"]).reshape(-1), np.asarray(tr1["n_dets"]).reshape(-1)
    )


def test_sharded_frisys_runs_and_converges(ham):
    """Stochastic sharded frisys: sanity (finite, no overflow) + energy in the
    right region after a short run."""
    n_dev = 8
    mesh = parallel.make_mesh(n_dev)
    cfg = frisys.FrisysConfig(
        eps=0.05, vec_nonz=64, matr_samp=128, capacity=64, spawn_cap=256,
        target_norm=300.0, axis_name=parallel.AXIS, n_shards=n_dev,
        exchange_cap=128,
    )
    step, run, state, aux = frisys.build_sharded(ham, cfg, seed=1, mesh=mesh)
    state, traj = run(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 400,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[100:]
    den = np.asarray(traj["proj_den"])[100:]
    e_corr = num.sum() / den.sum()
    assert np.isfinite(e_corr)
    assert -2.0 < e_corr < 0.0  # correlation energy of this synthetic system


def test_sharded_subspace_matches_single(ham):
    """Hash-sharded subspace iteration (BASELINE.md required config): with
    exact H and identity-level budgets, the 8-shard run reproduces the
    single-chip h/d trajectories to roundoff."""
    from fries_tpu.drivers import subspace
    import dense_fci as dfci
    from scipy.linalg import eigh

    h = np.asarray(ham.hcore)
    eris = np.asarray(ham.eris)
    dense_h, basis = dfci.build_hamiltonian(h, eris, ham.n_orb, 2, 2)
    evals, evecs = eigh(dense_h)
    t_keys, t_vals = [], []
    for j in range(2):
        top = np.argsort(-np.abs(evecs[:, j]))[:10]
        t_keys.append(
            np.stack([dfci.mask_to_words(basis[i], ham.n_bits) for i in top])
        )
        t_vals.append(evecs[top, j])
    t_keys = jnp.asarray(np.stack(t_keys))
    t_vals = jnp.asarray(np.stack(t_vals))

    common = dict(
        eps=0.05, n_trial=2, vec_nonz=4096, matr_samp=4096, capacity=256,
        spawn_cap=4096, restart_int=10, exact_h=True, compress_mode="sys",
    )
    cfg1 = subspace.SubspaceConfig(**common)
    _, run1, st1, _ = subspace.build(ham, cfg1, t_keys, t_vals, seed=0)
    st1, tr1 = run1(st1, 15)

    n_dev = 8
    mesh = parallel.make_mesh(n_dev)
    cfg8 = subspace.SubspaceConfig(
        **{**common, "capacity": 96},
        axis_name=parallel.AXIS, n_shards=n_dev, exchange_cap=4096,
    )
    _, run8, st8, _ = subspace.build_sharded(
        ham, cfg8, t_keys, t_vals, seed=0, mesh=mesh
    )
    st8, tr8 = run8(st8, 15)

    assert not bool(np.asarray(tr1["overflow"]).any())
    assert not bool(np.asarray(tr8["overflow"]).any())
    np.testing.assert_allclose(
        np.asarray(tr8["h_mat"]), np.asarray(tr1["h_mat"]),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(tr8["d_mat"]), np.asarray(tr1["d_mat"]),
        rtol=1e-9, atol=1e-11,
    )


def test_sharded_fciqmc_runs(ham):
    """Hash-sharded FCIQMC: finite trajectory, no overflow, energy in range."""
    from fries_tpu.drivers import fciqmc

    n_dev = 8
    mesh = parallel.make_mesh(n_dev)
    cfg = fciqmc.FciqmcConfig(
        eps=0.02, target_walkers=400.0, capacity=64, attempt_cap=512,
        distribution="NU", axis_name=parallel.AXIS, n_shards=n_dev,
        exchange_cap=256,
    )
    step, run, state, aux = fciqmc.build_sharded(
        ham, cfg, seed=2, mesh=mesh, init_walkers=80.0
    )
    state, traj = run(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 300,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[100:]
    den = np.asarray(traj["proj_den"])[100:]
    e = num.sum() / den.sum()
    assert np.isfinite(e) and -2.0 < e < 0.0


def test_sharded_observables_matches_single(ham):
    """Hash-sharded replica observable estimator: exact evolution, so the
    8-shard trajectory must match single-chip to roundoff."""
    from fries_tpu.drivers import observables

    common = dict(
        eps=0.05, target_nonz=4096, obs_des=0, obs_cre=3,
        burn_in=3, n_obs=4, btw_obs=4, replica=True,
    )
    cfg1 = observables.ObservablesConfig(capacity=256, **common)
    _, run1, st1, _ = observables.build(ham, cfg1, seed=0)
    st1, tr1 = run1(st1, 12)

    n_dev = 8
    mesh = parallel.make_mesh(n_dev)
    cfg8 = observables.ObservablesConfig(
        capacity=96, axis_name=parallel.AXIS, n_shards=n_dev,
        exchange_cap=4096, **common,
    )
    _, run8, st8, _ = observables.build_sharded(ham, cfg8, seed=0, mesh=mesh)
    st8, tr8 = run8(st8, 12)

    assert not bool(np.asarray(tr1["overflow"]).any())
    assert not bool(np.asarray(tr8["overflow"]).any())
    np.testing.assert_allclose(
        np.asarray(tr8["obs_num"]), np.asarray(tr1["obs_num"]),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(tr8["obs_den"]), np.asarray(tr1["obs_den"]),
        rtol=1e-9, atol=1e-11,
    )
