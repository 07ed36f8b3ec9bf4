"""End-to-end test of the exact-multiplication FRI driver (frifull_mol path)
against independent dense FCI on a synthetic molecule.

With a compression budget exceeding the full Hilbert-space size the driver is
a deterministic power method and must converge to the exact ground-state
energy; with a small budget it must agree within stochastic error.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu.drivers import frifull, power
from fries_tpu.ops import molecule as mol


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(11)
    n_orb, n_elec = 5, 4
    h, eris = dense_fci.random_integrals(rng, n_orb)
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(h),
        eris=jnp.asarray(eris),
        symm=jnp.zeros(n_orb, jnp.int32),
        n_orb=n_orb,
        n_elec=n_elec,
    )
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, n_orb, 2, 2)
    e0, _ = dense_fci.ground_state(dense_h)
    return ham, e0


def test_deterministic_power_method_converges(system):
    ham, e0 = system
    cfg = power.PowerConfig(eps=0.05, target_nonz=256, capacity=128)
    step, run_steps, state, aux = frifull.build(ham, cfg, seed=0)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 400,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    e_est = np.asarray(traj["proj_num"]) / np.asarray(traj["proj_den"])
    e_tot = float(aux["e_ref"]) + e_est[-1]
    np.testing.assert_allclose(e_tot, e0, atol=2e-4)
    # the estimate trajectory must have converged (last two within 1e-6)
    assert abs(e_est[-1] - e_est[-2]) < 1e-5


def test_stochastic_compression_agrees(system):
    ham, e0 = system
    cfg = power.PowerConfig(
        eps=0.05, target_nonz=40, capacity=128, target_norm=300.0
    )
    step, run_steps, state, aux = frifull.build(ham, cfg, seed=3)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 1500,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[500:]
    den = np.asarray(traj["proj_den"])[500:]
    e_est = float(aux["e_ref"]) + num.sum() / den.sum()
    # stochastic error bar: generous 4-sigma-ish window from blocked means
    blocks = np.array_split(num, 10)
    dblocks = np.array_split(den, 10)
    block_means = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = block_means.std() / np.sqrt(len(block_means))
    assert abs(e_est - e0) < max(4 * sigma, 0.02), (e_est, e0, sigma)


def test_chunked_fused_merge_matches_flat(system):
    """batch > 0 routes through the fused per-chunk spawn+merge scan
    (power.make_stepper spawn_chunk_fn, the reference's Adder flow control,
    molecule.cpp:602-608); trajectories must match the flat path."""
    ham, _ = system
    out = {}
    for batch in (0, 16):
        cfg = power.PowerConfig(
            eps=0.05, target_nonz=256, capacity=128, batch=batch,
        )
        step, run_steps, state, aux = frifull.build(ham, cfg, seed=0)
        state, traj = run_steps(
            state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"], 6,
        )
        assert not bool(np.asarray(traj["overflow"]).any())
        out[batch] = (
            np.asarray(traj["proj_num"]), np.asarray(traj["proj_den"]),
            np.asarray(traj["norm"]),
        )
    for a, b in zip(out[0], out[16]):
        np.testing.assert_allclose(a, b, rtol=1e-9)


def test_chunked_dedup_matches_flat(system):
    """dedup_cap routes each chunk's candidate stream through
    arena.dedup_spawns before the merge; trajectories must match the flat
    path (same sums, different association order only)."""
    ham, _ = system
    out = {}
    for dedup in (0, 512):
        cfg = power.PowerConfig(
            eps=0.05, target_nonz=256, capacity=128, batch=16,
            dedup_cap=dedup,
        )
        step, run_steps, state, aux = frifull.build(ham, cfg, seed=0)
        state, traj = run_steps(
            state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"], 6,
        )
        assert not bool(np.asarray(traj["overflow"]).any())
        out[dedup] = (
            np.asarray(traj["proj_num"]), np.asarray(traj["proj_den"]),
            np.asarray(traj["norm"]),
        )
    for a, b in zip(out[0], out[512]):
        np.testing.assert_allclose(a, b, rtol=1e-9)
