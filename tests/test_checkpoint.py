"""Checkpoint/resume round trip: saving mid-run and restoring must continue
the deterministic trajectory identically (reference DistVec::save/load +
S.txt shift resume, vec_utils.hpp:713-848, frisys_mol.cpp:257-263)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

import dense_fci
from fries_tpu.drivers import frifull, power
from fries_tpu.ops import molecule as mol
from fries_tpu.runtime import checkpoint


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(61)
    h, eris = dense_fci.random_integrals(rng, 5)
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(h), eris=jnp.asarray(eris),
        symm=jnp.zeros(5, jnp.int32), n_orb=5, n_elec=4,
    )
    cfg = power.PowerConfig(eps=0.05, target_nonz=256, capacity=128)
    step, run_steps, state, aux = frifull.build(ham, cfg, seed=0)
    est = (aux["num_keys"], aux["num_vals"], aux["den_keys"], aux["den_vals"],
           aux["ref_key"])

    state, _ = run_steps(state, *est, 20)
    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save_state(path, state)

    # continue the original
    state_a, traj_a = run_steps(state, *est, 10)

    # restore and continue
    arena = checkpoint.load_arena(path)
    scalars = checkpoint.load_scalars(path)
    restored = power.PowerState(
        arena=arena,
        en_shift=jnp.asarray(scalars["en_shift"]),
        last_norm=jnp.asarray(scalars["last_norm"]),
        key=checkpoint.restore_key(path),
        iterat=jnp.asarray(scalars["iterat"]),
    )
    state_b, traj_b = run_steps(restored, *est, 10)

    np.testing.assert_allclose(
        np.asarray(traj_b["proj_num"]), np.asarray(traj_a["proj_num"]),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(traj_b["norm"]), np.asarray(traj_a["norm"]), rtol=1e-12
    )
