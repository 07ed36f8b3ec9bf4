"""frifull_mol: exact-Hamiltonian FRI power method for molecules.

Thin adapter binding the molecular exact off-diagonal spawner
(ops.molecule.exact_offdiag_batch) to the generic power-iteration core
(drivers.power).  Mirrors FRIES_bin/frifull_mol.cpp: deterministic full H*v
each iteration, systematic vector compression, HF-relative diagonal shift,
before/after projected-energy estimator (frifull_mol.cpp:289-301).
"""

from __future__ import annotations

import jax.numpy as jnp

from fries_tpu.drivers import power
from fries_tpu.ops import molecule as mol
from fries_tpu.runtime import arena as ar

FrifullConfig = power.PowerConfig


def build(ham: mol.MolecularHamiltonian, cfg: power.PowerConfig, seed: int,
          init_val: float = 100.0):
    """Returns (step, run_steps, state, aux) ready to iterate.

    aux carries the HF trial vector, reference key, and e_ref (the HF
    diagonal used as the energy origin, frisys_mol.cpp:111-113).
    """
    tmpl = mol.ExcitationTemplate.build(ham.n_orb, ham.n_elec)
    hf_words, hf_occ, hf_en = mol.hf_reference(ham)

    def spawn_one(keys, occ, vals, h_fac, key):
        new_words, amps, new_occ = mol.exact_offdiag_batch(
            ham, tmpl, keys, occ, vals, h_fac
        )
        flat_words = new_words.reshape(-1, ham.n_words)
        flat_amps = amps.reshape(-1)
        flat_occ = new_occ.reshape(-1, ham.n_elec)
        flat_diag = mol.diag_matrel(ham, flat_occ) - hf_en
        flat_ini = power.per_parent_ini(vals, cfg.init_thresh, amps.shape[1])
        return flat_words, flat_amps, flat_occ, flat_diag, flat_ini

    spawn_fn = power.chunked(
        spawn_one, cfg.capacity, cfg.batch, ham.n_words, ham.n_elec
    )
    step, run_steps = power.make_stepper(spawn_fn, cfg)

    a = ar.make(cfg.capacity, ham.n_words, 2, ham.n_elec)
    a = ar.from_unsorted(
        a,
        hf_words[None],
        jnp.asarray([[init_val], [0.0]]),
        hf_occ[None],
        jnp.zeros((1,)),
    )
    state = power.fresh_state(a, seed)
    aux = {
        "e_ref": hf_en,
        "num_keys": hf_words[None],
        "num_vals": jnp.ones((1,)),
        "den_keys": hf_words[None],
        "den_vals": jnp.ones((1,)),
        "ref_key": hf_words,
    }
    return step, run_steps, state, aux


def build_sharded(ham: mol.MolecularHamiltonian, cfg: power.PowerConfig,
                  seed: int, mesh, init_val: float = 100.0):
    """Hash-sharded exact-H FRI over a 1-D mesh (all-to-all spawn exchange;
    deterministic given budgets, so single-chip and n-chip runs agree
    exactly when compression keeps everything)."""
    from fries_tpu import parallel
    from fries_tpu.ops import molecule as _mol

    assert cfg.axis_name and cfg.n_shards == mesh.devices.size
    tmpl = _mol.ExcitationTemplate.build(ham.n_orb, ham.n_elec)
    hf_words, hf_occ, hf_en = _mol.hf_reference(ham)

    def spawn_one(keys, occ, vals, h_fac, key):
        new_words, amps, new_occ = _mol.exact_offdiag_batch(
            ham, tmpl, keys, occ, vals, h_fac
        )
        flat_words = new_words.reshape(-1, ham.n_words)
        flat_amps = amps.reshape(-1)
        flat_occ = new_occ.reshape(-1, ham.n_elec)
        flat_diag = _mol.diag_matrel_chunked(ham, flat_occ) - hf_en
        flat_ini = power.per_parent_ini(vals, cfg.init_thresh, amps.shape[1])
        return flat_words, flat_amps, flat_occ, flat_diag, flat_ini

    spawn_fn = power.chunked(
        spawn_one, cfg.capacity, cfg.batch, ham.n_words, ham.n_elec
    )
    step, run_steps = power.make_stepper(spawn_fn, cfg)
    sharded_step, sharded_run = parallel.shard_stepper(
        step, run_steps, mesh, cfg.axis_name
    )
    state = parallel.sharded_state(
        hf_words[None], jnp.asarray([[init_val], [0.0]]), hf_occ[None],
        jnp.zeros((1,)), cfg.n_shards, cfg.capacity, seed,
    )
    aux = {
        "e_ref": hf_en,
        "num_keys": hf_words[None],
        "num_vals": jnp.ones((1,)),
        "den_keys": hf_words[None],
        "den_vals": jnp.ones((1,)),
        "ref_key": hf_words,
    }
    return sharded_step, sharded_run, state, aux
