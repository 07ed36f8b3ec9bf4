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
          init_val: float = 100.0, spin_parity: int = 0):
    """Returns (step, run_steps, state, aux) ready to iterate.

    aux carries the HF trial vector, reference key, and e_ref (the HF
    diagonal used as the energy origin, frisys_mol.cpp:111-113).

    spin_parity in {0, +1, -1}: 0 = no time-reversal folding; otherwise the
    vector lives on spin-flip canonical representatives of the chosen sector
    (h_op_offdiag spin_parity, molecule.cpp:263-266; ops.time_reversal).
    """
    from fries_tpu.ops import time_reversal as tr_mod

    tmpl = mol.ExcitationTemplate.build(ham.n_orb, ham.n_elec)
    hf_words, hf_occ, hf_en = mol.hf_reference(ham)

    def spawn_one(keys, vals, h_fac, key):
        from fries_tpu import dets as d

        occ = d.occ_list(keys, ham.n_bits, ham.n_elec)
        new_words, amps, _ = mol.exact_offdiag_batch(
            ham, tmpl, keys, occ, vals, h_fac
        )
        nc = amps.shape[1]
        flat_words = new_words.reshape(-1, ham.n_words)
        flat_amps = amps.reshape(-1)
        if spin_parity:
            parents = jnp.repeat(keys, nc, axis=0)
            pocc = jnp.repeat(occ, nc, axis=0)
            scale = jnp.repeat(vals, nc) * h_fac
            flat_words, flat_amps = tr_mod.adjust_exact(
                ham, parents, pocc, flat_words, flat_amps, spin_parity,
                scale=scale,
            )
        flat_ini = power.per_parent_ini(vals, cfg.init_thresh, nc)
        return flat_words, flat_amps, flat_ini

    spawn_fn = power.chunked(spawn_one, cfg.capacity, cfg.batch, ham.n_words)
    from fries_tpu.drivers import frisys as _frisys

    diag_fn = _frisys.make_diag_fn(ham, hf_en, spin_parity)
    # per-chunk fused spawn+merge (reference Adder flow control) whenever
    # chunking is on: the full candidate stream never materializes
    step, run_steps = power.make_stepper(
        spawn_fn, diag_fn, cfg,
        spawn_chunk_fn=spawn_one if cfg.batch else None,
    )

    if spin_parity:
        from fries_tpu.ops import time_reversal as _tr

        _, forbid = _tr.tr_diag(ham, hf_words[None], hf_occ[None], spin_parity)
        assert not bool(forbid[0]) or spin_parity == 1, (
            "HF determinant is spin-flip self-conjugate; start the odd sector "
            "from an open-shell determinant"
        )
    a = ar.make(cfg.capacity, ham.n_words, 2)
    a = ar.from_unsorted(
        a,
        hf_words[None],
        jnp.asarray([[init_val], [0.0]]),
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

    def spawn_one(keys, vals, h_fac, key):
        from fries_tpu import dets as d

        occ = d.occ_list(keys, ham.n_bits, ham.n_elec)
        new_words, amps, _ = _mol.exact_offdiag_batch(
            ham, tmpl, keys, occ, vals, h_fac
        )
        flat_words = new_words.reshape(-1, ham.n_words)
        flat_amps = amps.reshape(-1)
        flat_ini = power.per_parent_ini(vals, cfg.init_thresh, amps.shape[1])
        return flat_words, flat_amps, flat_ini

    spawn_fn = power.chunked(spawn_one, cfg.capacity, cfg.batch, ham.n_words)
    from fries_tpu.drivers import frisys as _frisys

    diag_fn = _frisys.make_diag_fn(ham, hf_en)
    step, run_steps = power.make_stepper(spawn_fn, diag_fn, cfg)
    sharded_step, sharded_run = parallel.shard_stepper(
        step, run_steps, mesh, cfg.axis_name
    )
    state = parallel.sharded_state(
        hf_words[None], jnp.asarray([[init_val], [0.0]]),
        cfg.n_shards, cfg.capacity, seed,
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
