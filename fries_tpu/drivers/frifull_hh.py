"""frifull_hh: exact-Hamiltonian FRI power method for the Hubbard-Holstein
model (FRIES_bin/frifull_hh.cpp).

Starts from the Neel state scaled by 100 (frifull_hh.cpp:119-121); the
projected energy uses the static connected-set estimator
(ops.hubbard.reference_connections), which reproduces the reference's
calc_ref_ovlp numerator (frifull_hh.cpp:292-304) as one arena dot:

    numerator  = <neel| (H - e_ref) |psi>
    denominator = psi(neel)

where e_ref is the exact/target ground-state energy from the params file
(``gs_energy``), matching the reference's hf_en convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from fries_tpu import dets
from fries_tpu.drivers import power
from fries_tpu.ops import hubbard as hub
from fries_tpu.runtime import arena as ar


def build(ham: hub.HubbardHolstein, e_ref: float, cfg: power.PowerConfig,
          seed: int, init_val: float = 100.0):
    neel = dets.pack_bits(
        dets.neel_bits_1d(ham.n_sites, ham.n_elec, ham.n_bits), ham.n_words
    )

    def spawn_one(keys, vals, h_fac, key):
        new_words, amps = hub.offdiag_batch(ham, keys, vals, h_fac)
        flat_words = new_words.reshape(-1, ham.n_words)
        flat_amps = amps.reshape(-1)
        flat_ini = power.per_parent_ini(vals, cfg.init_thresh, amps.shape[1])
        return flat_words, flat_amps, flat_ini

    spawn_fn = power.chunked(spawn_one, cfg.capacity, cfg.batch, ham.n_words)

    def diag_fn(keys):
        return hub.diag_matrel(ham, keys) - e_ref

    step, run_steps = power.make_stepper(
        spawn_fn, diag_fn, cfg, estimator="direct"
    )

    a = ar.make(cfg.capacity, ham.n_words, 2)
    a = ar.from_unsorted(a, neel[None], jnp.asarray([[init_val], [0.0]]))
    state = power.fresh_state(a, seed)

    conn_keys, conn_mels = hub.reference_connections(ham, neel, e_ref)
    aux = {
        "e_ref": e_ref,
        "num_keys": conn_keys,
        "num_vals": conn_mels,
        "den_keys": neel[None],
        "den_vals": jnp.ones((1,)),
        "ref_key": neel,
        "neel": neel,
    }
    return step, run_steps, state, aux
