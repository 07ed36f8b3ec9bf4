"""FRI power iteration with *exact* (uncompressed) Hamiltonian application
and systematic vector compression - the molecular ``frifull_mol`` workload.

Re-designs FRIES_bin/frifull_mol.cpp as one jit-compiled iteration step:

  v <- (1 - eps (H - hf_en - S)) v     (diagonal shifted by the HF energy)

* Exact off-diagonal application materializes every symmetry-allowed
  excitation of every occupied determinant as a masked spawn batch
  (ops.molecule.exact_offdiag_batch) and accumulates it by sort-merge -
  replacing the flow-controlled Adder streaming of h_op_offdiag
  (molecule.cpp:448-665).
* The projected energy uses the before/after-multiply trick of
  frifull_mol.cpp:289-301: <t|H|v> = ((1 + eps S) <t|v> - <t|v_new>) / eps,
  avoiding an H|trial> vector.
* Vector compression = find_preserve + systematic resampling
  (frifull_mol compression step; compress_utils.cpp:29-105, 278-351), then
  zero-valued entries are compacted away, protecting the reference
  determinant (frifull_hh.cpp:311-316).

Energies are reported relative to ``e_ref`` (the HF diagonal), matching the
reference's ``diag_shortcut`` convention (frisys_mol.cpp:111-113).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fries_tpu import compress, dets
from fries_tpu.ops import molecule as mol
from fries_tpu.runtime import arena as ar


@dataclass(frozen=True)
class FrifullConfig:
    eps: float
    target_nonz: int        # vector compression budget
    capacity: int           # max determinants held (per shard)
    init_thresh: float = 0.0
    target_norm: float = 0.0
    shift_interval: int = 10
    shift_damping: float = 0.05
    batch: int = 0          # chunk size for exact H application (0 = whole)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FrifullState:
    arena: ar.Arena
    en_shift: jax.Array
    last_norm: jax.Array
    key: jax.Array
    iterat: jax.Array


def init_state(ham: mol.MolecularHamiltonian, cfg: FrifullConfig, seed: int,
               init_val: float = 100.0) -> tuple[FrifullState, dict]:
    """Start from the HF unit vector scaled by ``init_val`` (frisys_mol.cpp:278)."""
    hf_words, hf_occ, hf_en = mol.hf_reference(ham)
    a = ar.make(cfg.capacity, ham.n_words, 2, ham.n_elec)
    a = ar.from_unsorted(
        a,
        hf_words[None],
        jnp.asarray([[init_val], [0.0]]),
        hf_occ[None],
        jnp.zeros((1,)),  # diag relative to e_ref = hf_en
        )
    state = FrifullState(
        arena=a,
        en_shift=jnp.float64(0.0),
        last_norm=jnp.float64(0.0),
        key=jax.random.key(seed),
        iterat=jnp.int32(0),
    )
    aux = {
        "e_ref": hf_en,
        "trial_keys": hf_words[None],
        "trial_vals": jnp.ones((1,)),
        "ref_key": hf_words,
    }
    return state, aux


def _exact_spawns(ham, tmpl, keys, occ, vals, h_fac, batch):
    """Exact off-diagonal spawns over the whole arena, optionally chunked to
    bound the candidate-buffer memory (lax.map over fixed-size chunks)."""
    c = keys.shape[0]
    if batch and batch < c:
        n_chunks = -(-c // batch)
        pad = n_chunks * batch - c
        keys_p = jnp.concatenate(
            [keys, jnp.tile(dets.invalid_det(keys.shape[1]), (pad, 1))]
        )
        occ_p = jnp.concatenate([occ, jnp.zeros((pad, occ.shape[1]), occ.dtype)])
        vals_p = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])

        def chunk(args):
            k, o, v = args
            return mol.exact_offdiag_batch(ham, tmpl, k, o, v, h_fac)

        nw, amps, nocc = lax.map(
            chunk,
            (
                keys_p.reshape(n_chunks, batch, -1),
                occ_p.reshape(n_chunks, batch, -1),
                vals_p.reshape(n_chunks, batch),
            ),
        )
        # flatten chunk axis and drop padded rows
        nw = nw.reshape(n_chunks * batch, -1, keys.shape[1])[:c]
        amps = amps.reshape(n_chunks * batch, -1)[:c]
        nocc = nocc.reshape(n_chunks * batch, -1, occ.shape[1])[:c]
        return nw, amps, nocc
    return mol.exact_offdiag_batch(ham, tmpl, keys, occ, vals, h_fac)


@partial(jax.jit, static_argnames=("cfg",))
def step(ham: mol.MolecularHamiltonian, tmpl, cfg: FrifullConfig,
         state: FrifullState, trial_keys, trial_vals, ref_key, e_ref):
    """One full power-method iteration.  Returns (state, metrics)."""
    a = state.arena
    eps = cfg.eps
    key_iter = jax.random.fold_in(state.key, state.iterat)
    vals0 = a.vals[0]
    valid = a.valid

    den = ar.dot(a, trial_keys, trial_vals, row=0)

    # ---- off-diagonal spawns: -eps * H_offdiag * v ----
    masked_vals = jnp.where(valid, vals0, 0.0)
    new_words, amps, new_occ = _exact_spawns(
        ham, tmpl, a.keys, a.occ, masked_vals, -eps, cfg.batch
    )
    flat_words = new_words.reshape(-1, a.n_words)
    flat_amps = amps.reshape(-1)
    flat_occ = new_occ.reshape(-1, ham.n_elec)
    flat_words = jnp.where(
        (flat_amps != 0)[:, None], flat_words, jnp.asarray(dets.invalid_det(a.n_words))
    )
    # diagonal cache for spawned determinants: H_ii - e_ref (the arena's diag
    # convention, matching the reference diag_shortcut frisys_mol.cpp:111-113)
    spawn_diag = mol.diag_matrel(ham, flat_occ) - e_ref
    ini = jnp.abs(vals0) >= cfg.init_thresh
    flat_ini = jnp.repeat(ini, amps.shape[1])

    a2, stats = ar.accumulate(
        a, flat_words, flat_amps, flat_occ, spawn_diag, flat_ini,
        origin_row=0, dest_row=1,
    )

    # ---- death / cloning + combine ----
    new_v = a2.vals[0] * (1 - eps * (a2.diag - state.en_shift)) + a2.vals[1]
    new_v = jnp.where(a2.valid, new_v, 0.0)

    num = ar.dot(ar.set_row(a2, 0, new_v), trial_keys, trial_vals, row=0)
    proj_num = ((1 + eps * state.en_shift) * den - num) / eps  # <t|(H-e_ref)|v>

    # ---- compression ----
    keep, n_left, loc_norm = compress.find_preserve(jnp.abs(new_v), cfg.target_nonz)
    glob_norm = loc_norm + jnp.sum(jnp.where(keep, jnp.abs(new_v), 0.0))

    # shift update every shift_interval iterations (frifull_hh.cpp:283-289)
    do_shift = (state.iterat + 1) % cfg.shift_interval == 0
    new_shift, new_last = compress.adjust_shift(
        state.en_shift, glob_norm, state.last_norm, cfg.target_norm,
        cfg.shift_damping / cfg.shift_interval / eps,
    )
    en_shift = jnp.where(do_shift, new_shift, state.en_shift)
    last_norm = jnp.where(do_shift, new_last, state.last_norm)

    rn = jax.random.uniform(key_iter, dtype=jnp.float64)
    comp_v = compress.sys_comp(new_v, keep, n_left, rn, loc_norm)

    a3 = ar.set_row(ar.set_row(a2, 0, comp_v), 1, jnp.zeros_like(comp_v))
    is_ref = dets.det_eq(a3.keys, ref_key[None, :])
    a3 = ar.compact(a3, (comp_v != 0) | is_ref)

    metrics = {
        "proj_num": proj_num,
        "proj_den": den,
        "norm": glob_norm,
        "shift": en_shift,
        "n_dets": a3.n_used,
        "overflow": stats["overflow"],
    }
    new_state = FrifullState(
        arena=a3,
        en_shift=en_shift,
        last_norm=last_norm,
        key=state.key,
        iterat=state.iterat + 1,
    )
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg", "n_iter"))
def run_steps(ham, tmpl, cfg, state, trial_keys, trial_vals, ref_key, e_ref,
              n_iter: int):
    """Scan ``n_iter`` iterations on device, collecting the metric trajectory."""

    def body(s, _):
        s2, m = step(ham, tmpl, cfg, s, trial_keys, trial_vals, ref_key, e_ref)
        return s2, m

    return lax.scan(body, state, None, length=n_iter)
