"""Checkpoint / resume for the sorted-arena solution vector.

Replaces the reference's per-rank binary snapshots (DistVec::save/load,
vec_utils.hpp:713-848: dets<r>.dat / vals<r>.dat + dense.txt) and the
persisted rank-assignment scrambler (save_proc_hash/load_proc_hash,
io_utils.cpp:589-619) with a single .npz per run: arena arrays (already
hash-sharded deterministically by the FNV seed, which is saved so sharding
stays stable across restarts), value rows, RNG key state, iteration counter,
and energy shift.  Like the reference load (vec_utils.hpp:761-848), entries
with |v| < 1e-9 in every row are dropped on restore.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fries_tpu import dets
from fries_tpu.runtime import arena as ar

FORMAT_VERSION = 2  # v2: no occ/diag payloads (recomputed from keys)


def save_state(path, state, extra: dict | None = None):
    """Save a driver state (any *State dataclass with an ``arena`` field plus
    scalar leaves) to ``path`` (.npz)."""
    a = state.arena
    payload = {
        "version": FORMAT_VERSION,
        "keys": np.asarray(a.keys),
        "vals": np.asarray(a.vals),
        "n_used": np.asarray(a.n_used),
        "key": np.asarray(jax.random.key_data(state.key)),
        "iterat": np.asarray(state.iterat),
    }
    for name in ("en_shift", "last_norm", "norm_factors", "last_norms"):
        if hasattr(state, name):
            payload[name] = np.asarray(getattr(state, name))
    for k, v in (extra or {}).items():
        payload["extra_" + k] = np.asarray(v)
    np.savez(path, **payload)


def load_arena(path, drop_below: float = 1e-9):
    """Restore the arena from a snapshot, dropping near-zero entries
    (vec_utils.hpp:806-812)."""
    z = np.load(path)
    keys = z["keys"]
    vals = z["vals"]
    live = (np.abs(vals) >= drop_below).any(axis=0)
    live &= ~(keys[:, -1] == 0xFFFFFFFF)
    w = keys.shape[1]
    keys = np.where(live[:, None], keys, np.asarray(dets.invalid_det(w))[None, :])
    vals = np.where(live[None, :], vals, 0.0)
    # restore sortedness after the drop (cheap host-side check/re-sort)
    return ar.from_unsorted(
        ar.make(keys.shape[0], w, vals.shape[0]),
        jnp.asarray(keys), jnp.asarray(vals),
    )


def load_scalars(path):
    z = np.load(path)
    out = {k: z[k] for k in z.files if k not in ("keys", "vals", "occ", "diag")}  # occ/diag only in v1 files
    return out


def restore_key(path):
    z = np.load(path)
    return jax.random.wrap_key_data(jnp.asarray(z["key"]))
