"""Multi-chip sharding: hash-distributed arena + all-to-all spawn exchange.

TPU-native replacement for the reference's MPI layer (SURVEY.md section 5.8):

* rank assignment by hash (DistVec::idx_to_proc, vec_utils.hpp:360-379)
  becomes an FNV-1a hash of the determinant key words modulo the mesh size;
* the Adder's MPI_Alltoall/MPI_Alltoallv round trip (vec_utils.hpp:991-1019)
  becomes a fixed-capacity bucketed ``lax.all_to_all`` over the ICI mesh with
  a psum'd overflow flag instead of flow control;
* ``sum_mpi`` reductions are ``lax.psum``; the rank-0 broadcast of shared
  random numbers (compress_utils.cpp:291) is replaced by using the same PRNG
  key on every shard.

Everything here runs inside ``shard_map`` over a 1-D device mesh.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fries_tpu import dets

FNV_PRIME = np.uint32(0x01000193)
FNV_SEED = np.uint32(0x811C9DC5)


def shard_of_words(words: jax.Array, n_shards: int, seed: int = 0) -> jax.Array:
    """FNV-1a hash of the key words -> owning shard index (..., ) int32."""
    h = jnp.full(words.shape[:-1], FNV_SEED ^ np.uint32(seed), jnp.uint32)
    for w in range(words.shape[-1]):
        h = (h ^ words[..., w]) * FNV_PRIME
    # mix to decorrelate low bits
    h = h ^ (h >> 16)
    h = h * np.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    return (h % np.uint32(n_shards)).astype(jnp.int32)


def exchange(arrays: dict, target: jax.Array, n_shards: int,
             per_pair_cap: int, axis_name: str):
    """Route spawn rows to their owning shards.

    Args:
      arrays: dict of (S, ...) spawn payloads; must contain "keys" (S, W)
        whose sentinel rows mark invalid entries, and "amps".
      target: (S,) destination shard of each row.
      per_pair_cap: static bucket capacity per destination shard.

    Returns (received dict of (n_shards*per_pair_cap, ...), overflow bool).
    """
    s = target.shape[0]
    keys = arrays["keys"]
    valid = ~dets.is_invalid(keys)
    target = jnp.where(valid, target, n_shards)  # invalid -> dropped bucket

    # position of each row within its destination bucket
    order = jnp.argsort(target, stable=True)
    sorted_target = target[order]
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_target[1:] != sorted_target[:-1]]
    )
    seg_start = jnp.where(first, jnp.arange(s), 0)
    seg_start = lax.associative_scan(jnp.maximum, seg_start)
    pos_in_bucket = jnp.arange(s) - seg_start

    bucket_count = jnp.zeros((n_shards,), jnp.int32).at[
        jnp.clip(target, 0, n_shards)
    ].add(jnp.where(valid, 1, 0), mode="drop")
    overflow = jnp.any(bucket_count > per_pair_cap)
    overflow = lax.psum(overflow.astype(jnp.int32), axis_name) > 0

    # scatter into (n_shards, per_pair_cap) send buffers
    dest_row = sorted_target
    dest_col = pos_in_bucket
    ok = (dest_row < n_shards) & (dest_col < per_pair_cap)
    flat_dest = jnp.where(ok, dest_row * per_pair_cap + dest_col,
                          n_shards * per_pair_cap)

    received = {}
    for name, arr in arrays.items():
        arr_sorted = arr[order]
        if name == "keys":
            buf = jnp.tile(
                dets.invalid_det(arr.shape[-1]), (n_shards * per_pair_cap, 1)
            )
        else:
            buf = jnp.zeros((n_shards * per_pair_cap,) + arr.shape[1:], arr.dtype)
        buf = buf.at[flat_dest].set(arr_sorted, mode="drop")
        buf = buf.reshape((n_shards, per_pair_cap) + arr.shape[1:])
        out = lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0, tiled=False)
        received[name] = out.reshape((n_shards * per_pair_cap,) + arr.shape[1:])
    return received, overflow
