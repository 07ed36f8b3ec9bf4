"""Micro-profile comp_sub's internals at flagship level-B shapes: the
threshold fixpoint ("keep"), the emission's searchsorted, payload gather,
w_sub row gather, and the (M, K) row math — to rank Pallas-emission /
restructure candidates (PLAN round-3 item 2).

Usage:  python tools/profile_emit.py [--n 1048576] [--m 532768] [--k 14]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(HERE, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import fries_tpu  # noqa: F401
from fries_tpu import compress, kernels


def timeit(fn, args, n=5, warm=2):
    for _ in range(warm):
        r = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)   # parents (capacity)
    ap.add_argument("--m", type=int, default=532_768)   # output slots
    ap.add_argument("--k", type=int, default=14)        # subweight columns
    ap.add_argument("--n_samp", type=int, default=500_000)
    args = ap.parse_args()
    n, m, k = args.n, args.m, args.k

    rng = np.random.default_rng(0)
    n_live = args.n_samp  # live parents ~ kept dets
    values = np.zeros(n)
    values[:n_live] = np.abs(rng.normal(size=n_live)) + 1e-3
    sub_w = rng.random((n, k)) + 1e-6
    sub_w /= sub_w.sum(1, keepdims=True)
    ndiv = np.zeros(n, np.int32)
    vals_j = jnp.asarray(values)
    subw_j = jnp.asarray(sub_w, jnp.float32)
    mask_j = jnp.ones((n, k), bool)
    rn = jnp.asarray(0.37)

    def full(v, w, msk):
        out = compress.comp_sub(v, jnp.asarray(ndiv), w, msk, args.n_samp,
                                rn, m)
        return out[0].sum()

    t_full = timeit(jax.jit(full), (vals_j, subw_j, mask_j))
    print(f"comp_sub FULL:            {t_full * 1e3:8.1f} ms", flush=True)

    # ---- pieces ----
    offsets = np.sort(rng.integers(0, m, size=n)).astype(np.int64)
    off_j = jnp.asarray(offsets)
    slots = jnp.arange(m, dtype=jnp.int32)

    def ss_sort(off):
        return jnp.searchsorted(off, slots, side="right",
                                method="sort").astype(jnp.int32).sum()

    print(f"searchsorted(sort) N->M:  "
          f"{timeit(jax.jit(ss_sort), (off_j,)) * 1e3:8.1f} ms", flush=True)

    parent = np.minimum(
        np.searchsorted(offsets, np.arange(m), side="right") - 1, n - 1
    ).astype(np.int32)
    parent_j = jnp.asarray(np.maximum(parent, 0))
    payload = jnp.asarray(rng.normal(size=(n, 8)))

    def pay_gather(pay, p):
        return pay[p].sum()

    print(f"payload (M,8) f64 gather: "
          f"{timeit(jax.jit(pay_gather), (payload, parent_j)) * 1e3:8.1f} ms",
          flush=True)

    def w_gather(w, p):
        return w[p].astype(jnp.float32).sum()

    print(f"w_sub (M,{k}) f32 gather:  "
          f"{timeit(jax.jit(w_gather), (subw_j, parent_j)) * 1e3:8.1f} ms",
          flush=True)

    w_rows = jnp.asarray(rng.random((m, k)), jnp.float32)

    def row_math(w, y):
        keep_rows = w >= 0.5
        remv = jnp.where(keep_rows, 0.0, w)
        rank = kernels.row_cumsum(keep_rows).astype(jnp.int32) - 1
        hit = keep_rows & (rank == y[:, None])
        col = jnp.sum(jnp.where(hit, jnp.arange(k, dtype=jnp.int32), 0), 1)
        cum = kernels.row_cumsum(remv).astype(jnp.float64)
        wt = jnp.sum((cum <= 0.3) & (remv > 0), axis=1, dtype=jnp.int32)
        return (col + wt).sum()

    y = jnp.asarray(rng.integers(0, k, size=m), jnp.int32)
    print(f"emit row math (M,{k}):     "
          f"{timeit(jax.jit(row_math), (w_rows, y)) * 1e3:8.1f} ms",
          flush=True)

    # keep phase alone: fixpoint over (N, K)
    def keep_phase(v, w, msk):
        out = compress.comp_sub(v, jnp.asarray(ndiv), w, msk, args.n_samp,
                                rn, 8)   # out_size=8: emission ~free
        return out[0].sum()

    print(f"keep fixpoint (out=8):    "
          f"{timeit(jax.jit(keep_phase), (vals_j, subw_j, mask_j)) * 1e3:8.1f}"
          f" ms", flush=True)


if __name__ == "__main__":
    main()
