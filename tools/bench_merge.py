"""Microbenchmark: Pallas streaming-merge accumulate vs the XLA sorted-merge
at production (500k-rung) shapes on the live backend.

Usage:  python tools/bench_merge.py [--cap 1048576] [--ns 700000] [--n 5]
Optionally set FRIES_MERGE_KERNEL=v1 to time the sublane-oriented kernel.
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

import fries_tpu  # noqa: F401
from fries_tpu import dets
from fries_tpu.runtime import arena as ar
from fries_tpu.runtime import pallas_merge as pm


def make_inputs(cap, n_arena, n_spawn, w=2, seed=0):
    rng = np.random.default_rng(seed)
    # unique sorted arena keys
    uniq = rng.choice(np.arange(1, 2**24, dtype=np.uint64), size=n_arena,
                      replace=False)
    uniq.sort()
    keys = np.zeros((cap, w), np.uint32)
    keys[:n_arena, 0] = (uniq & 0xFFFFFFFF).astype(np.uint32)
    keys[:n_arena, 1] = (uniq >> 32).astype(np.uint32)
    inval = np.asarray(dets.invalid_det(w))
    keys[n_arena:] = inval
    vals = np.zeros((2, cap))
    vals[0, :n_arena] = rng.normal(size=n_arena)
    a = ar.Arena(keys=jnp.asarray(keys), vals=jnp.asarray(vals),
                 n_used=jnp.asarray([n_arena], jnp.int32))
    # spawns: half hit the arena, half are new
    hit = rng.choice(uniq, size=n_spawn // 2)
    new = rng.choice(np.arange(2**24, 2**25, dtype=np.uint64),
                     size=n_spawn - n_spawn // 2)
    sk_flat = np.concatenate([hit, new])
    rng.shuffle(sk_flat)
    sk = np.zeros((n_spawn, w), np.uint32)
    sk[:, 0] = (sk_flat & 0xFFFFFFFF).astype(np.uint32)
    sk[:, 1] = (sk_flat >> 32).astype(np.uint32)
    sv = rng.normal(size=n_spawn)
    si = (rng.random(n_spawn) < 0.5).astype(np.int32)
    return a, jnp.asarray(sk), jnp.asarray(sv), jnp.asarray(si)


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
    ap.add_argument("--cap", type=int, default=1 << 20)
    ap.add_argument("--n_arena", type=int, default=500_000)
    ap.add_argument("--ns", type=int, default=700_000)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--skip_xla", action="store_true")
    args = ap.parse_args()

    print(f"# backend={jax.default_backend()} tile={pm.TILE} "
          f"kernel={os.environ.get('FRIES_MERGE_KERNEL', 'v2')}",
          flush=True)
    a, sk, sv, si = make_inputs(args.cap, args.n_arena, args.ns)

    def run_xla(a, sk, sv, si):
        na, st = ar.accumulate(a, sk, sv, si, 0, 1)
        return na.vals.sum()

    def run_pl(a, sk, sv, si):
        na, st = pm.accumulate_pallas(a, sk, sv, si, 0, 1)
        return na.vals.sum()

    if not args.skip_xla:
        t = timeit(jax.jit(run_xla), (a, sk, sv, si), n=args.n)
        print(f"xla accumulate:    {t * 1e3:8.1f} ms", flush=True)
    t0 = time.perf_counter()
    f = jax.jit(run_pl)
    t = timeit(f, (a, sk, sv, si), n=args.n)
    print(f"pallas accumulate: {t * 1e3:8.1f} ms   "
          f"(first call incl. compile took {time.perf_counter() - t0:.0f}s)",
          flush=True)
    # correctness cross-check on device
    va = jax.jit(run_xla)(a, sk, sv, si)
    vp = f(a, sk, sv, si)
    print(f"# sums: xla={float(va):.12g} pallas={float(vp):.12g}")


if __name__ == "__main__":
    main()
