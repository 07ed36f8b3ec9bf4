"""A/B the fused level-A+B HB-PP spawner (FrisysConfig.fuse_ab) against the
reference 5-level structure at a bench rung, on the live backend.

Both variants run in one process on identical state/trajectory structure;
timing is steady-state scan blocks with one scalar fetch per block
(tools/tpu_timeit.py methodology).

Usage: python tools/ab_fuse.py [--rung 500k] [--warm 12] [--time 10]
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

RUNGS = {  # matches bench.py FULL_LADDER
    "1e6": (1_000_000, 1_000_000, 1 << 21, 1_032_768),
    "500k": (500_000, 500_000, 1 << 20, 532_768),
    "125k": (125_000, 125_000, 1 << 18, 157_768),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", default="500k", choices=sorted(RUNGS))
    ap.add_argument("--warm", type=int, default=12)
    ap.add_argument("--time", type=int, default=10)
    args = ap.parse_args()

    import fries_tpu  # noqa: F401
    from fries_tpu import synth
    from fries_tpu.drivers import frisys

    vec_nonz, matr_samp, cap, spawn_cap = RUNGS[args.rung]
    ham = synth.n2_ccpvdz_like(seed=1)
    print(f"# backend={jax.default_backend()} rung={args.rung}", flush=True)

    results = {}
    for fuse in (True, False):
        cfg = frisys.FrisysConfig(
            eps=0.001, vec_nonz=vec_nonz, matr_samp=matr_samp, capacity=cap,
            spawn_cap=spawn_cap, target_norm=2.0 * vec_nonz, fuse_ab=fuse,
        )
        step, run_steps, state, aux = frisys.build(ham, cfg, seed=0)
        rs = lambda st, n: run_steps(
            st, aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"], n,
        )
        t0 = time.perf_counter()
        state, m = rs(state, args.warm)
        nd = int(np.asarray(m["n_dets"]).reshape(-1)[-1])
        ovf = bool(np.asarray(m["overflow"]).reshape(-1)[-1])
        print(f"# fuse_ab={fuse}: warm {args.warm} iters in "
              f"{time.perf_counter() - t0:.0f}s (incl. compile), "
              f"n_dets={nd} overflow={ovf}", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, m = rs(state, args.time)
            float(np.asarray(m["norm"]).reshape(-1)[-1])
            times.append((time.perf_counter() - t0) / args.time)
        ms = float(np.median(times)) * 1e3
        results[fuse] = ms
        print(f"fuse_ab={fuse}: {ms:.1f} ms/iter "
              f"({matr_samp / ms * 1000:,.0f} nonzeros/s)", flush=True)

    print(f"speedup from fusion: {results[False] / results[True]:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
