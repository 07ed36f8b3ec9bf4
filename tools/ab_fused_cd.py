"""A/B the factored fused-CD spawner stage on the TPU at bench rungs.

Compares ms/iter of the full frisys step with:
  A. fuse_cd=False (sequential C -> D levels, the round-4 1e6 fallback)
  B. fuse_cd=True via compress.comp_sub_factored (round-5, active at 1e6)

Usage: python tools/ab_fused_cd.py [--rung 1e6|500k] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import numpy as np

RUNGS = {
    "1e6": (1_000_000, 1_000_000, 1 << 21, 1_032_768),
    "500k": (500_000, 500_000, 1 << 20, 532_768),
    "125k": (125_000, 125_000, 1 << 18, 157_768),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", default="1e6", choices=sorted(RUNGS))
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--modes", default="fused,seq")
    args = ap.parse_args()
    vec_nonz, matr_samp, cap, spawn_cap = RUNGS[args.rung]

    from fries_tpu import synth
    from fries_tpu.drivers import frisys

    ham = synth.make_system(14, 14, seed=1)  # N2/cc-pVDZ-sized (28 orb)
    results = {}
    for mode in args.modes.split(","):
        cfg = frisys.FrisysConfig(
            eps=0.001, vec_nonz=vec_nonz, matr_samp=matr_samp, capacity=cap,
            spawn_cap=spawn_cap, target_norm=2.0 * vec_nonz,
            fuse_cd=(mode == "fused"),
        )
        step, run_steps, state, aux = frisys.build(ham, cfg, seed=0)
        run_args = (aux["num_keys"], aux["num_vals"], aux["den_keys"],
                    aux["den_vals"], aux["ref_key"])
        t0 = time.time()
        for _ in range(args.warm):
            state, m = run_steps(state, *run_args, args.iters)
        float(np.asarray(m["norm"]).reshape(-1)[-1])
        print(f"# {mode}: warm+compile {time.time() - t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        state, m = run_steps(state, *run_args, args.iters)
        norm = float(np.asarray(m["norm"]).reshape(-1)[-1])
        sec = (time.perf_counter() - t0) / args.iters
        nd = int(np.asarray(m["n_dets"]).reshape(-1)[-1])
        ovf = bool(np.asarray(m["overflow"]).any())
        results[mode] = sec
        print(f"{mode}: {sec * 1e3:.1f} ms/iter  n_dets={nd} norm={norm:.3e} "
              f"overflow={ovf}", flush=True)
    if len(results) == 2:
        a, b = results.get("seq"), results.get("fused")
        if a and b:
            print(f"speedup fused vs seq: {a / b:.3f}x", flush=True)


if __name__ == "__main__":
    main()
