"""Benchmark: frisys (HB-PP factorized FCI-FRI) iteration throughput on the
flagship N2/cc-pVDZ-sized configuration.

Metric (BASELINE.json): sampled H*v nonzeros per second per chip at 1e6 kept
determinants.  The reference publishes no wall-clock numbers (BASELINE.md);
vs_baseline is the speedup over a single-rank run of the same algorithm's
C++ reference implementation on this host's CPU when available (see
baseline_cpp/), else over a recorded reference throughput.

Prints ONE JSON line.  Runs on the default JAX platform (the real TPU chip
under axon); set FRIES_BENCH_SMALL=1 for a scaled-down smoke run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent compile cache: TPU-tunnel compiles of the full step take minutes
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np  # noqa: E402


def main():
    small = bool(os.environ.get("FRIES_BENCH_SMALL"))
    import jax
    import jax.numpy as jnp
    from fries_tpu import synth
    from fries_tpu.drivers import frisys

    if small:
        ham = synth.make_system(10, 6, seed=1)
        cfg = frisys.FrisysConfig(
            eps=0.01, vec_nonz=2000, matr_samp=4000, capacity=1 << 13,
            spawn_cap=6000, target_norm=5000.0,
        )
        n_warm, n_time = 2, 5
    else:
        ham = synth.n2_ccpvdz_like(seed=1)
        cfg = frisys.FrisysConfig(
            eps=0.001, vec_nonz=1_000_000, matr_samp=1_000_000,
            capacity=1 << 21, spawn_cap=1_400_000, target_norm=2_000_000.0,
        )
        n_warm, n_time = 3, 10

    step, run_steps, state, aux = frisys.build(ham, cfg, seed=0)
    args = (
        aux["num_keys"], aux["num_vals"], aux["den_keys"], aux["den_vals"],
        aux["ref_key"],
    )

    # warmup: same static scan length as the timed region (a different
    # n_iter would trigger a full recompile inside the timing), repeated
    # n_warm times to grow the population to steady state
    for _ in range(n_warm):
        state, m = run_steps(state, *args, n_time)
    jax.block_until_ready(m)

    t0 = time.perf_counter()
    state, m = run_steps(state, *args, n_time)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0

    iters_per_sec = n_time / dt
    nonzeros_per_sec = cfg.matr_samp * iters_per_sec

    baseline_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "baseline_cpp", "baseline.json"
    )
    vs_baseline = 0.0
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        if base.get("nonzeros_per_sec"):
            vs_baseline = nonzeros_per_sec / base["nonzeros_per_sec"]

    print(
        json.dumps(
            {
                "metric": "sampled H*v nonzeros/sec/chip, frisys HB-PP, "
                "N2-ccpvdz-size synthetic, 1e6 kept dets"
                + (" (SMALL smoke config)" if small else ""),
                "value": round(nonzeros_per_sec, 1),
                "unit": "nonzeros/s",
                "vs_baseline": round(vs_baseline, 3),
                "iters_per_sec": round(iters_per_sec, 4),
                "n_dets_final": int(np.asarray(m["n_dets"]).reshape(-1)[-1]),
            }
        )
    )


if __name__ == "__main__":
    main()
