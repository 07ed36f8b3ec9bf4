"""Benchmark: frisys (HB-PP factorized FCI-FRI) iteration throughput on the
flagship N2/cc-pVDZ-sized configuration.

Metric (BASELINE.json): sampled H*v nonzeros per second per chip at 1e6 kept
determinants.  The reference publishes no wall-clock numbers (BASELINE.md);
vs_baseline is the speedup over a single-rank run of the same algorithm's
C++ reference implementation on this host's CPU (baseline_cpp/baseline.json).

Prints ONE JSON line.  Runs on the default JAX platform (the real TPU chip
under axon); set FRIES_BENCH_SMALL=1 for a scaled-down smoke run.

A TPU device fault poisons the whole client process, so in full mode each
size rung runs in its own subprocess and the first to succeed wins.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent compile cache: TPU-tunnel compiles of the full step take minutes
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np  # noqa: E402

# North-star rung first: the 1e6 config runs clean since the round-2 memory
# fixes (f32 stage rows, chunked comp_sub emission).  Measured 2026-08-16
# (round 2): 1e6 -> 4.28 s/iter = 233.7k nonzeros/s (vs 8.2 s/iter at 500k
# in round 1); 500k -> 2.03 s/iter = 245.9k nonzeros/s.
FULL_LADDER = [
    ("1e6", 1_000_000, 1_000_000, 1 << 21, 1_400_000, 2, 5),
    ("500k", 500_000, 500_000, 1 << 20, 700_000, 2, 5),
    ("125k", 125_000, 125_000, 1 << 18, 180_000, 2, 5),
]


def _orchestrate():
    for i in range(len(FULL_LADDER)):
        env = dict(os.environ)
        env["FRIES_BENCH_RUNG"] = str(i)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if line:
            print(line)
            return
        sys.stderr.write(
            f"# rung {FULL_LADDER[i][0]} failed\n" + proc.stderr[-500:] + "\n"
        )
    raise SystemExit("all benchmark rungs failed")


def main():
    small = bool(os.environ.get("FRIES_BENCH_SMALL"))
    if os.environ.get("FRIES_BENCH_RUNG") is None and not small:
        return _orchestrate()

    import jax
    from fries_tpu import synth
    from fries_tpu.drivers import frisys

    if small:
        label, vec_nonz, matr_samp, cap, spawn_cap, n_warm, n_time = (
            "small", 2000, 4000, 1 << 13, 6000, 2, 5,
        )
        ham = synth.make_system(10, 6, seed=1)
    else:
        rung = int(os.environ.get("FRIES_BENCH_RUNG", "0"))
        label, vec_nonz, matr_samp, cap, spawn_cap, n_warm, n_time = FULL_LADDER[rung]
        ham = synth.n2_ccpvdz_like(seed=1)

    cfg = frisys.FrisysConfig(
        eps=0.001, vec_nonz=vec_nonz, matr_samp=matr_samp, capacity=cap,
        spawn_cap=spawn_cap, target_norm=2.0 * vec_nonz,
    )
    step, run_steps, state, aux = frisys.build(ham, cfg, seed=0)
    args = (
        aux["num_keys"], aux["num_vals"], aux["den_keys"], aux["den_vals"],
        aux["ref_key"],
    )

    # warmup: same static scan length as the timed region (a different n_iter
    # would trigger a recompile inside the timing), repeated to reach a
    # steady-state population.  Timing fetches a scalar to host:
    # block_until_ready has been observed returning early under the axon
    # tunnel, yielding nonsense wall-clock numbers.
    for _ in range(n_warm):
        state, m = run_steps(state, *args, n_time)
    float(np.asarray(m["norm"]).reshape(-1)[-1])

    t0 = time.perf_counter()
    state, m = run_steps(state, *args, n_time)
    float(np.asarray(m["norm"]).reshape(-1)[-1])
    dt = time.perf_counter() - t0

    iters_per_sec = n_time / dt
    nonzeros_per_sec = matr_samp * iters_per_sec

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
                f"N2-ccpvdz-size synthetic, {label} kept dets"
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
