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


def main():
    # Orchestrator mode: a TPU device fault poisons the whole client process,
    # so each ladder rung runs in its own subprocess; the first rung that
    # prints a JSON line wins.
    if os.environ.get("FRIES_BENCH_RUNG") is None and not os.environ.get(
        "FRIES_BENCH_SMALL"
    ):
        for i in range(3):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=_ladder_env(i), capture_output=True, text=True,
                timeout=None,
            )
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("{")), None
            )
            if line:
                print(line)
                return
            sys.stderr.write(proc.stderr[-500:] + "\n")
        raise SystemExit("all benchmark rungs failed")

    small = bool(os.environ.get("FRIES_BENCH_SMALL"))
    import jax
    import jax.numpy as jnp
    from fries_tpu import synth
    from fries_tpu.drivers import frisys

    if small:
        ladder = [("small", 2000, 4000, 1 << 13, 6000, 2, 5)]
        ham = synth.make_system(10, 6, seed=1)
    else:
        ham = synth.n2_ccpvdz_like(seed=1)
        full_ladder = [
            ("1e6", 1_000_000, 1_000_000, 1 << 21, 1_400_000, 2, 5),
            ("500k", 500_000, 500_000, 1 << 20, 700_000, 2, 5),
            ("125k", 125_000, 125_000, 1 << 18, 180_000, 2, 5),
        ]
        rung = int(os.environ.get("FRIES_BENCH_RUNG", "0"))
        ladder = full_ladder[rung : rung + 1]

    label = dt = m = cfg = None
    for label, vec_nonz, matr_samp, cap, spawn_cap, n_warm, n_time in ladder:
        cfg = frisys.FrisysConfig(
            eps=0.001, vec_nonz=vec_nonz, matr_samp=matr_samp, capacity=cap,
            spawn_cap=spawn_cap, target_norm=2.0 * vec_nonz,
        )
        try:
            step, run_steps, state, aux = frisys.build(ham, cfg, seed=0)
            args = (
                aux["num_keys"], aux["num_vals"], aux["den_keys"],
                aux["den_vals"], aux["ref_key"],
            )
            # warmup: same static scan length as the timed region (a
            # different n_iter would recompile inside the timing)
            for _ in range(n_warm):
                state, m = run_steps(state, *args, n_time)
            jax.block_until_ready(m)
            t0 = time.perf_counter()
            state, m = run_steps(state, *args, n_time)
            jax.block_until_ready(m)
            dt = time.perf_counter() - t0
            break
        except Exception as e:  # device fault / OOM: try the next rung
            print(f"# config {label} failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            dt = None
    if dt is None:
        raise SystemExit("all benchmark configurations failed")


def _ladder_env(i):
    env = dict(os.environ)
    env["FRIES_BENCH_RUNG"] = str(i)
    return env

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
