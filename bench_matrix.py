"""Bench matrix: all five BASELINE.md-required configurations
(BASELINE.md:62-66), each in its own subprocess (a TPU fault poisons the
client process), aggregated into BENCH_MATRIX.json.

  frisys       - headline: N2-size systematic HB-PP FRI (bench.py ladder)
  frifull_hh   - 4-site Hubbard-Holstein, exact H
  frifull_mol  - H2O-size synthetic, exact H
  fciqmc       - N2-stretched-size, heat-bath, 5M-walker target
  subsp        - Ne-size 2-state subspace, hash-sharded code path

Usage: python bench_matrix.py [config ...]   (default: all)
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ALL = ["frisys", "frifull_hh", "frifull_mol", "fciqmc", "subsp"]


def main():
    want = sys.argv[1:] or ALL
    out_path = os.path.join(HERE, "BENCH_MATRIX.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name in want:
        env = dict(os.environ)
        env["FRIES_BENCH_CONFIG"] = name
        env.setdefault(
            "JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache")
        )
        sys.stderr.write(f"# running {name}...\n")
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if line:
            results[name] = json.loads(line)
            print(line)
        else:
            results[name] = {"error": proc.stderr[-4000:]}
            sys.stderr.write(f"# {name} FAILED\n{proc.stderr[-4000:]}\n")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    sys.stderr.write(f"# wrote {out_path}\n")


if __name__ == "__main__":
    main()
