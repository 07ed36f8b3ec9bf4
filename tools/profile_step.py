"""Per-phase on-device profile + HBM roofline accounting for the frisys step
(VERDICT round-2 item 5: "measure before optimizing further").

Times every phase of the flagship 500k-rung step as its own jitted function
with scalar-reduced outputs (the axon tunnel makes whole-array fetches and
block_until_ready unreliable for timing), estimates bytes touched per phase
from the array shapes it reads/writes, and prints a roofline table:
time, effective GB/s, and % of v5e HBM peak (819 GB/s).

Usage:  python tools/profile_step.py [--rung 500k|1e6|125k] [--iters 30]
Results are recorded in PLAN.md.
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

V5E_HBM_GBS = 819.0  # v5e HBM peak bandwidth

RUNGS = {  # matches bench.py FULL_LADDER (spawn_cap = matr_samp + slack)
    "1e6": (1_000_000, 1_000_000, 1 << 21, 1_032_768),
    "500k": (500_000, 500_000, 1 << 20, 532_768),
    "125k": (125_000, 125_000, 1 << 18, 157_768),
}


def nbytes(*arrays):
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrays)


def timeit(fn, *args, n=5, warm=2):
    """Median wall time of ``fn(*args)`` with a scalar fetch per call."""
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
    ap.add_argument("--rung", default="500k", choices=sorted(RUNGS))
    ap.add_argument("--iters", type=int, default=30,
                    help="steady-state iterations before carving phases")
    args = ap.parse_args()

    import fries_tpu  # noqa: F401  (x64 + matmul precision config)
    from fries_tpu import compress, dets, synth
    from fries_tpu.drivers import frisys, power
    from fries_tpu.runtime import arena as ar
    from fries_tpu.ops import molecule as mol

    vec_nonz, matr_samp, cap, spawn_cap = RUNGS[args.rung]
    ham = synth.n2_ccpvdz_like(seed=1)
    cfg = frisys.FrisysConfig(
        eps=0.001, vec_nonz=vec_nonz, matr_samp=matr_samp, capacity=cap,
        spawn_cap=spawn_cap, target_norm=2.0 * vec_nonz,
    )
    step, run_steps, state, aux = frisys.build(ham, cfg, seed=0)
    print(f"# backend={jax.default_backend()} rung={args.rung} "
          f"C={cap} S={spawn_cap}", flush=True)

    # ---- reach steady state ----
    t0 = time.perf_counter()
    state, m = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], args.iters,
    )
    nd = int(np.asarray(m["n_dets"]).reshape(-1)[-1])
    print(f"# steady state after {args.iters} iters: n_dets={nd} "
          f"({time.perf_counter() - t0:.0f}s incl. compile)", flush=True)

    a = state.arena
    eps = cfg.eps
    key_iter = jax.random.fold_in(state.key, state.iterat)
    key_spawn, key_vec = jax.random.split(key_iter)

    # rebuild the spawner closure exactly as frisys.build does
    syminfo = mol.SymmInfo.build(np.asarray(ham.symm))
    import fries_tpu.ops.heat_bath as hb
    tens = hb.setup(ham)
    p_doub = frisys.hf_p_doub(ham, syminfo)
    spawn_fn = frisys.make_hbpp_spawner(
        ham, tens, syminfo, p_doub, cfg, aux["e_ref"]
    )
    diag_fn = frisys.make_diag_fn(ham, aux["e_ref"], cfg.spin_parity)

    rows = []

    def phase(name, fn, byte_count, *fargs):
        sec = timeit(jax.jit(fn), *fargs)
        rows.append((name, sec, byte_count))
        print(f"# {name}: {sec * 1e3:8.1f} ms   {byte_count / sec / 1e9:7.1f} "
              f"GB/s   {byte_count / sec / 1e9 / V5E_HBM_GBS * 100:5.1f}% HBM",
              flush=True)
        return sec

    vals0 = jnp.where(a.valid, a.vals[0], 0.0)

    # 1. HB-PP spawner: reads keys+vals, writes (S, W+2) spawn rows
    spawn_bytes = nbytes(a.keys, vals0) + spawn_cap * (
        a.keys.shape[1] * 4 + 8 + 4
    )
    phase(
        "spawn (HB-PP 5-level)",
        lambda k, v: jax.tree_util.tree_map(
            jnp.sum, spawn_fn(k, v, -eps, key_spawn)[1]
        ),
        spawn_bytes, a.keys, vals0,
    )

    # materialize real spawn output for downstream phases
    fw, fa, fi = jax.jit(
        lambda k, v: spawn_fn(k, v, -eps, key_spawn)
    )(a.keys, vals0)
    fw = jnp.where((fa != 0)[:, None], fw,
                   jnp.asarray(dets.invalid_det(a.n_words)))
    fw, fa, fi = jax.block_until_ready((fw, fa, fi))

    # 2. accumulate: reads arena (keys+2 val rows) + spawns, writes same
    acc_bytes = 2 * nbytes(a.keys, a.vals) + 2 * nbytes(fw, fa, fi)
    phase(
        "accumulate (sorted merge)",
        lambda ax, w, v, i: ar.accumulate(ax, w, v, i, 0, 1)[0].vals.sum(),
        acc_bytes, a, fw, fa, fi,
    )
    a2, _ = jax.jit(
        lambda ax, w, v, i: ar.accumulate(ax, w, v, i, 0, 1)
    )(a, fw, fa, fi)
    a2 = jax.block_until_ready(a2)

    # 3. diagonal recompute from keys
    phase("diag_fn (keys->diag)",
          lambda k: diag_fn(k).sum(), nbytes(a2.keys) + cap * 8, a2.keys)

    # 4. death/combine
    diag2 = jax.block_until_ready(jax.jit(diag_fn)(a2.keys))

    def death(av, d):
        nv = av.vals[0] * (1 - eps * (d - state.en_shift)) + av.vals[1]
        return jnp.where(av.valid, nv, 0.0).sum()

    phase("death+combine", death, nbytes(a2.vals, diag2) + cap * 8, a2, diag2)

    # 5. estimator lookups (num+den queries)
    queries = jnp.concatenate([aux["num_keys"], aux["den_keys"]])
    phase("estimator lookup+dots",
          lambda av, q: ar.lookup(av, q)[0].sum(),
          nbytes(a2.keys, queries), a2, queries)

    # 6. find_preserve
    new_v = jax.block_until_ready(jax.jit(
        lambda av, d: jnp.where(
            av.valid,
            av.vals[0] * (1 - eps * (d - state.en_shift)) + av.vals[1], 0.0)
    )(a2, diag2))
    phase("find_preserve",
          lambda v: compress.find_preserve(jnp.abs(v), cfg.vec_nonz)[0].sum(),
          3 * nbytes(new_v), new_v)

    keep, n_left, loc_norm = jax.block_until_ready(jax.jit(
        lambda v: compress.find_preserve(jnp.abs(v), cfg.vec_nonz)
    )(new_v))

    # 7. sys_comp
    rn = jax.random.uniform(key_vec, dtype=jnp.float64)
    phase("sys_comp",
          lambda v, k, n, ln: compress.sys_comp(v, k, n, rn, ln).sum(),
          4 * nbytes(new_v), new_v, keep, n_left, loc_norm)

    comp_v = jax.block_until_ready(jax.jit(
        lambda v, k, n, ln: compress.sys_comp(v, k, n, rn, ln)
    )(new_v, keep, n_left, loc_norm))

    # 8. compact
    a3 = ar.set_row(ar.set_row(a2, 0, comp_v), 1, jnp.zeros_like(comp_v))
    is_ref = dets.det_eq(a3.keys, aux["ref_key"][None, :])
    phase("compact",
          lambda av, cv, ir: ar.compact(av, (cv != 0) | ir).vals.sum(),
          2 * nbytes(a3.keys, a3.vals), a3, comp_v, is_ref)

    # ---- full step for reference ----
    full = timeit(
        lambda s: run_steps(
            s, aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"], 10,
        )[1],
        state, n=3, warm=1,
    ) / 10

    print()
    print(f"{'phase':30s} {'ms':>8s} {'GB/s':>8s} {'%HBM':>6s} {'%step':>6s}")
    tot = 0.0
    for name, sec, b in rows:
        tot += sec
        print(f"{name:30s} {sec * 1e3:8.1f} {b / sec / 1e9:8.1f} "
              f"{b / sec / 1e9 / V5E_HBM_GBS * 100:6.1f} "
              f"{sec / full * 100:6.1f}")
    print(f"{'SUM of phases':30s} {tot * 1e3:8.1f} {'':8s} {'':6s} "
          f"{tot / full * 100:6.1f}")
    print(f"{'FULL STEP (run_steps/10)':30s} {full * 1e3:8.1f}")
    print(f"# nonzeros/s at this rung: {matr_samp / full:,.0f}")


if __name__ == "__main__":
    main()
