"""Per-phase on-device profile of the subspace step at the bench-matrix
config (Ne-size, 2 trial vectors, 100k kept per vector) - chasing the
67 s/iter measured by bench_matrix's subsp rung (2026-08-18).

Builds the arena synthetically (random distinct determinants) so nothing
heavier than the pieces under test has to compile, then times each phase as
its own jit with scalar-reduced fetches:

  - piv_comp per-row vector compression (the reference compress_vecs default)
  - sys-mode compression for comparison
  - the pivotal HB-PP spawner (comp_sub_piv path) per vector
  - the systematic spawner for comparison
  - accumulate_multi XLA vs Pallas
  - trial/h-trial projection dots
  - the FULL sharded subspace step (the number bench_matrix sees)

Usage:  python tools/profile_subsp.py [--kept 100000] [--full]
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


def timeit(fn, *args, n=3, warm=1):
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


def random_arena(ham, cap, n_fill, n_vecs, seed=0):
    """Sorted arena with ``n_fill`` random distinct determinants."""
    from fries_tpu import dets
    from fries_tpu.runtime import arena as ar

    rng = np.random.default_rng(seed)
    half = ham.n_elec // 2
    rows = np.zeros((n_fill, 2 * ham.n_orb), bool)
    for s, off in ((half, 0), (half, ham.n_orb)):
        picks = np.argsort(rng.random((n_fill, ham.n_orb)), axis=1)[:, :s]
        np.put_along_axis(rows[:, off:off + ham.n_orb], picks, True, axis=1)
    keys = np.asarray(dets.pack_bits(jnp.asarray(rows)))
    keys = np.unique(keys, axis=0)
    vals = rng.standard_normal((n_vecs, keys.shape[0]))
    a = ar.make(cap, ham.n_words, n_vecs)
    return ar.from_unsorted(a, jnp.asarray(keys), jnp.asarray(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kept", type=int, default=100_000)
    ap.add_argument("--matr", type=int, default=200_000)
    ap.add_argument("--cap", type=int, default=1 << 19)
    ap.add_argument("--spawn_cap", type=int, default=300_000)
    ap.add_argument("--full", action="store_true",
                    help="also compile+time the full sharded step")
    ap.add_argument("--skip_pieces", action="store_true")
    args = ap.parse_args()

    import fries_tpu  # noqa: F401
    from fries_tpu import compress, dets, parallel, synth
    from fries_tpu.drivers import frisys, subspace
    from fries_tpu.ops import heat_bath as hb
    from fries_tpu.ops import molecule as mol
    from fries_tpu.runtime import arena as ar

    ham = synth.ne_augccpvdz_like(seed=1)
    print(f"# backend={jax.default_backend()} n_orb={ham.n_orb} "
          f"n_elec={ham.n_elec} cap={args.cap}", flush=True)
    syminfo = mol.SymmInfo.build(np.asarray(ham.symm))
    tens = hb.setup(ham)
    p_doub = frisys.hf_p_doub(ham, syminfo)
    hf_words, hf_occ, hf_en = mol.hf_reference(ham)

    t = 2
    a1 = random_arena(ham, args.cap, args.kept, t, seed=0)
    print("# arena n_dets:", int(np.asarray(a1.n_used).reshape(-1)[0]),
          flush=True)
    keys = a1.keys
    v0 = jnp.where(a1.valid, a1.vals[0], 0.0)
    key = jax.random.key(1)

    if not args.skip_pieces:
        fcfg = frisys.FrisysConfig(
            eps=0.02, vec_nonz=args.kept, matr_samp=args.matr,
            capacity=args.cap, spawn_cap=args.spawn_cap, unnorm=True,
            pivotal=True,
        )
        fcfg_sys = frisys.FrisysConfig(
            eps=0.02, vec_nonz=args.kept, matr_samp=args.matr,
            capacity=args.cap, spawn_cap=args.spawn_cap, unnorm=True,
            pivotal=False,
        )
        spawn_piv = frisys.make_hbpp_spawner(
            ham, tens, syminfo, p_doub, fcfg, hf_en)
        spawn_sys = frisys.make_hbpp_spawner(
            ham, tens, syminfo, p_doub, fcfg_sys, hf_en)

        def piv_row(v, k):
            return compress.piv_comp(k, v, args.kept).sum()

        def sys_row(v, k):
            keep, n_left, loc = compress.find_preserve(jnp.abs(v), args.kept)
            rn = jax.random.uniform(k, dtype=jnp.float64)
            return compress.sys_comp(v, keep, n_left, rn, loc).sum()

        t_piv = timeit(jax.jit(piv_row), v0, key)
        print(f"piv_comp (1 row):        {t_piv * 1e3:9.1f} ms", flush=True)
        t_sys = timeit(jax.jit(sys_row), v0, key)
        print(f"find_preserve+sys_comp:  {t_sys * 1e3:9.1f} ms", flush=True)

        def sp(fn):
            def run(k, v, kk):
                w, amp, ini = fn(k, v, -0.02, kk, thresh=jnp.float64(0.0))
                return amp.sum()
            return run

        t_piv_sp = timeit(jax.jit(sp(spawn_piv)), keys, v0, key)
        print(f"spawner pivotal (1 vec): {t_piv_sp * 1e3:9.1f} ms", flush=True)
        t_sys_sp = timeit(jax.jit(sp(spawn_sys)), keys, v0, key)
        print(f"spawner systematic:      {t_sys_sp * 1e3:9.1f} ms", flush=True)

        # ---- accumulate_multi ----
        w, amp, ini = jax.jit(
            lambda k_, v_, kk: spawn_piv(k_, v_, -0.02, kk,
                                         thresh=jnp.float64(0.0))
        )(keys, v0, key)
        w2 = jnp.concatenate([w, w])
        a2_ = jnp.concatenate([amp, amp])
        i2 = jnp.concatenate([ini, ini])
        r2 = jnp.concatenate([
            jnp.zeros(amp.shape, jnp.int32), jnp.ones(amp.shape, jnp.int32)])

        def acc_xla(am_, w_, a_, r_, i_):
            out, st = ar.accumulate_multi(am_, w_, a_, r_, i_)
            return out.vals.sum()

        t_acc = timeit(jax.jit(acc_xla), a1, w2, a2_, r2, i2)
        print(f"accumulate_multi XLA:    {t_acc * 1e3:9.1f} ms", flush=True)

        from fries_tpu.runtime import pallas_merge as pm
        if pm.tpu_supported():
            def acc_pl(am_, w_, a_, r_, i_):
                out, st = pm.accumulate_multi_pallas(am_, w_, a_, r_, i_)
                return out.vals.sum()

            t_accp = timeit(jax.jit(acc_pl), a1, w2, a2_, r2, i2)
            print(f"accumulate_multi Pallas: {t_accp * 1e3:9.1f} ms",
                  flush=True)

        nt = 1000
        tk = keys[:nt]
        tv = jnp.where(jnp.arange(nt) < nt, 1.0, 0.0)

        def dots(k_, v_):
            pos, found = dets.lookup_dets(keys, k_)
            g = jnp.where(found[None, :], a1.vals[:, pos], 0.0)
            return (g * v_[None, :]).sum()

        t_dots = timeit(jax.jit(dots), tk, tv)
        print(f"projection dots (1k q):  {t_dots * 1e3:9.1f} ms", flush=True)

    if args.full:
        # the exact bench_matrix configuration
        d1, _ = dets.single_parity(
            hf_words[None], jnp.asarray([4]), jnp.asarray([10]))
        tk = np.tile(np.asarray(dets.invalid_det(ham.n_words)), (t, 1, 1))
        tv = np.zeros((t, 1))
        tk[0, 0] = np.asarray(hf_words)
        tv[0, 0] = 1.0
        tk[1, 0] = np.asarray(d1)[0]
        tv[1, 0] = 1.0
        mesh = parallel.make_mesh(1)
        cfg = subspace.SubspaceConfig(
            eps=0.02, n_trial=t, vec_nonz=args.kept, matr_samp=args.matr,
            capacity=args.cap, spawn_cap=args.spawn_cap, restart_int=10,
            axis_name=parallel.AXIS, n_shards=1, exchange_cap=600_000,
        )
        step, run_steps, state, aux = subspace.build_sharded(
            ham, cfg, jnp.asarray(tk), jnp.asarray(tv), seed=0, mesh=mesh)
        t0 = time.perf_counter()
        state, m = run_steps(state, 1)
        float(np.asarray(m["norms"]).reshape(-1)[0])
        print(f"full step compile+run:   {time.perf_counter()-t0:9.1f} s",
              flush=True)
        for _ in range(2):
            t0 = time.perf_counter()
            state, m = run_steps(state, 1)
            float(np.asarray(m["norms"]).reshape(-1)[0])
            print(f"full sharded step:       "
                  f"{(time.perf_counter()-t0) * 1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
