"""Standalone CLT statistical harness for the compression primitives.

Port of the reference's tests/clt pattern (tests/clt/main.cpp, sampler.hpp):
each sampler repeatedly compresses a fixed random vector; unbiasedness shows
as the max deviation of the cumulative mean decaying like n^(-1/2), i.e. a
log-log slope of about -1/2 (tests/clt/main.cpp:1-12).

Run:  python tests/clt_harness.py [--reps 20000]
Exits nonzero if any sampler's fitted slope is far from -1/2 or its final
deviation exceeds the 5-sigma band.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from fries_tpu import compress  # noqa: E402


def slope_check(name, devs, checkpoints):
    devs = np.asarray(devs, float)
    if not np.all(np.isfinite(devs)):
        print(f"{name:24s} NON-FINITE deviations: {devs}")
        return False
    logs = np.log(np.asarray(checkpoints, float))
    logd = np.log(np.maximum(devs, 1e-300))
    # closed-form least-squares slope (np.polyfit's LAPACK lstsq is broken in
    # this environment)
    slope = np.cov(logs, logd, bias=True)[0, 1] / np.var(logs)
    ok = -0.75 < slope < -0.25
    print(f"{name:24s} slope={slope:+.3f}  final_dev={devs[-1]:.3e}  "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def run_sampler(name, sample_fn, target, reps):
    """sample_fn(key) -> one realization; accumulate cumulative mean."""
    batch = 500
    # checkpoints at batch granularity (coarser points would all observe the
    # same cumulative mean and flatten the fitted slope)
    checkpoints = np.unique(
        np.maximum(
            (np.logspace(np.log10(batch), np.log10(reps), 10) / batch).astype(int),
            1,
        )
        * batch
    )
    keys = jax.random.split(jax.random.key(hash(name) % (2**31)), reps // batch)
    f = jax.jit(jax.vmap(lambda k: sample_fn(k)))
    acc = np.zeros_like(np.asarray(target))
    devs = []
    seen = 0
    ck = list(checkpoints)
    for kb in keys:
        out = np.asarray(f(jax.random.split(kb, batch)))
        acc += out.sum(axis=0)
        seen += batch
        while ck and seen >= ck[0]:
            mean = acc / seen
            devs.append(np.abs(mean - np.asarray(target)).max())
            ck.pop(0)
    used = checkpoints[: len(devs)]
    if len(devs) < 3:
        print(f"{name}: too few checkpoints recorded ({len(devs)})")
        return False
    return slope_check(name, np.asarray(devs), used)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20000)
    args = ap.parse_args()
    rng = np.random.default_rng(99)
    ok = True

    # systematic compression (SysStratified sampler analogue)
    vals = jnp.asarray(rng.standard_normal(50))
    n_samp = 15
    keep, left, loc_norm = compress.find_preserve(jnp.abs(vals), n_samp)

    def sys_one(k):
        rn = jax.random.uniform(k, dtype=jnp.float64)
        return compress.sys_comp(vals, keep, left, rn, loc_norm)

    ok &= run_sampler("sys_comp", sys_one, np.asarray(vals), args.reps)

    # pivotal compression (PivSerial analogue)
    def piv_one(k):
        return compress.piv_comp_serial(k, vals, keep, left, loc_norm)

    ok &= run_sampler("piv_comp_serial", piv_one, np.asarray(vals), args.reps)

    # hierarchical compression (HierComp analogue)
    n, kcols = 8, 5
    pv = rng.random(n)
    sw = rng.random((n, kcols))
    sw /= sw.sum(1, keepdims=True)
    ndiv = np.zeros(n, np.int32)
    ndiv[3] = 4
    target = pv[:, None] * sw
    target[3] = 0
    target[3, :4] = pv[3] / 4

    def comp_sub_one(k):
        rn = jax.random.uniform(k, dtype=jnp.float64)
        ov, op, osub, _, _ = compress.comp_sub(
            jnp.asarray(pv), jnp.asarray(ndiv), jnp.asarray(sw),
            jnp.ones((n, kcols), bool), 10, rn, 64,
        )
        dense = jnp.zeros((n, kcols))
        m = op >= 0
        return dense.at[jnp.where(m, op, 0), jnp.where(m, osub, 0)].add(
            jnp.where(m, ov, 0.0)
        )

    ok &= run_sampler("comp_sub", comp_sub_one, target, args.reps)

    # binomial rounding (round_binomially analogue)
    p = jnp.asarray(rng.standard_normal(20) * 2)
    nr = jnp.asarray(rng.integers(1, 5, 20), jnp.int32)

    def round_one(k):
        return compress.round_binomially(k, p, nr).astype(jnp.float64)

    ok &= run_sampler(
        "round_binomially", round_one, np.asarray(p) * np.asarray(nr), args.reps
    )

    if not ok:
        sys.exit(1)
    print("all samplers unbiased (slope ~ -1/2)")


if __name__ == "__main__":
    main()
