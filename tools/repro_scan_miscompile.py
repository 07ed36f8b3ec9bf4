"""Minimized repro for the v5e scan-length miscompile (PLAN round-3
session-2 item 3; VERDICT r4 weak #5).

Observed behavior (2026-08-18, v5e via axon):
  * the full fciqmc step at attempt_cap = 2^23 runs fine standalone and
    under lax.scan with length <= 5;
  * the SAME program under lax.scan with length >= 20 kills the TPU
    worker (kernel fault) - with both the XLA and the Pallas merge path,
    so the trigger is scan-length-dependent program size/scheduling, not
    one kernel;
  * every component kernel passes standalone at the same shapes.

This script bisects the failing scan length for a stripped-down step
that keeps the structural ingredients (big sort + segmented reduction +
gather-heavy sampler inside one scan body).  DO NOT run it on a shared
TPU worker you are not prepared to crash: the failure mode is a worker
kernel fault that poisons every client until restart.  Run it last, or
on a dedicated chip, e.g.:

    FRIES_REPRO_LENS=1,2,5,10,20 python tools/repro_scan_miscompile.py

and report the first crashing length with the generated HLO dump
(XLA_FLAGS=--xla_dump_to=/tmp/scan_hlo) to the XLA/Mosaic maintainers.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    a_cap = 1 << 23
    cap = 1 << 21

    def step(state, _):
        keys, vals, rng = state
        rng, k1, k2 = jax.random.split(rng, 3)
        # gather-heavy "sampler": attempt slots -> parent rows
        par = jax.random.randint(k1, (a_cap,), 0, cap)
        amp = vals[par] * jax.random.uniform(k2, (a_cap,), dtype=jnp.float32)
        tgt = keys[par] ^ jax.random.randint(k1, (a_cap,), 1, 1 << 20)
        # big sort + segment boundaries + scatter-free accumulate
        order = jnp.argsort(tgt)
        st = tgt[order]
        sv = amp[order].astype(jnp.float64)
        new_seg = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (st[1:] != st[:-1]).astype(jnp.int32)])
        seg = jnp.cumsum(new_seg) - 1
        sums = jnp.zeros((cap,), jnp.float64).at[
            jnp.clip(seg, 0, cap - 1)].add(sv)
        vals = 0.99 * vals + sums[: cap].astype(vals.dtype)
        return (keys, vals, rng), jnp.sum(vals)

    rng = jax.random.key(0)
    keys0 = jax.random.randint(rng, (cap,), 0, 1 << 30)
    vals0 = jnp.ones((cap,), jnp.float32)

    lens = [int(x) for x in os.environ.get(
        "FRIES_REPRO_LENS", "1,2,5,10,20").split(",")]
    for n in lens:
        fn = jax.jit(lambda s: lax.scan(step, s, None, length=n))
        state = (keys0, vals0, rng)
        out_state, tot = fn(state)
        print(f"scan({n}): OK, sum={float(tot[-1]):.3e}", flush=True)


if __name__ == "__main__":
    main()
