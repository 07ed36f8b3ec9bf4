"""Scan-amortized TPU timing harness.

Two effects make naive timing through the axon tunnel meaningless
(PLAN.md "Known environment quirks"):

* ``block_until_ready`` can return before on-device work finishes, so
  dispatch-only wall times (~0.03 ms) masquerade as kernel times;
* forcing completion with a scalar fetch costs a ~25 ms host round-trip,
  which swamps sub-50-ms kernels.

``timeit_scan`` runs the operation ``iters`` times inside ONE jitted
``lax.scan`` (carrying a scalar checksum so nothing is dead-code
eliminated), fetches a single scalar, and divides out the constant
round-trip with a measured null baseline.  Per-iteration noise is then
~(25 ms / iters).

Usage:
    from tools.tpu_timeit import timeit_scan
    ms = timeit_scan(lambda x: op(x).sum(), args=(x,), iters=50)
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_NULL_MS: float | None = None


def _fetch(x) -> float:
    return float(np.asarray(x).reshape(-1)[0])


def null_roundtrip_ms(repeats: int = 7) -> float:
    """Median wall time of dispatching + fetching a trivial jitted scalar."""
    global _NULL_MS
    if _NULL_MS is not None:
        return _NULL_MS
    f = jax.jit(lambda s: s + 1.0)
    x = jnp.float32(0.0)
    _fetch(f(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fetch(f(x))
        ts.append(time.perf_counter() - t0)
    _NULL_MS = float(np.median(ts) * 1e3)
    return _NULL_MS


def timeit_scan(fn, args=(), iters: int = 50, repeats: int = 5,
                subtract_null: bool = True) -> float:
    """Median per-call milliseconds of ``fn(*args)`` (must return a scalar
    or array; its first element feeds the scan carry so successive calls
    are sequenced and never elided)."""

    @partial(jax.jit, static_argnames=())
    def run(carry0, *a):
        def body(c, _):
            r = fn(*a)
            s = jnp.asarray(r, jnp.float64).reshape(-1)[0]
            # fold into the carry so iterations serialize
            return c + s * 1e-30, None

        out, _ = lax.scan(body, carry0, None, length=iters)
        return out

    z = jnp.float64(0.0)
    _fetch(run(z, *args))           # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fetch(run(z, *args))
        ts.append(time.perf_counter() - t0)
    total_ms = float(np.median(ts) * 1e3)
    if subtract_null:
        total_ms = max(total_ms - null_roundtrip_ms(), 0.0)
    return total_ms / iters
