"""Probe which layout-changing ops Mosaic lowers on this TPU.

Each candidate implements the packed->staging transpose the v3 merge
kernel needs: (RB, 128) i32 with pos = r*128 + lane  ->  (TB, 1) column.
Run: python tools/probe_reshape.py
"""

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(HERE, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB, TB = 8, 1024


def run(name, body):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    x = jnp.arange(TB, dtype=jnp.int32).reshape(RB, 128)
    try:
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((TB, 1), jnp.int32),
            )(x)
        expect = np.arange(TB, dtype=np.int32)[:, None]
        ok = np.array_equal(np.asarray(out), expect)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:
        print(f"{name}: FAIL ({str(e).splitlines()[0][:110]})")


def direct(x):
    return x.reshape(TB, 1)


def via_transpose(x):
    # pos = r*128 + l; transpose -> (128, RB) has row-major idx l*RB + r,
    # so permute input lanes first is wrong; instead transpose then gather
    # ordering would differ.  This probes raw transpose lowering only.
    t = jnp.transpose(x)              # (128, RB)
    return t.reshape(TB, 1)           # order l*RB + r (NOT pos) — just probe


def onehot_place(x):
    s_out = lax.broadcasted_iota(jnp.int32, (TB, 1), 0)
    lane = lax.broadcasted_iota(jnp.int32, (TB, 128), 1)
    acc = jnp.zeros((TB, 1), jnp.int32)
    for r in range(RB):
        m = ((s_out >= r * 128) & (s_out < (r + 1) * 128)
             & (lane == (s_out - r * 128)))
        acc = acc + jnp.sum(jnp.where(m, x[r:r + 1, :], 0),
                            axis=1, keepdims=True)
    return acc


def rolled_select(x):
    # build rep (TB, 128) with rep[p, l] = x[p // 128, l] via 8 range
    # selects, then one lane-match reduce
    s_out = lax.broadcasted_iota(jnp.int32, (TB, 1), 0)
    lane = lax.broadcasted_iota(jnp.int32, (TB, 128), 1)
    rep = jnp.zeros((TB, 128), jnp.int32)
    for r in range(RB):
        in_r = (s_out >= r * 128) & (s_out < (r + 1) * 128)
        rep = jnp.where(in_r, x[r:r + 1, :], rep)
    return jnp.sum(jnp.where(lane == s_out % 128, rep, 0),
                   axis=1, keepdims=True)


def main():
    print("backend:", jax.default_backend())
    run("direct reshape (8,128)->(1024,1)", direct)
    run("transpose+(128,8)->(1024,1) [order probe]", via_transpose)
    run("onehot_place", onehot_place)
    run("rolled_select", rolled_select)


if __name__ == "__main__":
    main()
