"""Measure the sharded spawn-exchange cost at production spawn counts
(VERDICT round-2 weak item 4: shard.exchange had never been timed at the
1.4e6-row scale the 1e6-det flagship produces).

Runs on the 8-virtual-device CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count=8), which measures the bucketing /
gather machinery around the all_to_all; on real hardware the collective
itself rides ICI.  Compares the current gather-based bucket build against
a spawn count sweep.

Usage:  JAX_PLATFORMS=cpu python tools/measure_exchange.py
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    )
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(HERE, ".jax_cache"))

import numpy as np
import jax

# the axon TPU plugin overrides JAX_PLATFORMS; force through jax.config
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

import fries_tpu  # noqa: F401
from fries_tpu import dets, parallel
from fries_tpu.runtime import shard as sh


def main():
    n_dev = len(jax.devices())
    mesh = parallel.make_mesh(n_dev)
    w = 2
    print(f"# devices={n_dev}")

    for s_total in (175_000 * 8, 1_400_000 * 8 // 4, 1_400_000 * 8):
        s_local = s_total // n_dev
        cap = 2 * s_local // n_dev  # matches power.py's default exchange_cap
        rng = np.random.default_rng(0)
        words = rng.integers(0, 2**22, size=(s_total, w), dtype=np.uint32)
        amps = rng.normal(size=s_total)
        ini = (rng.random(s_total) < 0.5).astype(np.int32)

        def body(wds, am, fl):
            target = sh.shard_of_words(wds, n_dev)
            received, ov = sh.exchange(
                {"keys": wds, "amps": am, "ini": fl},
                target, n_dev, cap, parallel.AXIS,
            )
            return (jnp.sum(received["amps"])[None],
                    jnp.sum(~dets.is_invalid(received["keys"]))[None],
                    ov[None])

        f = jax.jit(
            shard_map(
                body, mesh=mesh,
                in_specs=(P(parallel.AXIS), P(parallel.AXIS),
                          P(parallel.AXIS)),
                out_specs=(P(parallel.AXIS), P(parallel.AXIS),
                           P(parallel.AXIS)),
            )
        )
        args = (jnp.asarray(words), jnp.asarray(amps), jnp.asarray(ini))
        tot, cnt, ov = f(*args)
        np.asarray(tot)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            tot, cnt, ov = f(*args)
            np.asarray(tot)
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        n_recv = int(np.asarray(cnt).sum())
        print(f"rows/shard={s_local:>9,}  cap={cap:>9,}  "
              f"exchange={sec * 1e3:7.1f} ms  "
              f"({sec / s_total * 1e9:5.1f} ns/row)  received={n_recv:,}  "
              f"overflow={bool(np.asarray(ov).any())}")


if __name__ == "__main__":
    main()
