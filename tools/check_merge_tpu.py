"""On-device validation of the Pallas merge kernels after changes.

Runs the v2 single/two-row kernel (plain + fused-compaction keep_mask) and
the multi-row kernel against the XLA arena paths on small random cases and
asserts exact structural agreement.  Run on the real TPU:

    python tools/check_merge_tpu.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(HERE, ".jax_cache"))

import numpy as np
import jax.numpy as jnp

import fries_tpu  # noqa: F401  (x64 config)
from fries_tpu import dets
from fries_tpu.runtime import arena as arena_mod
from fries_tpu.runtime import pallas_merge

from test_pallas_merge import _rand_case, _arena_dict


def check(name, ref, got, rstats, gstats, rows):
    assert bool(gstats["overflow"]) == bool(rstats["overflow"]), name
    assert int(gstats["nonini_occ_add"]) == int(rstats["nonini_occ_add"]), name
    assert int(got.n_used[0]) == int(ref.n_used[0]), (
        name, int(got.n_used[0]), int(ref.n_used[0]))
    rvalid = np.nonzero(~np.asarray(dets.is_invalid(ref.keys)))[0]
    np.testing.assert_array_equal(
        np.asarray(got.keys)[rvalid], np.asarray(ref.keys)[rvalid])
    for row in range(rows):
        np.testing.assert_allclose(
            np.asarray(got.vals[row])[rvalid],
            np.asarray(ref.vals[row])[rvalid], rtol=1e-9, atol=1e-12)
    print(f"{name}: ok ({len(rvalid)} rows)")


def main():
    import jax
    print("backend:", jax.default_backend(), jax.devices())
    assert pallas_merge.tpu_supported(), "TPU Pallas probe failed"
    rng = np.random.default_rng(0)
    capacity = 2048

    # single-row plain
    a, sk, sv, si = _rand_case(rng, 2, capacity, n_occ=700, n_spawn=1500,
                               n_universe=1600)
    ref, rs = arena_mod.accumulate(a, sk, sv, si)
    got, gs = pallas_merge.accumulate_pallas(a, sk, sv, si)
    check("single-row", ref, got, rs, gs, 1)

    # two-row power layout, plain
    a2 = arena_mod.Arena(
        keys=a.keys, vals=jnp.concatenate([a.vals, jnp.zeros_like(a.vals)]),
        n_used=a.n_used)
    ref, rs = arena_mod.accumulate(a2, sk, sv, si, origin_row=0, dest_row=1)
    got, gs = pallas_merge.accumulate_pallas(a2, sk, sv, si,
                                             origin_row=0, dest_row=1)
    check("two-row", ref, got, rs, gs, 2)

    # two-row fused compaction
    keep = jnp.asarray(rng.random(capacity) < 0.05)
    ref_in = arena_mod.compact(a2, (a2.vals[0] != 0) | keep)
    ref, rs = arena_mod.accumulate(ref_in, sk, sv, si,
                                   origin_row=0, dest_row=1)
    got, gs = pallas_merge.accumulate_pallas(a2, sk, sv, si, origin_row=0,
                                             dest_row=1, keep_mask=keep)
    check("fused-compaction", ref, got, rs, gs, 2)

    # multi-row (subspace layout)
    for n_rows in (2, 4):
        a1, sk, sv, si = _rand_case(rng, 2, capacity, n_occ=700,
                                    n_spawn=1500, n_universe=1600)
        n = int(np.asarray(a1.n_used)[0])
        vals = jnp.asarray(rng.standard_normal((n_rows, capacity)))
        mask = rng.random((n_rows, capacity)) < 0.25
        vals = jnp.where(jnp.asarray(mask), 0.0, vals)
        vals = jnp.where(jnp.arange(capacity)[None, :] < n, vals, 0.0)
        am = arena_mod.Arena(keys=a1.keys, vals=vals, n_used=a1.n_used)
        srows = jnp.asarray(rng.integers(0, n_rows, size=sv.shape[0]),
                            jnp.int32)
        ref, rs = arena_mod.accumulate_multi(am, sk, sv, srows, si)
        got, gs = pallas_merge.accumulate_multi_pallas(am, sk, sv, srows, si)
        check(f"multi-row R={n_rows}", ref, got, rs, gs, n_rows)

    print("ALL OK")


if __name__ == "__main__":
    main()
