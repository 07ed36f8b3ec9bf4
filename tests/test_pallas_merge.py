"""Pallas streaming merge-accumulate vs the XLA arena path.

Runs the kernel in interpreter mode on CPU over randomized spawn streams and
asserts the resulting arena (keys, values, stats) matches
``arena.accumulate`` exactly in structure and to f32-pair precision in
values.  Covers: duplicates, initiator gating, segments spanning tile
boundaries, carry flush at stream end, empty spawn sets, and overflow.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fries_tpu import dets
from fries_tpu.runtime import arena as arena_mod
from fries_tpu.runtime import pallas_merge


def _mk_arena(capacity, n_words, keys_np, vals_np):
    a = arena_mod.make(capacity, n_words, 1)
    n = keys_np.shape[0]
    keys = a.keys.at[:n].set(jnp.asarray(keys_np, jnp.uint32))
    vals = a.vals.at[0, :n].set(jnp.asarray(vals_np))
    return arena_mod.Arena(keys=keys, vals=vals,
                           n_used=jnp.asarray([n], jnp.int32))


def _arena_dict(a):
    keys = np.asarray(a.keys)
    vals = np.asarray(a.vals[0])
    valid = ~np.asarray(dets.is_invalid(a.keys))
    out = {}
    for i in np.nonzero(valid)[0]:
        out[tuple(int(w) for w in keys[i])] = float(vals[i])
    return out


def _rand_case(rng, n_words, capacity, n_occ, n_spawn, n_universe,
               ini_frac=0.6, invalid_frac=0.1):
    # universe of unique dets as random non-sentinel words
    uni = rng.integers(0, 2**20, size=(n_universe, n_words), dtype=np.uint32)
    uni[:, -1] &= np.uint32(0x0FFFFFFF)  # never sentinel
    pk = np.asarray(dets.pack_key(jnp.asarray(uni))).astype(np.int64)
    _, uniq_idx = np.unique(pk, return_index=True)
    uni = uni[uniq_idx]
    occ_idx = rng.choice(uni.shape[0], size=min(n_occ, uni.shape[0]),
                         replace=False)
    okeys = uni[np.sort(occ_idx)]
    # sort arena by packed key order
    order = np.argsort(
        np.asarray(dets.pack_key(jnp.asarray(okeys))).astype(np.int64),
        kind="stable")
    okeys = okeys[order]
    ovals = rng.standard_normal(okeys.shape[0])
    ovals[rng.random(okeys.shape[0]) < 0.2] = 0.0  # some zero-val rows
    a = _mk_arena(capacity, n_words, okeys, ovals)

    sidx = rng.integers(0, uni.shape[0], n_spawn)
    skeys = uni[sidx].copy()
    inval = rng.random(n_spawn) < invalid_frac
    skeys[inval] = np.iinfo(np.uint32).max
    svals = rng.standard_normal(n_spawn) * 0.3
    sini = rng.random(n_spawn) < ini_frac
    return a, jnp.asarray(skeys), jnp.asarray(svals), jnp.asarray(sini)


@pytest.mark.parametrize("version", ["v2"])
@pytest.mark.parametrize("n_words", [1, 2])
@pytest.mark.parametrize("trial", range(3))
def test_matches_xla_accumulate(n_words, trial, version):
    rng = np.random.default_rng(100 * n_words + trial)
    # merged stream ~1100 elements -> spans 3 kernel tiles (v2; 2 for v3),
    # exercising the cross-tile segment carry and the final flush
    capacity = 1024
    a, sk, sv, si = _rand_case(
        rng, n_words, capacity, n_occ=400, n_spawn=700, n_universe=800)
    ref, rstats = arena_mod.accumulate(a, sk, sv, si)
    got, gstats = pallas_merge.accumulate_pallas(a, sk, sv, si,
                                                 interpret=True,
                                                 version=version)
    assert bool(gstats["overflow"]) == bool(rstats["overflow"])
    assert int(gstats["nonini_occ_add"]) == int(rstats["nonini_occ_add"])
    dref = _arena_dict(ref)
    dgot = _arena_dict(got)
    assert set(dgot) == set(dref)
    for k in dref:
        assert np.isclose(dgot[k], dref[k], rtol=1e-12, atol=1e-12), k
    assert int(got.n_used[0]) == int(ref.n_used[0])
    # output stays sorted (direct compare: np.diff would overflow int64
    # across the valid/sentinel boundary)
    pk = np.asarray(dets.pack_key(got.keys)).astype(np.int64)
    assert np.all(pk[1:] >= pk[:-1])


@pytest.mark.parametrize("version", ["v2"])
def test_empty_spawns(version):
    rng = np.random.default_rng(7)
    a, sk, sv, si = _rand_case(rng, 2, 128, n_occ=40, n_spawn=32,
                               n_universe=64, invalid_frac=1.0)
    ref, _ = arena_mod.accumulate(a, sk, sv, si)
    got, gstats = pallas_merge.accumulate_pallas(a, sk, sv, si,
                                                 interpret=True,
                                                 version=version)
    assert not bool(gstats["overflow"])
    assert _arena_dict(got) == pytest.approx(_arena_dict(ref))


@pytest.mark.parametrize("version", ["v2"])
def test_empty_arena(version):
    rng = np.random.default_rng(8)
    a = arena_mod.make(128, 2, 1)
    sk = jnp.asarray(
        rng.integers(0, 2**16, size=(64, 2), dtype=np.uint32))
    sv = jnp.asarray(rng.standard_normal(64))
    si = jnp.ones((64,), bool)
    ref, _ = arena_mod.accumulate(a, sk, sv, si)
    got, _ = pallas_merge.accumulate_pallas(a, sk, sv, si, interpret=True,
                                            version=version)
    dref, dgot = _arena_dict(ref), _arena_dict(got)
    assert set(dgot) == set(dref)
    for k in dref:
        assert np.isclose(dgot[k], dref[k]), k


@pytest.mark.parametrize("version", ["v2"])
def test_overflow_flagged(version):
    rng = np.random.default_rng(9)
    a, sk, sv, si = _rand_case(rng, 2, 64, n_occ=60, n_spawn=200,
                               n_universe=400, ini_frac=1.0,
                               invalid_frac=0.0)
    _, rstats = arena_mod.accumulate(a, sk, sv, si)
    _, gstats = pallas_merge.accumulate_pallas(a, sk, sv, si,
                                               interpret=True,
                                               version=version)
    assert bool(rstats["overflow"])
    assert bool(gstats["overflow"])


@pytest.mark.parametrize("version", ["v2"])
@pytest.mark.parametrize("trial", range(2))
def test_two_row_power_layout(trial, version):
    """origin_row=0 gate / dest_row=1 accumulate - the power-step layout."""
    rng = np.random.default_rng(40 + trial)
    capacity = 1024
    a1, sk, sv, si = _rand_case(
        rng, 2, capacity, n_occ=400, n_spawn=700, n_universe=800)
    # widen to two rows: row 0 = solution (gate), row 1 = zeros (dest)
    a = arena_mod.Arena(
        keys=a1.keys,
        vals=jnp.concatenate([a1.vals, jnp.zeros_like(a1.vals)]),
        n_used=a1.n_used)
    ref, rstats = arena_mod.accumulate(a, sk, sv, si,
                                       origin_row=0, dest_row=1)
    got, gstats = pallas_merge.accumulate_pallas(
        a, sk, sv, si, origin_row=0, dest_row=1, interpret=True,
        version=version)
    assert bool(gstats["overflow"]) == bool(rstats["overflow"])
    assert int(gstats["nonini_occ_add"]) == int(rstats["nonini_occ_add"])
    assert int(got.n_used[0]) == int(ref.n_used[0])
    rvalid = np.nonzero(~np.asarray(dets.is_invalid(ref.keys)))[0]
    np.testing.assert_array_equal(
        np.asarray(got.keys)[rvalid], np.asarray(ref.keys)[rvalid])
    for row in range(2):
        np.testing.assert_allclose(
            np.asarray(got.vals[row])[rvalid],
            np.asarray(ref.vals[row])[rvalid], rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("version", ["v2"])
@pytest.mark.parametrize("n_rows", [2, 3])
@pytest.mark.parametrize("trial", range(2))
def test_multi_row_matches_xla(n_rows, trial, version):
    """Per-spawn destination rows (subspace layout) vs accumulate_multi."""
    rng = np.random.default_rng(60 + 10 * n_rows + trial)
    capacity = 1024
    a1, sk, sv, si = _rand_case(
        rng, 2, capacity, n_occ=400, n_spawn=700, n_universe=800)
    n = int(np.asarray(a1.n_used)[0])
    vals = jnp.asarray(rng.standard_normal((n_rows, capacity)))
    # zero out some entries per row (exercise per-row occupancy gating) and
    # everything past the used prefix
    mask = rng.random((n_rows, capacity)) < 0.25
    vals = jnp.where(jnp.asarray(mask), 0.0, vals)
    vals = jnp.where(jnp.arange(capacity)[None, :] < n, vals, 0.0)
    a = arena_mod.Arena(keys=a1.keys, vals=vals, n_used=a1.n_used)
    srows = jnp.asarray(
        rng.integers(0, n_rows, size=sv.shape[0]), jnp.int32)
    ref, rstats = arena_mod.accumulate_multi(a, sk, sv, srows, si)
    got, gstats = pallas_merge.accumulate_multi_pallas(
        a, sk, sv, srows, si, interpret=True, version=version)
    assert bool(gstats["overflow"]) == bool(rstats["overflow"])
    assert int(gstats["nonini_occ_add"]) == int(rstats["nonini_occ_add"])
    assert int(got.n_used[0]) == int(ref.n_used[0])
    rvalid = np.nonzero(~np.asarray(dets.is_invalid(ref.keys)))[0]
    np.testing.assert_array_equal(
        np.asarray(got.keys)[rvalid], np.asarray(ref.keys)[rvalid])
    for row in range(n_rows):
        np.testing.assert_allclose(
            np.asarray(got.vals[row])[rvalid],
            np.asarray(ref.vals[row])[rvalid], rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("version", ["v2"])
@pytest.mark.parametrize("trial", range(2))
def test_fused_compaction_matches_compact_then_accumulate(trial, version):
    """keep_mask drop-dead mode == arena.compact followed by accumulate."""
    rng = np.random.default_rng(80 + trial)
    capacity = 1024
    a1, sk, sv, si = _rand_case(
        rng, 2, capacity, n_occ=400, n_spawn=700, n_universe=800)
    # two-row power layout; many dead rows (gate == 0), a few protected
    a = arena_mod.Arena(
        keys=a1.keys,
        vals=jnp.concatenate([a1.vals, jnp.zeros_like(a1.vals)]),
        n_used=a1.n_used)
    keep = jnp.asarray(rng.random(capacity) < 0.05)
    ref_in = arena_mod.compact(a, (a.vals[0] != 0) | keep)
    ref, rstats = arena_mod.accumulate(ref_in, sk, sv, si,
                                       origin_row=0, dest_row=1)
    got, gstats = pallas_merge.accumulate_pallas(
        a, sk, sv, si, origin_row=0, dest_row=1, keep_mask=keep,
        interpret=True, version=version)
    assert bool(gstats["overflow"]) == bool(rstats["overflow"])
    assert int(gstats["nonini_occ_add"]) == int(rstats["nonini_occ_add"])
    assert int(got.n_used[0]) == int(ref.n_used[0])
    rvalid = np.nonzero(~np.asarray(dets.is_invalid(ref.keys)))[0]
    np.testing.assert_array_equal(
        np.asarray(got.keys)[rvalid], np.asarray(ref.keys)[rvalid])
    for row in range(2):
        np.testing.assert_allclose(
            np.asarray(got.vals[row])[rvalid],
            np.asarray(ref.vals[row])[rvalid], rtol=1e-12, atol=1e-12)


def test_key_roundtrip():
    rng = np.random.default_rng(11)
    for w in (1, 2):
        words = jnp.asarray(
            rng.integers(0, 2**32, size=(50, w), dtype=np.uint32))
        kh, kl = pallas_merge.split_key(words)
        back = pallas_merge.unsplit_key(kh, kl, w)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(words))
