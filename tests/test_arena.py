"""Sorted-arena runtime tests.

Ports the DistVec accumulation semantics checks of the reference
tests/test_vector.cpp:192-224 (add/perform_add accumulate duplicates, values
sum) plus the initiator rule (vec_utils.hpp:631-639) onto the sort-merge arena.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fries_tpu import dets
from fries_tpu.runtime import arena as ar

N_BITS = 12
W = dets.n_words(N_BITS)
E = 4


def key_of(bits_int):
    """Pack a python int bitmask into det words."""
    bits = [(bits_int >> b) & 1 for b in range(N_BITS)]
    return np.asarray(dets.pack_bits(jnp.asarray(np.array(bits, bool)[None])))[0]


def make_spawns(entries, size):
    """entries: list of (bits_int, val, ini). Pad to `size` with sentinels."""
    keys = np.tile(np.asarray(dets.invalid_det(W)), (size, 1))
    vals = np.zeros(size)
    ini = np.zeros(size, bool)
    for i, (b, v, flag) in enumerate(entries):
        keys[i] = key_of(b)
        vals[i] = v
        ini[i] = flag
    return jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(ini)


def dense_of(a, row=0):
    """Dense dict {bits_int: val} of one arena row."""
    keys = np.asarray(a.keys)
    vals = np.asarray(a.vals[row])
    out = {}
    for i in range(a.capacity):
        if keys[i, -1] != 0xFFFFFFFF:
            b = 0
            for bit in range(N_BITS):
                if (keys[i, bit // 32] >> (bit % 32)) & 1:
                    b |= 1 << bit
            out[b] = out.get(b, 0) + vals[i]
    return out


def test_accumulate_merges_duplicates():
    a = ar.make(16, W, 1)
    sp = make_spawns(
        [(0b1111, 1.0, True), (0b1111, 2.0, True), (0b10111, 5.0, True)], 8
    )
    a, stats = ar.accumulate(a, *sp)
    assert not bool(stats["overflow"])
    assert int(a.n_used[0]) == 2
    d = dense_of(a)
    assert np.isclose(d[0b1111], 3.0)
    assert np.isclose(d[0b10111], 5.0)
    # sortedness invariant
    keys = a.keys
    less = np.asarray(dets.det_less(keys[:-1], keys[1:]))
    eq = np.asarray(dets.det_eq(keys[:-1], keys[1:]))
    assert np.all(less | eq)
    pos, found = ar.lookup(a, jnp.asarray([key_of(0b10111)]))
    assert bool(found[0])


def test_initiator_rule():
    a = ar.make(16, W, 2)
    # establish an occupied determinant with nonzero origin value (row 0)
    sp = make_spawns([(0b1111, 2.0, True)], 8)
    a, _ = ar.accumulate(a, *sp, origin_row=0, dest_row=0)

    # non-initiator spawn to occupied target (allowed), to empty (dropped),
    # initiator spawn to empty (allowed)
    sp = make_spawns(
        [(0b1111, 1.0, False), (0b110011, 7.0, False), (0b101101, 3.0, True)], 8
    )
    a2, stats = ar.accumulate(a, *sp, origin_row=0, dest_row=1)
    d1 = dense_of(a2, row=1)
    assert np.isclose(d1.get(0b1111, 0), 1.0)
    assert 0b110011 not in d1  # dropped entirely (no entry created)
    assert np.isclose(d1.get(0b101101, 0), 3.0)
    assert int(stats["nonini_occ_add"]) == 1
    # origin row preserved through merge
    d0 = dense_of(a2, row=0)
    assert np.isclose(d0[0b1111], 2.0)
    assert np.isclose(d0.get(0b101101, 0), 0.0)


def test_noninitiator_not_rescued_by_same_batch_initiator():
    """Reference two-pass order (frisys_mol.cpp:430-471): a non-initiator spawn
    to a determinant only created this step by an initiator spawn is lost."""
    a = ar.make(16, W, 1)
    sp = make_spawns([(0b111100, 4.0, True), (0b111100, 1.0, False)], 8)
    a, _ = ar.accumulate(a, *sp)
    d = dense_of(a)
    assert np.isclose(d[0b111100], 4.0)


def test_compact_and_zero_removal():
    a = ar.make(16, W, 1)
    sp = make_spawns([(3, 1.0, True), (5, -2.0, True), (9, 0.5, True)], 8)
    a, _ = ar.accumulate(a, *sp)
    # zero out det 5, compact away zero-valued entries
    vals = a.vals.at[0].set(jnp.where(jnp.asarray(dets.det_eq(a.keys, jnp.asarray(key_of(5))[None])), 0.0, a.vals[0]))
    a = ar.set_row(a, 0, vals[0])
    keep = (a.vals[0] != 0)
    a2 = ar.compact(a, keep)
    d = dense_of(a2)
    assert set(d.keys()) == {3, 9}
    assert int(a2.n_used[0]) == 2
    keys = a2.keys
    less = np.asarray(dets.det_less(keys[:-1], keys[1:]))
    eq = np.asarray(dets.det_eq(keys[:-1], keys[1:]))
    assert np.all(less | eq)


def test_dot_product():
    a = ar.make(16, W, 1)
    sp = make_spawns([(3, 1.5, True), (5, -2.0, True), (9, 0.5, True)], 8)
    a, _ = ar.accumulate(a, *sp)
    qkeys = jnp.asarray(np.stack([key_of(5), key_of(9), key_of(17)]))
    qvals = jnp.asarray([2.0, 4.0, 100.0])
    got = float(ar.dot(a, qkeys, qvals))
    assert np.isclose(got, -2.0 * 2.0 + 0.5 * 4.0)


def test_overflow_flag():
    a = ar.make(4, W, 1)
    sp = make_spawns([(1 << i, 1.0, True) for i in range(6)], 8)
    a, stats = ar.accumulate(a, *sp)
    assert bool(stats["overflow"])


def test_random_accumulate_against_dict():
    rng = np.random.default_rng(4)
    a = ar.make(64, W, 1)
    model = {}
    for step in range(4):
        entries = []
        for _ in range(10):
            b = int(rng.integers(1, 2**N_BITS - 1))
            v = float(rng.standard_normal())
            entries.append((b, v, True))
            model[b] = model.get(b, 0.0) + v
        sp = make_spawns(entries, 16)
        a, stats = ar.accumulate(a, *sp)
        assert not bool(stats["overflow"])
    d = dense_of(a)
    model = {k: v for k, v in model.items()}
    assert set(d.keys()) == set(model.keys())
    for k in model:
        assert np.isclose(d[k], model[k]), (k, d[k], model[k])


def test_sorted_merge_matches_model():
    """The sorted-merge accumulate must agree exactly with a sequential
    dictionary model of the reference semantics, including initiator gating
    (two-pass add, frisys_mol.cpp:430-471)."""
    rng = np.random.default_rng(8)
    for trial in range(5):
        a = ar.make(64, W, 2)
        seed_entries = [
            (int(rng.integers(1, 2**N_BITS - 1)), float(rng.standard_normal()), True)
            for _ in range(12)
        ]
        sp0 = make_spawns(seed_entries, 16)
        a, _ = ar.accumulate(a, *sp0, origin_row=0, dest_row=0)
        row0 = dense_of(a, 0)
        entries = [
            (
                int(rng.integers(1, 2**N_BITS - 1)),
                float(rng.standard_normal()),
                bool(rng.random() < 0.5),
            )
            for _ in range(10)
        ]
        sp = make_spawns(entries, 16)
        out_a, stats_a = ar.accumulate(a, *sp, origin_row=0, dest_row=1)

        # sequential model: non-initiator spawns count only when the target
        # exists with nonzero row-0 value BEFORE this batch
        model1 = {}
        n_nonini = 0
        for b, v, flag in entries:
            occupied = row0.get(b, 0.0) != 0.0
            if flag or occupied:
                model1[b] = model1.get(b, 0.0) + v
                if not flag and occupied:
                    n_nonini += 1
        d1 = dense_of(out_a, 1)
        live1 = {k: v for k, v in d1.items() if v != 0 or k in row0}
        for k in model1:
            assert np.isclose(d1.get(k, 0.0), model1[k]), (k, trial)
        for k in d1:
            if d1[k] != 0:
                assert k in model1 or k in row0
        assert int(stats_a["nonini_occ_add"]) == n_nonini
        # row 0 preserved (new entries appear with zero row-0 value)
        d0 = dense_of(out_a, 0)
        assert {k: v for k, v in d0.items() if v != 0} == {
            k: v for k, v in row0.items() if v != 0
        }


def test_occupancy_stats():
    """print_ht-parity diagnostics (det_hash.hpp:98-114)."""
    a = ar.make(16, 2, 1)
    keys = jnp.asarray(np.array([[1, 0], [2, 0], [3, 0]], np.uint32))
    vals = jnp.asarray([1.0, 0.0, -2.0])[None]
    a = ar.from_unsorted(a, keys, vals)
    occ = ar.occupancy_stats(a)
    assert occ["capacity"] == 16
    assert occ["used"] == 3 and occ["live"] == 3
    assert occ["nonzero"] == 2 and occ["zero_live"] == 1
    assert abs(occ["fill"] - 3 / 16) < 1e-12


def test_dedup_spawns_matches_direct_accumulate():
    """accumulate(dedup(stream)) must equal accumulate(stream) including
    initiator gating: ini and non-ini contributions to the same target
    stay separate dedup rows."""
    rng = np.random.default_rng(5)
    c, w, s, cap = 64, 2, 4096, 256
    base = ar.make(c, w, 2)
    occ_keys = np.zeros((8, w), np.uint32)
    occ_keys[:, 0] = rng.choice(100, size=8, replace=False) + 1
    base = ar.from_unsorted(
        base, jnp.asarray(occ_keys),
        jnp.stack([rng.standard_normal(8), np.zeros(8)]))

    sk = np.zeros((s, w), np.uint32)
    sk[:, 0] = rng.choice(120, size=s) + 1  # heavy duplication
    sv = rng.standard_normal(s)
    si = rng.random(s) < 0.5
    # sprinkle invalid + zero rows
    from fries_tpu import dets as d
    sent = np.asarray(d.invalid_det(w))
    kill = rng.random(s) < 0.1
    sk[kill] = sent
    sv[kill] = 0.0
    sv[rng.random(s) < 0.05] = 0.0

    a1, st1 = ar.accumulate(base, jnp.asarray(sk), jnp.asarray(sv),
                            jnp.asarray(si), origin_row=0, dest_row=1)
    dk, dv, di, ovf = ar.dedup_spawns(jnp.asarray(sk), jnp.asarray(sv),
                                      jnp.asarray(si), cap)
    assert not bool(ovf)
    a2, st2 = ar.accumulate(base, dk, dv, di, origin_row=0, dest_row=1)

    assert bool(st1["overflow"]) == bool(st2["overflow"])

    def snapshot(a):
        out = {}
        keys = np.asarray(a.keys)
        vals = np.asarray(a.vals)
        valid = np.asarray(a.valid)
        for i in np.where(valid)[0]:
            out[tuple(keys[i])] = vals[1, i]
        return out

    s1, s2 = snapshot(a1), snapshot(a2)
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_allclose(s1[k], s2[k], rtol=1e-12, atol=1e-12)


def test_dedup_spawns_overflow_flag():
    s, w = 64, 2
    sk = np.zeros((s, w), np.uint32)
    sk[:, 0] = np.arange(s) + 1  # all unique
    sv = np.ones(s)
    si = np.zeros(s, bool)
    _, _, _, ovf = ar.dedup_spawns(jnp.asarray(sk), jnp.asarray(sv),
                                   jnp.asarray(si), 32)
    assert bool(ovf)
