"""Determinant bit-kernel tests.

Ports the coverage of the reference tests/test_bitstrings.cpp (bits_between,
bit read/set/zero, HF bit string, excitation parity, flip_spins) onto the
packed-word representation, checked against independent numpy models.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fries_tpu import dets


def np_bits(words, n_bits):
    words = np.asarray(words)
    out = np.zeros(words.shape[:-1] + (n_bits,), dtype=bool)
    for b in range(n_bits):
        out[..., b] = (words[..., b // 32] >> (b % 32)) & 1
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def random_words(rng, batch, n_bits):
    bits = rng.random((batch, n_bits)) < 0.5
    return bits, dets.pack_bits(jnp.asarray(bits))


def test_pack_unpack_roundtrip(rng):
    bits, words = random_words(rng, 17, 77)
    assert words.shape == (17, 3)
    back = np.asarray(dets.unpack_bits(words, 77))
    np.testing.assert_array_equal(back, bits)


def test_read_set_clear_bit(rng):
    bits, words = random_words(rng, 9, 50)
    pos = rng.integers(0, 50, size=9)
    got = np.asarray(dets.read_bit(words, jnp.asarray(pos)))
    want = bits[np.arange(9), pos]
    np.testing.assert_array_equal(got, want)

    set_w = dets.set_bit(words, jnp.asarray(pos))
    clr_w = dets.clear_bit(words, jnp.asarray(pos))
    set_bits = np_bits(set_w, 50)
    clr_bits = np_bits(clr_w, 50)
    want_set = bits.copy()
    want_set[np.arange(9), pos] = True
    want_clr = bits.copy()
    want_clr[np.arange(9), pos] = False
    np.testing.assert_array_equal(set_bits, want_set)
    np.testing.assert_array_equal(clr_bits, want_clr)


def test_popcount_and_bits_below(rng):
    bits, words = random_words(rng, 11, 70)
    np.testing.assert_array_equal(np.asarray(dets.popcount(words)), bits.sum(-1))
    pos = rng.integers(0, 70, size=11)
    got = np.asarray(dets.bits_below(words, jnp.asarray(pos)))
    want = np.array([bits[i, : pos[i]].sum() for i in range(11)])
    np.testing.assert_array_equal(got, want)


def test_bits_between_matches_reference_semantics(rng):
    # reference: count set bits strictly between min and max positions
    # (FRIES/math_utils.c:9-58, tests/test_bitstrings.cpp:13-37)
    bits, words = random_words(rng, 25, 64)
    a = rng.integers(0, 64, size=25)
    b = rng.integers(0, 64, size=25)
    got = np.asarray(dets.bits_between(words, jnp.asarray(a), jnp.asarray(b)))
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    want = np.array([bits[i, lo[i] + 1 : hi[i]].sum() for i in range(25)])
    np.testing.assert_array_equal(got, want)


def test_hf_det():
    # n_orb=6, n_elec=4: alpha orbs {0,1}, beta orbs {6,7}
    bits = np.asarray(dets.hf_bits(6, 4))
    want = np.zeros(12, dtype=bool)
    want[[0, 1, 6, 7]] = True
    np.testing.assert_array_equal(bits, want)
    # words: bits 0,1,6,7 -> 0b11000011 = 0xC3
    words = np.asarray(dets.hf_det(6, 4))
    assert words[0] == 0xC3


def test_occ_list(rng):
    n_orb, n_elec = 11, 6
    # build random dets with exactly n_elec electrons
    batch = 13
    occ = np.stack([rng.choice(2 * n_orb, size=n_elec, replace=False) for _ in range(batch)])
    occ.sort(axis=1)
    bits = np.zeros((batch, 2 * n_orb), dtype=bool)
    for i in range(batch):
        bits[i, occ[i]] = True
    words = dets.pack_bits(jnp.asarray(bits))
    got = np.asarray(dets.occ_list(words, 2 * n_orb, n_elec))
    np.testing.assert_array_equal(got, occ)


def test_single_parity_vs_dense_sign(rng):
    """Check excitation sign against the second-quantization definition:
    a^dag_u a_o |det> with sign (-1)^(number of occupied orbitals between)."""
    n_bits = 20
    batch = 50
    all_bits, all_o, all_u = [], [], []
    while len(all_bits) < batch:
        bits = rng.random(n_bits) < 0.4
        occ_positions = np.where(bits)[0]
        virt_positions = np.where(~bits)[0]
        if len(occ_positions) == 0 or len(virt_positions) == 0:
            continue
        all_bits.append(bits)
        all_o.append(rng.choice(occ_positions))
        all_u.append(rng.choice(virt_positions))
    bits = np.stack(all_bits)
    o = np.array(all_o)
    u = np.array(all_u)
    words = dets.pack_bits(jnp.asarray(bits))
    new_words, sign = dets.single_parity(words, jnp.asarray(o), jnp.asarray(u))
    new_bits = np_bits(new_words, n_bits)
    sign = np.asarray(sign)
    for i in range(batch):
        tmp = bits[i].copy()
        tmp[o[i]] = False
        lo, hi = min(o[i], u[i]), max(o[i], u[i])
        assert sign[i] == (-1) ** tmp[lo + 1 : hi].sum()
        want = bits[i].copy()
        want[o[i]] = False
        want[u[i]] = True
        np.testing.assert_array_equal(new_bits[i], want)


def test_double_parity_composition(rng):
    """Double-excitation parity must match the reference composition order
    (FRIES/fci_utils.c:66-74): clear both occupieds, then sign each leg."""
    n_bits = 24
    batch = 50
    all_bits, orbs = [], []
    while len(all_bits) < batch:
        bits = rng.random(n_bits) < 0.4
        occs = np.where(bits)[0]
        virts = np.where(~bits)[0]
        if len(occs) < 2 or len(virts) < 2:
            continue
        o1, o2 = rng.choice(occs, 2, replace=False)
        u1, u2 = rng.choice(virts, 2, replace=False)
        all_bits.append(bits)
        orbs.append((o1, o2, u1, u2))
    bits = np.stack(all_bits)
    orbs = np.array(orbs)
    words = dets.pack_bits(jnp.asarray(bits))
    new_w, sign = dets.double_parity(
        words,
        jnp.asarray(orbs[:, 0]),
        jnp.asarray(orbs[:, 1]),
        jnp.asarray(orbs[:, 2]),
        jnp.asarray(orbs[:, 3]),
    )
    new_bits = np_bits(new_w, n_bits)
    sign = np.asarray(sign)
    for i in range(batch):
        o1, o2, u1, u2 = orbs[i]
        tmp = bits[i].copy()
        tmp[o1] = False
        tmp[o2] = False
        s1 = (-1) ** tmp[min(o1, u1) + 1 : max(o1, u1)].sum()
        s2 = (-1) ** tmp[min(o2, u2) + 1 : max(o2, u2)].sum()
        assert sign[i] == s1 * s2
        want = tmp.copy()
        want[u1] = True
        want[u2] = True
        np.testing.assert_array_equal(new_bits[i], want)


def test_flip_spins(rng):
    n_orb = 9
    bits, words = random_words(rng, 7, 2 * n_orb)
    flipped = dets.flip_spins(words, n_orb, 2 * n_orb)
    got = np_bits(flipped, 2 * n_orb)
    want = np.concatenate([bits[:, n_orb:], bits[:, :n_orb]], axis=1)
    np.testing.assert_array_equal(got, want)


def test_neel_det():
    # 6 sites half filling: up at 0,2,4; down at sites 1,3,5 -> bits 7,9,11
    bits = np.asarray(dets.neel_bits_1d(6, 6))
    want = np.zeros(12, dtype=bool)
    want[[0, 2, 4, 7, 9, 11]] = True
    np.testing.assert_array_equal(bits, want)


def test_det_compare_and_search(rng):
    n_bits = 70
    bits = rng.random((40, n_bits)) < 0.5
    words = np.asarray(dets.pack_bits(jnp.asarray(bits)))
    # numpy lexicographic order on reversed words (most significant last word)
    order = np.lexsort(tuple(words[:, w] for w in range(words.shape[1])))
    sorted_words = jnp.asarray(words[order])
    # det_less consistency
    a = sorted_words[:-1]
    b = sorted_words[1:]
    less = np.asarray(dets.det_less(a, b))
    eq = np.asarray(dets.det_eq(a, b))
    assert np.all(less | eq)
    # search finds every element
    pos, found = dets.lookup_dets(sorted_words, sorted_words)
    assert np.all(np.asarray(found))
    np.testing.assert_array_equal(np.asarray(pos), np.arange(40))
    # a missing key is not found
    missing = dets.invalid_det(words.shape[1])[None] ^ np.uint32(1)
    _, found = dets.lookup_dets(sorted_words, missing)
    assert not bool(found[0])


def test_invalid_sentinel_sorts_last(rng):
    words = dets.pack_bits(jnp.asarray(rng.random((5, 40)) < 0.5))
    inv = dets.invalid_det(words.shape[-1])
    assert np.all(np.asarray(dets.det_less(words, jnp.broadcast_to(inv, words.shape))))
    assert np.all(np.asarray(dets.is_invalid(inv[None])))
    assert not np.any(np.asarray(dets.is_invalid(words)))
