"""Slater-determinant bit-string kernels, TPU-native.

Determinants are fixed-shape arrays of ``uint32`` words: bit ``b`` of a
determinant lives at ``words[b // 32] >> (b % 32) & 1``.  Spin-up (alpha)
spatial orbitals occupy bits ``0..n_orb-1``, spin-down (beta) bits
``n_orb..2*n_orb-1``; Hubbard-Holstein states append ``ph_bits`` phonon counter
bits per site above the electron bits.  This mirrors the layout of the
reference implementation (FRIES/det_store.h:23-40, FRIES/hh_vec.hpp:27) but
replaces malloc'd byte strings + SSE byte-LUT decoding (FRIES/math_utils.c) with
vectorized ``lax.population_count`` / masked-reduction kernels that batch over a
leading determinant axis.

All functions are pure, jit-friendly, and vectorized over arbitrary leading
batch dimensions unless noted.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fries_tpu import kernels

WORD_BITS = 32
UINT32_MAX = np.uint32(0xFFFFFFFF)

_BIT_VALUES = (np.uint32(1) << np.arange(WORD_BITS, dtype=np.uint32)).astype(np.uint32)


def n_words(n_bits: int) -> int:
    """Number of uint32 words needed to store ``n_bits`` bits."""
    return -(-n_bits // WORD_BITS)


# ---------------------------------------------------------------------------
# pack / unpack
# ---------------------------------------------------------------------------

def pack_bits(bits: jax.Array, num_words: int | None = None) -> jax.Array:
    """Pack a boolean occupancy tensor ``(..., n_bits)`` into uint32 words.

    Inverse of :func:`unpack_bits`.  Bits beyond ``n_bits`` are zero.
    """
    n_bits = bits.shape[-1]
    w = num_words if num_words is not None else n_words(n_bits)
    pad = w * WORD_BITS - n_bits
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), dtype=bits.dtype)], axis=-1
        )
    grouped = bits.reshape(bits.shape[:-1] + (w, WORD_BITS)).astype(jnp.uint32)
    return jnp.sum(grouped * _BIT_VALUES, axis=-1, dtype=jnp.uint32)


def unpack_bits(words: jax.Array, n_bits: int) -> jax.Array:
    """Unpack uint32 words ``(..., W)`` into a boolean tensor ``(..., n_bits)``.

    Column-wise word select + shift, fully fused elementwise - the naive
    (..., W, 32) expand + reshape forces a lane relayout that measured
    ~250 ms at 7e5 rows on TPU v5e."""
    w = words.shape[-1]
    bit = np.arange(n_bits)
    shift = jnp.asarray(bit % WORD_BITS, jnp.uint32)
    word_idx = bit // WORD_BITS  # static per output column
    sel = jnp.zeros(words.shape[:-1] + (n_bits,), jnp.uint32)
    for j in range(w):
        col = jnp.asarray(word_idx == j)
        sel = jnp.where(col, words[..., j : j + 1], sel)
    return ((sel >> shift) & 1).astype(jnp.bool_)


# ---------------------------------------------------------------------------
# single-bit ops (reference: FRIES/det_store.c:11-21)
# ---------------------------------------------------------------------------

def _word_select(num_words: int, pos: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One-hot word mask (..., W) and in-word bit value for positions ``pos``."""
    word_idx = (pos // WORD_BITS).astype(jnp.int32)
    bit_idx = (pos % WORD_BITS).astype(jnp.uint32)
    onehot = jnp.arange(num_words, dtype=jnp.int32) == word_idx[..., None]
    bit_val = (jnp.uint32(1) << bit_idx)[..., None]
    return onehot, bit_val


def read_bit(words: jax.Array, pos: jax.Array) -> jax.Array:
    """Read bit ``pos`` of each determinant; ``pos`` broadcasts over the batch."""
    pos = jnp.asarray(pos)
    onehot, bit_val = _word_select(words.shape[-1], pos)
    return jnp.any((words & bit_val).astype(jnp.bool_) & onehot, axis=-1)


def set_bit(words: jax.Array, pos: jax.Array) -> jax.Array:
    onehot, bit_val = _word_select(words.shape[-1], jnp.asarray(pos))
    return words | jnp.where(onehot, bit_val, jnp.uint32(0))


def clear_bit(words: jax.Array, pos: jax.Array) -> jax.Array:
    onehot, bit_val = _word_select(words.shape[-1], jnp.asarray(pos))
    return words & ~jnp.where(onehot, bit_val, jnp.uint32(0))


# ---------------------------------------------------------------------------
# popcounts and parity (reference: FRIES/math_utils.c:9-98)
# ---------------------------------------------------------------------------

def popcount(words: jax.Array) -> jax.Array:
    """Total number of set bits per determinant ``(...,)`` as int32."""
    return jnp.sum(lax.population_count(words).astype(jnp.int32), axis=-1)


def bits_below(words: jax.Array, pos: jax.Array) -> jax.Array:
    """Count set bits at positions strictly below ``pos`` (int32)."""
    pos = jnp.asarray(pos)
    w = words.shape[-1]
    word_idx = (pos // WORD_BITS).astype(jnp.int32)[..., None]
    bit_idx = (pos % WORD_BITS).astype(jnp.uint32)[..., None]
    word_range = jnp.arange(w, dtype=jnp.int32)
    full = word_range < word_idx
    partial = word_range == word_idx
    partial_mask = (jnp.uint32(1) << bit_idx) - jnp.uint32(1)
    masked = jnp.where(full, words, jnp.uint32(0)) | jnp.where(
        partial, words & partial_mask, jnp.uint32(0)
    )
    return jnp.sum(lax.population_count(masked).astype(jnp.int32), axis=-1)


def bits_between(words: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Count set bits strictly between positions ``a`` and ``b`` (exclusive).

    Matches the semantics of the reference ``bits_between``
    (FRIES/math_utils.c:9-58), used for fermionic permutation parity.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    return bits_below(words, hi) - bits_below(words, lo + 1)


def excite_sign(words: jax.Array, cre: jax.Array, des: jax.Array) -> jax.Array:
    """Fermionic sign (+/-1, int32) for moving one electron ``des -> cre``.

    The determinant must already have ``des`` cleared (and ``cre`` not yet set),
    exactly as in the reference ``excite_sign`` (FRIES/fci_utils.c:130-136).
    """
    n_perm = bits_between(words, cre, des)
    return jnp.where(n_perm % 2 == 0, jnp.int32(1), jnp.int32(-1))


def single_parity(words: jax.Array, occ: jax.Array, virt: jax.Array):
    """Apply a single excitation occ->virt; return (new_words, sign).

    Mirrors ``sing_det_parity`` (FRIES/fci_utils.c:46-51).
    """
    cleared = clear_bit(words, occ)
    sign = excite_sign(cleared, virt, occ)
    return set_bit(cleared, virt), sign


def double_parity(words, occ1, occ2, virt1, virt2):
    """Apply a double excitation (occ1,occ2)->(virt1,virt2); return (new, sign).

    Mirrors ``doub_det_parity`` (FRIES/fci_utils.c:66-74): both occupieds are
    cleared first, then each leg's sign is computed before the virtuals are set.
    """
    cleared = clear_bit(clear_bit(words, occ1), occ2)
    sign = excite_sign(cleared, virt1, occ1) * excite_sign(cleared, virt2, occ2)
    return set_bit(set_bit(cleared, virt1), virt2), sign


# ---------------------------------------------------------------------------
# occupied-orbital lists
# ---------------------------------------------------------------------------

def occ_list_from_bits(bits: jax.Array, n_elec: int) -> jax.Array:
    """Positions of set bits in ascending order: ``(..., n_bits) -> (..., n_elec)``.

    Replaces the SSE ``find_bits`` byte-LUT decoder (FRIES/math_utils.c:62-98)
    with a masked-rank scatter.  If a determinant has more than ``n_elec`` set
    bits the extras are dropped; fewer leaves trailing slots at ``n_bits``
    (an out-of-range marker).
    """
    n_bits = bits.shape[-1]
    positions = jnp.broadcast_to(
        jnp.arange(n_bits, dtype=jnp.int32), bits.shape
    )
    return kernels.rank_place(positions, bits, n_elec, jnp.int32(n_bits))


def occ_list(words: jax.Array, n_bits: int, n_elec: int) -> jax.Array:
    """Occupied-orbital list straight from packed words."""
    return occ_list_from_bits(unpack_bits(words, n_bits), n_elec)


# ---------------------------------------------------------------------------
# reference determinants
# ---------------------------------------------------------------------------

def hf_bits(n_orb: int, n_elec: int, n_bits: int | None = None) -> jax.Array:
    """Hartree-Fock occupancy bits: lowest n_elec/2 orbitals of each spin.

    Mirrors ``gen_hf_bitstring`` (FRIES/fci_utils.c:10-43).
    """
    if n_bits is None:
        n_bits = 2 * n_orb
    orbs = np.arange(n_bits)
    occ = (orbs < n_elec // 2) | ((orbs >= n_orb) & (orbs < n_orb + n_elec // 2))
    return jnp.asarray(occ, dtype=jnp.bool_)


def hf_det(n_orb: int, n_elec: int, n_bits: int | None = None) -> jax.Array:
    return pack_bits(hf_bits(n_orb, n_elec, n_bits))


def neel_bits_1d(n_sites: int, n_elec: int, n_bits: int | None = None) -> jax.Array:
    """1-D Neel state: alternating up/down spins starting with up at site 0.

    Mirrors ``gen_neel_det_1D`` (FRIES/Hamiltonians/hub_holstein.cpp:139-171);
    all phonon bits are zero.
    """
    if n_bits is None:
        n_bits = 2 * n_sites
    sites = np.arange(n_sites)
    up = (sites % 2 == 0) & (sites < n_elec + (n_elec % 2 == 1))
    up &= np.cumsum(sites % 2 == 0) <= (n_elec + 1) // 2
    down = (sites % 2 == 1)
    down &= np.cumsum(sites % 2 == 1) <= n_elec // 2
    occ = np.zeros(n_bits, dtype=bool)
    occ[:n_sites] = up
    occ[n_sites : 2 * n_sites] = down
    return jnp.asarray(occ)


# ---------------------------------------------------------------------------
# spin flip (time reversal); reference flip_spins FRIES/fci_utils.c:158-201
# ---------------------------------------------------------------------------

def flip_spins_bits(bits: jax.Array, n_orb: int) -> jax.Array:
    """Exchange the alpha (0..n_orb-1) and beta (n_orb..2n_orb-1) blocks."""
    alpha = bits[..., :n_orb]
    beta = bits[..., n_orb : 2 * n_orb]
    rest = bits[..., 2 * n_orb :]
    return jnp.concatenate([beta, alpha, rest], axis=-1)


def flip_spins(words: jax.Array, n_orb: int, n_bits: int) -> jax.Array:
    return pack_bits(flip_spins_bits(unpack_bits(words, n_bits), n_orb), words.shape[-1])


# ---------------------------------------------------------------------------
# comparison / sorting keys
# ---------------------------------------------------------------------------

def invalid_det(num_words: int) -> jax.Array:
    """Sentinel key that sorts after every valid determinant (all ones)."""
    return jnp.full((num_words,), UINT32_MAX, dtype=jnp.uint32)


def is_invalid(words: jax.Array) -> jax.Array:
    """True for sentinel slots.  Valid determinants never have all bits set in
    the most-significant word (orbital count < word capacity)."""
    return words[..., -1] == UINT32_MAX


def det_eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=-1)


def det_less(a: jax.Array, b: jax.Array) -> jax.Array:
    """Lexicographic a < b with word index ascending in significance."""
    lt = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
    decided = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
    for w in range(a.shape[-1] - 1, -1, -1):
        aw = a[..., w]
        bw = b[..., w]
        lt = jnp.where(decided, lt, aw < bw)
        decided = decided | (aw != bw)
    return lt


def sort_key_columns(words: jax.Array) -> list[jax.Array]:
    """Column list for lax.sort, most significant first."""
    return [words[..., w] for w in range(words.shape[-1] - 1, -1, -1)]


PACK_MAX_WORDS = 2


def packable(num_words: int) -> bool:
    """True when determinants of ``num_words`` words fit one int64 sort key."""
    return num_words <= PACK_MAX_WORDS


def pack_key(words: jax.Array) -> jax.Array:
    """Order-preserving scalar int64 key for (..., W<=2) determinants.

    The two uint32 words concatenate to a uint64 whose unsigned order equals
    the multiword lexicographic order; XOR-ing the sign bit maps unsigned
    order onto signed int64 order (the all-ones sentinel becomes int64 max
    among same-width keys).  One-word sorts, searches, and equality compares
    replace the multiword fori_loop machinery wherever 2*n_orb <= 64.
    """
    lo = words[..., 0].astype(jnp.uint64)
    if words.shape[-1] == 2:
        hi = words[..., 1].astype(jnp.uint64)
    else:
        hi = jnp.zeros_like(lo)
    u = (hi << jnp.uint64(32)) | lo
    return lax.bitcast_convert_type(
        u ^ jnp.uint64(0x8000000000000000), jnp.int64
    )


def searchsorted_i64(sorted_keys: jax.Array, queries: jax.Array) -> jax.Array:
    """First index with sorted_keys[i] >= q, on packed int64 keys.

    Large query sets use the single-launch sort-based method (one lax.sort of
    N+Q beats ~21 sequential gather rounds under per-kernel dispatch
    overhead); small sets use the unrolled branchless binary search.
    """
    method = "sort" if queries.size >= 4096 else "scan_unrolled"
    return jnp.searchsorted(
        sorted_keys, queries, side="left", method=method
    ).astype(jnp.int32)


def searchsorted_dets(sorted_words: jax.Array, queries: jax.Array) -> jax.Array:
    """Index of first element in ``sorted_words`` (N, W) >= each query (Q, W).

    Replaces the determinant hash-table lookup (FRIES/det_hash.hpp:60-94)
    against the sorted arena.  Returns int32 indices in [0, N].  Packed-key
    fast path when W <= 2; multiword binary search otherwise.
    """
    if packable(sorted_words.shape[-1]):
        return searchsorted_i64(pack_key(sorted_words), pack_key(queries))
    n = sorted_words.shape[0]
    n_iters = max(1, int(np.ceil(np.log2(n + 1))))
    lo = jnp.zeros(queries.shape[:-1], dtype=jnp.int32)
    hi = jnp.full(queries.shape[:-1], n, dtype=jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mid_words = sorted_words[jnp.clip(mid, 0, n - 1)]
        go_right = det_less(mid_words, queries)  # sorted[mid] < q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, hi = lax.fori_loop(0, n_iters, body, (lo, hi))
    return lo


def lookup_dets(sorted_words: jax.Array, queries: jax.Array):
    """(positions, found) of each query determinant in a sorted arena."""
    pos = searchsorted_dets(sorted_words, queries)
    n = sorted_words.shape[0]
    clipped = jnp.clip(pos, 0, n - 1)
    found = det_eq(sorted_words[clipped], queries) & (pos < n)
    return clipped, found
