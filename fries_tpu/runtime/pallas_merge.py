"""Pallas streaming sorted-merge accumulate kernel (TPU).

Replaces the XLA searchsorted/gather formulation of
:func:`fries_tpu.runtime.arena.accumulate` for the single-value-row case:
one sequential-grid kernel walks the (sorted) arena and the (sorted) spawn
stream with two pointers kept in SMEM, merges/dedups/gates in VMEM tiles,
and appends finished rows to the output at a dynamic offset.  Semantics
match ``arena.accumulate`` (reference two-pass add: FRIES/vec_utils.hpp:
991-1019 + 606-641, initiator rule vec_utils.hpp:631-639).

Mosaic has no 64-bit types, so the host-side wrapper re-encodes:

* determinant keys -> two order-preserving int32 words ``(kh, kl)`` derived
  from the packed int64 sort key (`dets.pack_key`): ``kh`` is the signed
  top word, ``kl`` the sign-flipped bottom word; signed lexicographic
  (kh, kl) order equals determinant order,
* float64 values -> error-free float32 pairs ``(vh, vl)`` with
  ``v = vh + vl`` to ~2^-48 relative; in-kernel sums use Knuth two-sum
  (compensated) arithmetic, so accumulation error is ~1e-14 relative
  (tests compare at 1e-9).

Tile math is all vectorized VPU work: window-cross compare matrices give
merge ranks, one-hot masked select-sums place rows (exact - a single
nonzero per reduction), and log-step shifted segmented scans implement
per-determinant contribution sums with cross-tile carries in SMEM.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fries_tpu import dets

TILE = int(os.environ.get("FRIES_MERGE_TILE", "128"))
                    # merged-stream elements consumed per grid step.
                    # 128 is the largest tile whose (TILE, TILE) merge-rank
                    # temporaries fit the Mosaic VMEM stack (~16 MiB at 128,
                    # scaling ~TILE^2; 512 both exceeds VMEM outright and
                    # pushes Mosaic compile time past 45 min)
STG = TILE + 8      # staging rows (slot 0 reserved for a carry flush)
NCOL = 128          # row width: Mosaic DMA slices need 128-aligned lanes
                    # (cols 0..5 carry data, the rest are dead lanes)

_I32_MAX = np.int32(np.iinfo(np.int32).max)

_TPU_SUPPORTED: bool | None = None


def tpu_supported() -> bool:
    """Can the current backend compile sequential-grid Pallas kernels?

    Probes once with a trivial grid kernel and caches the result.  Grid
    kernels MUST be traced under ``jax.enable_x64(False)`` here: with the
    package's global x64 mode the Pallas lowering emits an i64 grid scalar
    that Mosaic cannot legalize (``func.return (i32, i64)``), which is what
    made the 2026-08 axon AOT helper appear to reject all grid kernels.
    :func:`_merge_call` applies the same scope around the real kernel.
    """
    global _TPU_SUPPORTED
    if _TPU_SUPPORTED is not None:
        return _TPU_SUPPORTED
    if jax.default_backend() != "tpu":
        _TPU_SUPPORTED = False
        return False
    try:
        def _k(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        f = pl.pallas_call(
            _k, grid=(2,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        )

        def g(x):
            with jax.enable_x64(False):
                return f(x)

        jax.jit(g).lower(jnp.zeros((16, 128), jnp.float32)).compile()
        _TPU_SUPPORTED = True
    except Exception:
        _TPU_SUPPORTED = False
    return _TPU_SUPPORTED


# ---------------------------------------------------------------------------
# host-side (XLA) encode / decode helpers
# ---------------------------------------------------------------------------

def split_key(words: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(N, W<=2) uint32 det words -> order-preserving (kh, kl) int32 pair."""
    k = dets.pack_key(words)                      # int64, signed order == det order
    kh = (k >> jnp.int64(32)).astype(jnp.int32)   # arithmetic shift keeps order
    lo_u = (k & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    kl = lax.bitcast_convert_type(lo_u ^ jnp.uint32(0x80000000), jnp.int32)
    return kh, kl


def unsplit_key(kh: jax.Array, kl: jax.Array, n_words: int) -> jax.Array:
    """Inverse of :func:`split_key` -> (N, W) uint32 words."""
    hi_u = lax.bitcast_convert_type(kh, jnp.uint32)
    lo_u = lax.bitcast_convert_type(kl, jnp.uint32) ^ jnp.uint32(0x80000000)
    k = (hi_u.astype(jnp.uint64) << jnp.uint64(32)) | lo_u.astype(jnp.uint64)
    u = lax.bitcast_convert_type(k, jnp.int64)
    u = lax.bitcast_convert_type(u ^ jnp.int64(np.int64(-0x8000000000000000)),
                                 jnp.uint64)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    if n_words == 1:
        return lo[..., None]
    return jnp.stack([lo, hi], axis=-1)


def split_val(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f64 -> (hi, lo) f32 pair, v ~= hi + lo (error ~2^-48 relative)."""
    vh = v.astype(jnp.float32)
    vl = (v - vh.astype(jnp.float64)).astype(jnp.float32)
    return vh, vl


def _f2i(x):
    return lax.bitcast_convert_type(x, jnp.int32)


def _count(x):
    """Exact small-count reduction via f32 (Mosaic's int-reduce proxy path
    emits 64-bit converts under x64; counts here are <= 2*TILE < 2^24)."""
    return jnp.sum(x.astype(jnp.float32)).astype(jnp.int32)


def _count_axis0(x):
    """Per-lane sublane count via f32, keepdims (same rationale)."""
    return jnp.sum(x.astype(jnp.float32), axis=0,
                   keepdims=True).astype(jnp.int32)


def _i2f_host(x):
    return lax.bitcast_convert_type(x, jnp.float32)


# ---------------------------------------------------------------------------
# in-kernel helpers (f32-pair compensated arithmetic, segmented scans)
# ---------------------------------------------------------------------------

def _dd_add(ah, al, bh, bl):
    """Compensated (hi, lo) + (hi, lo) in f32 (Knuth two-sum + renorm)."""
    s = ah + bh
    bb = s - ah
    err = (ah - (s - bb)) + (bh - bb)
    lo = al + bl + err
    hi2 = s + lo
    lo2 = lo - (hi2 - s)
    return hi2, lo2


def _shift_down(x, d, fill):
    """x[p - d] with ``fill`` for p < d, along axis 0 of an (T, 1) vector."""
    t = x.shape[0]
    rolled = jnp.roll(x, d, axis=0)
    idx = lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    return jnp.where(idx >= d, rolled, fill)


def _seg_or_scan(flags, heads):
    """Inclusive segmented OR-scan of int32 bitmask ``flags`` over (T,1).

    ``heads`` marks segment starts (the head's own flags are included in its
    segment's scan).
    """
    t = flags.shape[0]
    f = flags
    h = heads.astype(jnp.int32)
    d = 1
    while d < t:
        pf = _shift_down(f, d, jnp.int32(0))
        ph = _shift_down(h, d, jnp.int32(1))
        f = jnp.where(h > 0, f, f | pf)
        h = h | ph
        d *= 2
    return f


def _prefix_or(x):
    """Inclusive prefix-OR of an int32 (T, 1) vector."""
    t = x.shape[0]
    d = 1
    while d < t:
        x = x | _shift_down(x, d, jnp.int32(0))
        d *= 2
    return x


def _seg_sum_scan(vh, vl, heads):
    """Inclusive segmented compensated sum-scan of an f32 pair over (T,1)."""
    t = vh.shape[0]
    h = heads.astype(jnp.int32)
    d = 1
    while d < t:
        pvh = _shift_down(vh, d, jnp.float32(0))
        pvl = _shift_down(vl, d, jnp.float32(0))
        ph = _shift_down(h, d, jnp.int32(1))
        blocked = h > 0
        nvh, nvl = _dd_add(vh, vl,
                           jnp.where(blocked, 0.0, pvh),
                           jnp.where(blocked, 0.0, pvl))
        vh = jnp.where(blocked, vh, nvh)
        vl = jnp.where(blocked, vl, nvl)
        h = h | ph
        d *= 2
    return vh, vl


def _cumsum_i32(x):
    """Inclusive cumsum of an int32 (T, 1) vector via log-step shifts."""
    t = x.shape[0]
    d = 1
    while d < t:
        x = x + _shift_down(x, d, jnp.int32(0))
        d *= 2
    return x


# flag bits carried per merged element / per open segment
_F_ARENA = 1   # segment contains an arena row
_F_OCC = 2     # segment's arena row has nonzero (pre-merge) value
_F_INISP = 4   # segment contains an initiator-flagged spawn
_F_SP = 8      # segment contains any valid spawn
_F_PROT = 16   # segment's arena row is compaction-protected


def _seg_alive(f):
    """Does a segment with flag bits ``f`` produce an output row?

    Arena rows survive when occupied OR protected: the host wrapper sets
    the protected column to all-ones in plain-accumulate mode (every arena
    row survives, the classic semantics) and to the driver's keep mask in
    fused-compaction mode (``drop_dead``), where a zero-valued unprotected
    arena row with no surviving spawns is simply not emitted - subsuming
    the separate ``arena.compact`` pass."""
    return (((f & _F_ARENA) > 0) & (((f & _F_OCC) > 0) | ((f & _F_PROT) > 0))) \
        | ((f & _F_INISP) > 0) | (((f & _F_OCC) > 0) & ((f & _F_SP) > 0))


def _seg_alive_i(f):
    """0/1 int form of :func:`_seg_alive` (pure arithmetic - Mosaic's scalar
    bool select lowering recurses, so SMEM-scalar control state stays int32)."""
    a = jnp.minimum(f & _F_ARENA, 1)
    ini = jnp.minimum(f & _F_INISP, 1)
    occ = jnp.minimum(f & _F_OCC, 1)
    sp = jnp.minimum(f & _F_SP, 1)
    prot = jnp.minimum(f & _F_PROT, 1)
    return jnp.minimum(a * jnp.minimum(occ + prot, 1) + ini + occ * sp, 1)


def _kernel(scal, a_ref, b_ref, o_ref, stats_ref,
            awin, bwin, stg, st, ckey, cval, sem_a, sem_b, sem_o):
    """One grid step: consume <= TILE merged elements, emit finished rows.

    scal: SMEM int32[8]: [n_a, n_s, sent_h, sent_l, capacity, 0, 0, 0]
    a_ref: HBM int32 (C + TILE, NCOL): kh, kl, gvh, gvl, dvh, dvl
       (sorted, unique; g = gate/origin row, d = dest row; cols 6+ dead)
    b_ref: HBM int32 (S + TILE, NCOL): kh, kl, vh, vl, ini  (sorted)
    o_ref: HBM int32 (C + STG + 8, NCOL) output rows: kh, kl, gvh, gvl,
       dvh, dvl (g passes through arena rows; d = arena d + gated spawns;
       dead lanes of emitted rows are undefined)
    stats_ref: SMEM int32[8] out: [n_out, overflow, nonini_occ_add, 0...]
    st (SMEM int32[16] scratch): 0 ai, 1 si, 2 oi, 3 carry_valid,
       4 carry_flags (_F_*), 5 nonini_acc
    ckey: SMEM int32[2] carry key
    cval: SMEM f32[4] carry value pairs (gh, gl, dh, dl)
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    n_a = scal[0]
    n_s = scal[1]
    sent_h = scal[2]
    sent_l = scal[3]
    cap = scal[4]

    @pl.when(t == 0)
    def _init():
        for i in range(6):
            st[i] = 0
        ckey[0] = _I32_MAX
        ckey[1] = _I32_MAX
        for i in range(4):
            cval[i] = 0.0

    ai = st[0]
    si = st[1]
    done = (ai >= n_a) & (si >= n_s)
    is_final = t == n_t - 1

    @pl.when((~done) & (~is_final))
    def _tile():
        # ---- fetch both windows (one DMA each) ----
        cp_a = pltpu.make_async_copy(a_ref.at[pl.ds(ai, TILE)], awin,
                                     sem_a)
        cp_b = pltpu.make_async_copy(b_ref.at[pl.ds(si, TILE)], bwin,
                                     sem_b)
        cp_a.start()
        cp_b.start()
        cp_a.wait()
        cp_b.wait()

        a_kh = awin[:, 0:1]           # (T, 1) sublane vectors
        a_kl = awin[:, 1:2]
        b_kh = bwin[:, 0:1]
        b_kl = bwin[:, 1:2]
        a_kh_l = a_kh.reshape(1, TILE)   # lane orientation
        a_kl_l = a_kl.reshape(1, TILE)
        b_kh_l = b_kh.reshape(1, TILE)
        b_kl_l = b_kl.reshape(1, TILE)

        # ---- merge ranks from two cross-compare matrices ----
        # M1[j, i] = B[j] < A[i]  (B sublane, A lane): A wins ties.
        m1 = (b_kh < a_kh_l) | ((b_kh == a_kh_l) & (b_kl < a_kl_l))
        pos_a = (lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
                 + _count_axis0(m1))
        # M2[i, j] = A[i] <= B[j]  (A sublane, B lane)
        m2 = (a_kh < b_kh_l) | ((a_kh == b_kh_l) & (a_kl <= b_kl_l))
        pos_b = (lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
                 + _count_axis0(m2))

        a_sent = (a_kh_l == sent_h) & (a_kl_l == sent_l)
        b_sent = (b_kh_l == sent_h) & (b_kl_l == sent_l)
        take_a = (pos_a < TILE) & (~a_sent)      # (1, T)
        take_b = (pos_b < TILE) & (~b_sent)
        n_cons_a = _count(take_a)
        n_cons_b = _count(take_b)

        # ---- place consumed rows into merged order (one-hot select-sum) ----
        p_out = lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
        mask_a = (pos_a == p_out) & take_a       # (T_out, T_in)
        mask_b = (pos_b == p_out) & take_b

        def place(mask, col_lane, zero):
            return jnp.sum(jnp.where(mask, col_lane, zero), axis=1,
                           keepdims=True, dtype=col_lane.dtype)

        iz = jnp.int32(0)
        from_a = place(mask_a, jnp.ones((1, TILE), jnp.int32), iz) > 0
        from_b = place(mask_b, jnp.ones((1, TILE), jnp.int32), iz) > 0
        filled = from_a | from_b
        mk_h = place(mask_a, a_kh_l, iz) + place(mask_b, b_kh_l, iz)
        mk_l = place(mask_a, a_kl_l, iz) + place(mask_b, b_kl_l, iz)
        mk_h = jnp.where(filled, mk_h, sent_h)
        mk_l = jnp.where(filled, mk_l, sent_l)
        a_gh_l = awin[:, 2:3].reshape(1, TILE)
        a_gl_l = awin[:, 3:4].reshape(1, TILE)
        a_dh_l = awin[:, 4:5].reshape(1, TILE)
        a_dl_l = awin[:, 5:6].reshape(1, TILE)
        b_vh_l = bwin[:, 2:3].reshape(1, TILE)
        b_vl_l = bwin[:, 3:4].reshape(1, TILE)
        # gate (origin-row) values: arena rows only, pass through
        mg_h = lax.bitcast_convert_type(place(mask_a, a_gh_l, iz), jnp.float32)
        mg_l = lax.bitcast_convert_type(place(mask_a, a_gl_l, iz), jnp.float32)
        # dest-row values: arena base + spawn contributions
        md_h = lax.bitcast_convert_type(
            place(mask_a, a_dh_l, iz) + place(mask_b, b_vh_l, iz),
            jnp.float32)
        md_l = lax.bitcast_convert_type(
            place(mask_a, a_dl_l, iz) + place(mask_b, b_vl_l, iz),
            jnp.float32)
        m_ini = place(mask_b, bwin[:, 4:5].reshape(1, TILE), iz) > 0

        # ---- segment machinery over the merged tile ----
        # ckey holds the sentinel when no segment is open, so the p=0
        # comparison naturally yields a boundary there.
        pk_h = _shift_down(mk_h, 1, ckey[0])
        pk_l = _shift_down(mk_l, 1, ckey[1])
        cv_ok = st[3] > 0
        # boundary on any key change (sentinel keys differ from real keys, so
        # the last real segment of a partially-filled tile still closes)
        first = (mk_h != pk_h) | (mk_l != pk_l)

        is_arena = from_a
        is_spawn = from_b
        arena_nz = is_arena & ((mg_h != 0.0) | (mg_l != 0.0))
        m_prot = place(mask_a, awin[:, 6:7].reshape(1, TILE), iz) > 0
        flags_src = (is_arena.astype(jnp.int32) * _F_ARENA
                     | arena_nz.astype(jnp.int32) * _F_OCC
                     | (is_spawn & m_ini).astype(jnp.int32) * _F_INISP
                     | is_spawn.astype(jnp.int32) * _F_SP
                     | (is_arena & m_prot).astype(jnp.int32) * _F_PROT)
        fscan = _seg_or_scan(flags_src, first)
        # inject the open-segment carry into positions before any boundary
        cont = (_prefix_or(first.astype(jnp.int32)) == 0) & filled
        inject = cont & cv_ok
        fscan = jnp.where(inject, fscan | st[4], fscan)

        occ = (fscan & _F_OCC) > 0
        allowed_sp = is_spawn & (m_ini | occ)
        contributes = allowed_sp | is_arena
        nonini_new = _count(is_spawn & (~m_ini) & occ)

        add_h = jnp.where(contributes, md_h, 0.0)
        add_l = jnp.where(contributes, md_l, 0.0)
        sv_h, sv_l = _seg_sum_scan(add_h, add_l, first)
        cc_h, cc_l = _dd_add(sv_h, sv_l, cval[2], cval[3])
        sv_h = jnp.where(inject, cc_h, sv_h)
        sv_l = jnp.where(inject, cc_l, sv_l)
        # gate-row pass-through: at most one (arena) contributor per segment,
        # so the same segmented sum reproduces the origin-row value exactly
        gv_h, gv_l = _seg_sum_scan(mg_h, mg_l, first)
        cg_h, cg_l = _dd_add(gv_h, gv_l, cval[0], cval[1])
        gv_h = jnp.where(inject, cg_h, gv_h)
        gv_l = jnp.where(inject, cg_l, gv_l)

        # ---- emit completed segments ----
        # is_last[p] = next position starts a new segment; the very last
        # merged slot stays open and is carried instead.
        nxt_i = jnp.roll(first.astype(jnp.int32), -1, axis=0)
        idx = lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
        # NB: the untyped-0 form jnp.where(c, 0, nxt_i) traces an i64
        # constant under x64 and Mosaic's i64->i32 convert recurses
        is_last = (jnp.where(idx == TILE - 1, jnp.int32(0), nxt_i) > 0) & filled
        emit = is_last & _seg_alive(fscan)
        # carry flush: previous open segment ended exactly at the tile edge
        first0_i = first.astype(jnp.int32)[0, 0]
        flush_i = st[3] * first0_i * _seg_alive_i(st[4])
        flush = flush_i > 0
        base = flush_i
        rank = _cumsum_i32(emit.astype(jnp.int32)) - 1 + base
        n_emit = rank[TILE - 1, 0] + 1

        # place emitted rows into staging (slot 0 = optional carry flush)
        s_out = lax.broadcasted_iota(jnp.int32, (STG, 1), 0)
        rank_l = rank.reshape(1, TILE)
        emit_l = emit.reshape(1, TILE)
        mask_e = (rank_l == s_out) & emit_l       # (STG, T)

        def eplace(col, zero):
            return jnp.sum(jnp.where(mask_e, col.reshape(1, TILE), zero),
                           axis=1, keepdims=True, dtype=col.dtype)

        e_kh = eplace(mk_h, iz)
        e_kl = eplace(mk_l, iz)
        e_gh = eplace(_f2i_k(gv_h), iz)
        e_gl = eplace(_f2i_k(gv_l), iz)
        e_vh = eplace(_f2i_k(sv_h), iz)
        e_vl = eplace(_f2i_k(sv_l), iz)
        in_carry = s_out == 0
        use_c = in_carry & flush
        efill = (eplace(jnp.ones((TILE, 1), jnp.int32), iz) > 0) | use_c
        e_kh = jnp.where(use_c, ckey[0], e_kh)
        e_kl = jnp.where(use_c, ckey[1], e_kl)
        e_gh = jnp.where(use_c, _f2i_k(jnp.full((STG, 1), cval[0])), e_gh)
        e_gl = jnp.where(use_c, _f2i_k(jnp.full((STG, 1), cval[1])), e_gl)
        e_vh = jnp.where(use_c, _f2i_k(jnp.full((STG, 1), cval[2])), e_vh)
        e_vl = jnp.where(use_c, _f2i_k(jnp.full((STG, 1), cval[3])), e_vl)
        e_kh = jnp.where(efill, e_kh, sent_h)
        e_kl = jnp.where(efill, e_kl, sent_l)
        stg[:, 0:1] = e_kh
        stg[:, 1:2] = e_kl
        stg[:, 2:3] = e_gh
        stg[:, 3:4] = e_gl
        stg[:, 4:5] = e_vh
        stg[:, 5:6] = e_vl

        oi = st[2]
        ok = oi <= cap
        @pl.when(ok)
        def _write():
            cp_o = pltpu.make_async_copy(stg, o_ref.at[pl.ds(oi, STG)],
                                         sem_o)
            cp_o.start()
            cp_o.wait()

        # ---- update SMEM state (scalar selects via 0/1 arithmetic) ----
        st[0] = ai + n_cons_a
        st[1] = si + n_cons_b
        st[2] = oi + n_emit
        # new carry = open (last) segment's inclusive state at TILE-1;
        # int 0/1 form computed in vector-land then scalarized
        open_vec = jnp.where(
            (mk_h == sent_h) & (mk_l == sent_l), jnp.int32(0), jnp.int32(1)
        )
        lo = open_vec[TILE - 1, 0]
        lo_f = lo.astype(jnp.float32)
        st[3] = lo
        st[4] = lo * fscan[TILE - 1, 0]
        st[5] = st[5] + nonini_new
        ckey[0] = lo * mk_h[TILE - 1, 0] + (1 - lo) * _I32_MAX
        ckey[1] = lo * mk_l[TILE - 1, 0] + (1 - lo) * _I32_MAX
        cval[0] = lo_f * gv_h[TILE - 1, 0]
        cval[1] = lo_f * gv_l[TILE - 1, 0]
        cval[2] = lo_f * sv_h[TILE - 1, 0]
        cval[3] = lo_f * sv_l[TILE - 1, 0]

    @pl.when(is_final)
    def _flush():
        oi = st[2]
        flush = (st[3] > 0) & _seg_alive(st[4])

        @pl.when(flush)
        def _do_flush():
            kh0 = ckey[0]
            kl0 = ckey[1]
            s_out = lax.broadcasted_iota(jnp.int32, (STG, 1), 0)
            row0 = s_out == 0
            stg[:, 0:1] = jnp.where(row0, kh0, _I32_MAX)
            stg[:, 1:2] = jnp.where(row0, kl0, _I32_MAX)
            for col in range(4):
                stg[:, 2 + col : 3 + col] = jnp.where(
                    row0, _f2i_k(jnp.full((STG, 1), cval[col])), jnp.int32(0))

            @pl.when(oi <= cap)
            def _w():
                cp_o = pltpu.make_async_copy(stg, o_ref.at[pl.ds(oi, STG)],
                                             sem_o)
                cp_o.start()
                cp_o.wait()
            st[2] = oi + 1

        stats_ref[0] = st[2]
        stats_ref[1] = jnp.minimum(jnp.maximum(st[2] - cap, 0), 1)
        stats_ref[2] = st[5]
        for i in range(3, 8):
            stats_ref[i] = 0


def _f2i_k(x):
    return lax.bitcast_convert_type(x, jnp.int32)


# ---------------------------------------------------------------------------
# v2 kernel: lane-oriented per-element state
#
# The v1 kernel keeps every per-element vector in (TILE, 1) sublane
# orientation: one vreg lane out of 128 does work, and every log-step scan
# shift is a sublane shuffle.  On-device microbenchmarks (2026-08-17) put
# the v1 tile math at 22 us/step vs 2.5 us/step for its DMA - wholly
# compute-bound on layout waste.  v2 keeps the same algorithm with all
# per-element state in (1, TILE) lane orientation (one vreg per vector,
# lane-axis rolls), computes the two cross-compare matrices directly in
# the orientation each consumer needs (no mask transposes), and sources
# placement reductions from sublane-sliced window columns.
# ---------------------------------------------------------------------------

def _shift_right_lane(x, d, fill):
    """x[0, p - d] with ``fill`` for p < d, along the lanes of (1, T)."""
    t = x.shape[1]
    rolled = jnp.roll(x, d, axis=1)
    idx = lax.broadcasted_iota(jnp.int32, (1, t), 1)
    return jnp.where(idx >= d, rolled, fill)


def _seg_or_scan_lane(flags, heads):
    """Inclusive segmented OR-scan of int32 flags over (1, T) lanes."""
    t = flags.shape[1]
    f = flags
    h = heads.astype(jnp.int32)
    d = 1
    while d < t:
        pf = _shift_right_lane(f, d, jnp.int32(0))
        ph = _shift_right_lane(h, d, jnp.int32(1))
        f = jnp.where(h > 0, f, f | pf)
        h = h | ph
        d *= 2
    return f


def _prefix_or_lane(x):
    t = x.shape[1]
    d = 1
    while d < t:
        x = x | _shift_right_lane(x, d, jnp.int32(0))
        d *= 2
    return x


def _seg_sum_scan_lane(vh, vl, heads):
    """Inclusive segmented compensated f32-pair sum-scan over (1, T)."""
    t = vh.shape[1]
    h = heads.astype(jnp.int32)
    d = 1
    while d < t:
        pvh = _shift_right_lane(vh, d, jnp.float32(0))
        pvl = _shift_right_lane(vl, d, jnp.float32(0))
        ph = _shift_right_lane(h, d, jnp.int32(1))
        blocked = h > 0
        nvh, nvl = _dd_add(vh, vl,
                           jnp.where(blocked, 0.0, pvh),
                           jnp.where(blocked, 0.0, pvl))
        vh = jnp.where(blocked, vh, nvh)
        vl = jnp.where(blocked, vl, nvl)
        h = h | ph
        d *= 2
    return vh, vl


def _cumsum_i32_lane(x):
    t = x.shape[1]
    d = 1
    while d < t:
        x = x + _shift_right_lane(x, d, jnp.int32(0))
        d *= 2
    return x


def _count_axis1(x):
    """Per-sublane lane count via f32, keepdims (see :func:`_count`)."""
    return jnp.sum(x.astype(jnp.float32), axis=1,
                   keepdims=True).astype(jnp.int32)


def _kernel_v2(scal, a_ref, b_ref, o_ref, stats_ref,
               awin, bwin, stg, st, ckey, cval, sem_a, sem_b, sem_o):
    """Same contract as :func:`_kernel`; lane-oriented tile math."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    n_a = scal[0]
    n_s = scal[1]
    sent_h = scal[2]
    sent_l = scal[3]
    cap = scal[4]

    @pl.when(t == 0)
    def _init():
        for i in range(6):
            st[i] = 0
        ckey[0] = _I32_MAX
        ckey[1] = _I32_MAX
        for i in range(4):
            cval[i] = 0.0

    ai = st[0]
    si = st[1]
    done = (ai >= n_a) & (si >= n_s)
    is_final = t == n_t - 1

    @pl.when((~done) & (~is_final))
    def _tile():
        cp_a = pltpu.make_async_copy(a_ref.at[pl.ds(ai, TILE)], awin, sem_a)
        cp_b = pltpu.make_async_copy(b_ref.at[pl.ds(si, TILE)], bwin, sem_b)
        cp_a.start()
        cp_b.start()
        cp_a.wait()
        cp_b.wait()

        # sublane-oriented window columns (direct slices) ...
        a_kh_s = awin[:, 0:1]
        a_kl_s = awin[:, 1:2]
        b_kh_s = bwin[:, 0:1]
        b_kl_s = bwin[:, 1:2]
        # ... and the four lane-oriented key relayouts the cross-compares need
        a_kh_l = a_kh_s.reshape(1, TILE)
        a_kl_l = a_kl_s.reshape(1, TILE)
        b_kh_l = b_kh_s.reshape(1, TILE)
        b_kl_l = b_kl_s.reshape(1, TILE)

        # cross-compare matrices, one per orientation (no transposes):
        # m_ab[j, i] = B[j] <  A[i]  (B sublane, A lane; A wins ties)
        # m_ba[i, j] = A[i] <= B[j]  (A sublane, B lane); note ~m_ba = B < A
        m_ab = (b_kh_s < a_kh_l) | ((b_kh_s == a_kh_l) & (b_kl_s < a_kl_l))
        m_ba = (a_kh_s < b_kh_l) | ((a_kh_s == b_kh_l) & (a_kl_s <= b_kl_l))

        iota_l = lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        iota_s = lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
        pos_a_l = iota_l + _count_axis0(m_ab)     # (1, T): rank of A[i]
        pos_a_s = iota_s + _count_axis1(~m_ba)    # (T, 1): same, sublanes
        pos_b_l = iota_l + _count_axis0(m_ba)     # (1, T): rank of B[j]
        pos_b_s = iota_s + _count_axis1(~m_ab)    # (T, 1)

        a_sent_l = (a_kh_l == sent_h) & (a_kl_l == sent_l)
        b_sent_l = (b_kh_l == sent_h) & (b_kl_l == sent_l)
        a_sent_s = (a_kh_s == sent_h) & (a_kl_s == sent_l)
        b_sent_s = (b_kh_s == sent_h) & (b_kl_s == sent_l)
        take_a_l = (pos_a_l < TILE) & (~a_sent_l)
        take_b_l = (pos_b_l < TILE) & (~b_sent_l)
        take_a_s = (pos_a_s < TILE) & (~a_sent_s)
        take_b_s = (pos_b_s < TILE) & (~b_sent_s)
        n_cons_a = _count(take_a_l)
        n_cons_b = _count(take_b_l)

        # placement masks: source element on sublanes, merged slot on lanes
        mask_a = (pos_a_s == iota_l) & take_a_s   # (T_src, T_dst)
        mask_b = (pos_b_s == iota_l) & take_b_s

        def place(mask, col_s, zero):
            """(T, 1) source column -> (1, T) merged-order lane vector."""
            return jnp.sum(jnp.where(mask, col_s, zero), axis=0,
                           keepdims=True, dtype=col_s.dtype)

        iz = jnp.int32(0)
        ones_s = jnp.ones((TILE, 1), jnp.int32)
        from_a = place(mask_a, ones_s, iz) > 0
        from_b = place(mask_b, ones_s, iz) > 0
        filled = from_a | from_b
        mk_h = place(mask_a, a_kh_s, iz) + place(mask_b, b_kh_s, iz)
        mk_l = place(mask_a, a_kl_s, iz) + place(mask_b, b_kl_s, iz)
        mk_h = jnp.where(filled, mk_h, sent_h)
        mk_l = jnp.where(filled, mk_l, sent_l)
        # gate (origin-row) values: arena rows only, pass through
        mg_h = lax.bitcast_convert_type(place(mask_a, awin[:, 2:3], iz),
                                        jnp.float32)
        mg_l = lax.bitcast_convert_type(place(mask_a, awin[:, 3:4], iz),
                                        jnp.float32)
        # dest-row values: arena base + spawn contributions
        md_h = lax.bitcast_convert_type(
            place(mask_a, awin[:, 4:5], iz) + place(mask_b, bwin[:, 2:3], iz),
            jnp.float32)
        md_l = lax.bitcast_convert_type(
            place(mask_a, awin[:, 5:6], iz) + place(mask_b, bwin[:, 3:4], iz),
            jnp.float32)
        m_ini = place(mask_b, bwin[:, 4:5], iz) > 0

        # ---- segment machinery over the merged tile (lane axis) ----
        pk_h = _shift_right_lane(mk_h, 1, ckey[0])
        pk_l = _shift_right_lane(mk_l, 1, ckey[1])
        cv_ok = st[3] > 0
        first = (mk_h != pk_h) | (mk_l != pk_l)

        is_arena = from_a
        is_spawn = from_b
        arena_nz = is_arena & ((mg_h != 0.0) | (mg_l != 0.0))
        m_prot = place(mask_a, awin[:, 6:7], iz) > 0
        flags_src = (is_arena.astype(jnp.int32) * _F_ARENA
                     | arena_nz.astype(jnp.int32) * _F_OCC
                     | (is_spawn & m_ini).astype(jnp.int32) * _F_INISP
                     | is_spawn.astype(jnp.int32) * _F_SP
                     | (is_arena & m_prot).astype(jnp.int32) * _F_PROT)
        fscan = _seg_or_scan_lane(flags_src, first)
        cont = (_prefix_or_lane(first.astype(jnp.int32)) == 0) & filled
        inject = cont & cv_ok
        fscan = jnp.where(inject, fscan | st[4], fscan)

        occ = (fscan & _F_OCC) > 0
        allowed_sp = is_spawn & (m_ini | occ)
        contributes = allowed_sp | is_arena
        nonini_new = _count(is_spawn & (~m_ini) & occ)

        add_h = jnp.where(contributes, md_h, 0.0)
        add_l = jnp.where(contributes, md_l, 0.0)
        sv_h, sv_l = _seg_sum_scan_lane(add_h, add_l, first)
        cc_h, cc_l = _dd_add(sv_h, sv_l, cval[2], cval[3])
        sv_h = jnp.where(inject, cc_h, sv_h)
        sv_l = jnp.where(inject, cc_l, sv_l)
        gv_h, gv_l = _seg_sum_scan_lane(mg_h, mg_l, first)
        cg_h, cg_l = _dd_add(gv_h, gv_l, cval[0], cval[1])
        gv_h = jnp.where(inject, cg_h, gv_h)
        gv_l = jnp.where(inject, cg_l, gv_l)

        # ---- emit completed segments ----
        nxt_i = jnp.roll(first.astype(jnp.int32), -1, axis=1)
        is_last = (jnp.where(iota_l == TILE - 1, jnp.int32(0), nxt_i) > 0) \
            & filled
        emit = is_last & _seg_alive(fscan)
        first0_i = first.astype(jnp.int32)[0, 0]
        flush_i = st[3] * first0_i * _seg_alive_i(st[4])
        flush = flush_i > 0
        base = flush_i
        rank = _cumsum_i32_lane(emit.astype(jnp.int32)) - 1 + base
        n_emit = rank[0, TILE - 1] + 1

        # staging placement: merged slot on lanes, output row on sublanes
        s_out = lax.broadcasted_iota(jnp.int32, (STG, 1), 0)
        mask_e = (rank == s_out) & emit           # (STG, T)

        def eplace(col_l, zero):
            """(1, T) lane vector -> (STG, 1) staging column."""
            return jnp.sum(jnp.where(mask_e, col_l, zero), axis=1,
                           keepdims=True, dtype=col_l.dtype)

        e_kh = eplace(mk_h, iz)
        e_kl = eplace(mk_l, iz)
        e_gh = eplace(_f2i_k(gv_h), iz)
        e_gl = eplace(_f2i_k(gv_l), iz)
        e_vh = eplace(_f2i_k(sv_h), iz)
        e_vl = eplace(_f2i_k(sv_l), iz)
        in_carry = s_out == 0
        use_c = in_carry & flush
        efill = (eplace(jnp.ones((1, TILE), jnp.int32), iz) > 0) | use_c
        e_kh = jnp.where(use_c, ckey[0], e_kh)
        e_kl = jnp.where(use_c, ckey[1], e_kl)
        e_gh = jnp.where(use_c, _f2i_k(jnp.full((STG, 1), cval[0])), e_gh)
        e_gl = jnp.where(use_c, _f2i_k(jnp.full((STG, 1), cval[1])), e_gl)
        e_vh = jnp.where(use_c, _f2i_k(jnp.full((STG, 1), cval[2])), e_vh)
        e_vl = jnp.where(use_c, _f2i_k(jnp.full((STG, 1), cval[3])), e_vl)
        e_kh = jnp.where(efill, e_kh, sent_h)
        e_kl = jnp.where(efill, e_kl, sent_l)
        stg[:, 0:1] = e_kh
        stg[:, 1:2] = e_kl
        stg[:, 2:3] = e_gh
        stg[:, 3:4] = e_gl
        stg[:, 4:5] = e_vh
        stg[:, 5:6] = e_vl

        oi = st[2]
        ok = oi <= cap

        @pl.when(ok)
        def _write():
            cp_o = pltpu.make_async_copy(stg, o_ref.at[pl.ds(oi, STG)],
                                         sem_o)
            cp_o.start()
            cp_o.wait()

        # ---- update SMEM state ----
        st[0] = ai + n_cons_a
        st[1] = si + n_cons_b
        st[2] = oi + n_emit
        open_vec = jnp.where(
            (mk_h == sent_h) & (mk_l == sent_l), jnp.int32(0), jnp.int32(1)
        )
        lo = open_vec[0, TILE - 1]
        lo_f = lo.astype(jnp.float32)
        st[3] = lo
        st[4] = lo * fscan[0, TILE - 1]
        st[5] = st[5] + nonini_new
        ckey[0] = lo * mk_h[0, TILE - 1] + (1 - lo) * _I32_MAX
        ckey[1] = lo * mk_l[0, TILE - 1] + (1 - lo) * _I32_MAX
        cval[0] = lo_f * gv_h[0, TILE - 1]
        cval[1] = lo_f * gv_l[0, TILE - 1]
        cval[2] = lo_f * sv_h[0, TILE - 1]
        cval[3] = lo_f * sv_l[0, TILE - 1]

    @pl.when(is_final)
    def _flush():
        oi = st[2]
        flush = (st[3] > 0) & _seg_alive(st[4])

        @pl.when(flush)
        def _do_flush():
            kh0 = ckey[0]
            kl0 = ckey[1]
            s_out = lax.broadcasted_iota(jnp.int32, (STG, 1), 0)
            row0 = s_out == 0
            stg[:, 0:1] = jnp.where(row0, kh0, _I32_MAX)
            stg[:, 1:2] = jnp.where(row0, kl0, _I32_MAX)
            for col in range(4):
                stg[:, 2 + col : 3 + col] = jnp.where(
                    row0, _f2i_k(jnp.full((STG, 1), cval[col])), jnp.int32(0))

            @pl.when(oi <= cap)
            def _w():
                cp_o = pltpu.make_async_copy(stg, o_ref.at[pl.ds(oi, STG)],
                                             sem_o)
                cp_o.start()
                cp_o.wait()
            st[2] = oi + 1

        stats_ref[0] = st[2]
        stats_ref[1] = jnp.minimum(jnp.maximum(st[2] - cap, 0), 1)
        stats_ref[2] = st[5]
        for i in range(3, 8):
            stats_ref[i] = 0


# kernel selection: v2 (lane-oriented) unless FRIES_MERGE_KERNEL=v1
_KERNEL = _kernel if os.environ.get("FRIES_MERGE_KERNEL") == "v1" else _kernel_v2


# ---------------------------------------------------------------------------
# multi-row kernel: per-spawn destination rows (subspace drivers)
#
# Generalizes the v2 lane-oriented kernel to R arena value rows where each
# spawn carries the row it contributes to and the initiator rule checks
# occupancy against that same row (arena.accumulate_multi semantics,
# reference subsp_mol.cpp:546-600).  Flag-bit layout per open segment:
# bit 0 arena-row present, bit 1 any initiator spawn, bits 2..2+R-1 arena
# row-i occupancy, bits 2+R..2+2R-1 any spawn targeting row i - so a
# segment is alive iff arena | ini-spawn | any_i(occ_i & spawn_i), and a
# non-initiator spawn's contribution is gated by its own row's occupancy
# bit (visible in the inclusive OR-scan: arena rows sort first in the
# merge, A winning ties).  R <= 14 keeps the bit field in int32.
# ---------------------------------------------------------------------------

def _seg_alive_multi(f, r):
    alive = ((f & 1) > 0) | ((f & 2) > 0)
    for i in range(r):
        alive |= ((f & (4 << i)) > 0) & ((f & (4 << (r + i))) > 0)
    return alive


def _seg_alive_multi_i(f, r):
    """0/1 int form (scalar SMEM control; see :func:`_seg_alive_i`)."""
    a = jnp.minimum(f & 1, 1) + jnp.minimum(f & 2, 1)
    for i in range(r):
        a += jnp.minimum(f & (4 << i), 1) * jnp.minimum(f & (4 << (r + i)), 1)
    return jnp.minimum(a, 1)


def _make_kernel_multi(r):
    """Build the R-row merge kernel (R static).

    Stream layouts: a_ref rows kh, kl, (vh_i, vl_i) x R;
    b_ref rows kh, kl, vh, vl, ini, row_id;  o_ref rows like a_ref.
    cval SMEM holds 2R carry words.
    """

    def kernel(scal, a_ref, b_ref, o_ref, stats_ref,
               awin, bwin, stg, st, ckey, cval, sem_a, sem_b, sem_o):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)
        n_a = scal[0]
        n_s = scal[1]
        sent_h = scal[2]
        sent_l = scal[3]
        cap = scal[4]

        @pl.when(t == 0)
        def _init():
            for i in range(6):
                st[i] = 0
            ckey[0] = _I32_MAX
            ckey[1] = _I32_MAX
            for i in range(2 * r):
                cval[i] = 0.0

        ai = st[0]
        si = st[1]
        done = (ai >= n_a) & (si >= n_s)
        is_final = t == n_t - 1

        @pl.when((~done) & (~is_final))
        def _tile():
            cp_a = pltpu.make_async_copy(a_ref.at[pl.ds(ai, TILE)], awin,
                                         sem_a)
            cp_b = pltpu.make_async_copy(b_ref.at[pl.ds(si, TILE)], bwin,
                                         sem_b)
            cp_a.start()
            cp_b.start()
            cp_a.wait()
            cp_b.wait()

            a_kh_s = awin[:, 0:1]
            a_kl_s = awin[:, 1:2]
            b_kh_s = bwin[:, 0:1]
            b_kl_s = bwin[:, 1:2]
            a_kh_l = a_kh_s.reshape(1, TILE)
            a_kl_l = a_kl_s.reshape(1, TILE)
            b_kh_l = b_kh_s.reshape(1, TILE)
            b_kl_l = b_kl_s.reshape(1, TILE)

            m_ab = (b_kh_s < a_kh_l) | ((b_kh_s == a_kh_l) & (b_kl_s < a_kl_l))
            m_ba = (a_kh_s < b_kh_l) | ((a_kh_s == b_kh_l) & (a_kl_s <= b_kl_l))

            iota_l = lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
            iota_s = lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
            pos_a_l = iota_l + _count_axis0(m_ab)
            pos_a_s = iota_s + _count_axis1(~m_ba)
            pos_b_l = iota_l + _count_axis0(m_ba)
            pos_b_s = iota_s + _count_axis1(~m_ab)

            a_sent_l = (a_kh_l == sent_h) & (a_kl_l == sent_l)
            b_sent_l = (b_kh_l == sent_h) & (b_kl_l == sent_l)
            a_sent_s = (a_kh_s == sent_h) & (a_kl_s == sent_l)
            b_sent_s = (b_kh_s == sent_h) & (b_kl_s == sent_l)
            take_a_l = (pos_a_l < TILE) & (~a_sent_l)
            take_b_l = (pos_b_l < TILE) & (~b_sent_l)
            take_a_s = (pos_a_s < TILE) & (~a_sent_s)
            take_b_s = (pos_b_s < TILE) & (~b_sent_s)
            n_cons_a = _count(take_a_l)
            n_cons_b = _count(take_b_l)

            mask_a = (pos_a_s == iota_l) & take_a_s
            mask_b = (pos_b_s == iota_l) & take_b_s

            def place(mask, col_s, zero):
                return jnp.sum(jnp.where(mask, col_s, zero), axis=0,
                               keepdims=True, dtype=col_s.dtype)

            iz = jnp.int32(0)
            ones_s = jnp.ones((TILE, 1), jnp.int32)
            from_a = place(mask_a, ones_s, iz) > 0
            from_b = place(mask_b, ones_s, iz) > 0
            filled = from_a | from_b
            mk_h = place(mask_a, a_kh_s, iz) + place(mask_b, b_kh_s, iz)
            mk_l = place(mask_a, a_kl_s, iz) + place(mask_b, b_kl_s, iz)
            mk_h = jnp.where(filled, mk_h, sent_h)
            mk_l = jnp.where(filled, mk_l, sent_l)

            # arena base values per row, spawn value + metadata
            av_h = [lax.bitcast_convert_type(
                place(mask_a, awin[:, 2 + 2 * i:3 + 2 * i], iz), jnp.float32)
                for i in range(r)]
            av_l = [lax.bitcast_convert_type(
                place(mask_a, awin[:, 3 + 2 * i:4 + 2 * i], iz), jnp.float32)
                for i in range(r)]
            b_vh = lax.bitcast_convert_type(
                place(mask_b, bwin[:, 2:3], iz), jnp.float32)
            b_vl = lax.bitcast_convert_type(
                place(mask_b, bwin[:, 3:4], iz), jnp.float32)
            m_ini = place(mask_b, bwin[:, 4:5], iz) > 0
            m_row = place(mask_b, bwin[:, 5:6], iz)

            # ---- segment machinery (lane axis) ----
            pk_h = _shift_right_lane(mk_h, 1, ckey[0])
            pk_l = _shift_right_lane(mk_l, 1, ckey[1])
            cv_ok = st[3] > 0
            first = (mk_h != pk_h) | (mk_l != pk_l)

            is_arena = from_a
            is_spawn = from_b
            flags_src = (is_arena.astype(jnp.int32) * 1
                         | (is_spawn & m_ini).astype(jnp.int32) * 2)
            for i in range(r):
                occ_i = is_arena & ((av_h[i] != 0.0) | (av_l[i] != 0.0))
                sp_i = is_spawn & (m_row == i)
                flags_src = (flags_src
                             | occ_i.astype(jnp.int32) * (4 << i)
                             | sp_i.astype(jnp.int32) * (4 << (r + i)))
            fscan = _seg_or_scan_lane(flags_src, first)
            cont = (_prefix_or_lane(first.astype(jnp.int32)) == 0) & filled
            inject = cont & cv_ok
            fscan = jnp.where(inject, fscan | st[4], fscan)

            # per-element gating + per-row compensated segment sums
            occ_of_row = jnp.zeros_like(from_a)
            for i in range(r):
                occ_of_row |= (m_row == i) & ((fscan & (4 << i)) > 0)
            allowed_sp = is_spawn & (m_ini | occ_of_row)
            nonini_new = _count(is_spawn & (~m_ini) & occ_of_row)

            sv_h, sv_l = [], []
            for i in range(r):
                sel = allowed_sp & (m_row == i)
                add_h = jnp.where(is_arena, av_h[i],
                                  jnp.where(sel, b_vh, 0.0))
                add_l = jnp.where(is_arena, av_l[i],
                                  jnp.where(sel, b_vl, 0.0))
                vh_i, vl_i = _seg_sum_scan_lane(add_h, add_l, first)
                ch_i, cl_i = _dd_add(vh_i, vl_i,
                                     cval[2 * i], cval[2 * i + 1])
                sv_h.append(jnp.where(inject, ch_i, vh_i))
                sv_l.append(jnp.where(inject, cl_i, vl_i))

            # ---- emit completed segments ----
            nxt_i = jnp.roll(first.astype(jnp.int32), -1, axis=1)
            is_last = (jnp.where(iota_l == TILE - 1, jnp.int32(0), nxt_i) > 0) \
                & filled
            emit = is_last & _seg_alive_multi(fscan, r)
            first0_i = first.astype(jnp.int32)[0, 0]
            flush_i = st[3] * first0_i * _seg_alive_multi_i(st[4], r)
            flush = flush_i > 0
            base = flush_i
            rank = _cumsum_i32_lane(emit.astype(jnp.int32)) - 1 + base
            n_emit = rank[0, TILE - 1] + 1

            s_out = lax.broadcasted_iota(jnp.int32, (STG, 1), 0)
            mask_e = (rank == s_out) & emit

            def eplace(col_l, zero):
                return jnp.sum(jnp.where(mask_e, col_l, zero), axis=1,
                               keepdims=True, dtype=col_l.dtype)

            in_carry = s_out == 0
            use_c = in_carry & flush
            e_kh = eplace(mk_h, iz)
            e_kl = eplace(mk_l, iz)
            e_kh = jnp.where(use_c, ckey[0], e_kh)
            e_kl = jnp.where(use_c, ckey[1], e_kl)
            efill = (eplace(jnp.ones((1, TILE), jnp.int32), iz) > 0) | use_c
            e_kh = jnp.where(efill, e_kh, sent_h)
            e_kl = jnp.where(efill, e_kl, sent_l)
            stg[:, 0:1] = e_kh
            stg[:, 1:2] = e_kl
            for i in range(r):
                e_vh = eplace(_f2i_k(sv_h[i]), iz)
                e_vl = eplace(_f2i_k(sv_l[i]), iz)
                e_vh = jnp.where(
                    use_c, _f2i_k(jnp.full((STG, 1), cval[2 * i])), e_vh)
                e_vl = jnp.where(
                    use_c, _f2i_k(jnp.full((STG, 1), cval[2 * i + 1])), e_vl)
                stg[:, 2 + 2 * i:3 + 2 * i] = e_vh
                stg[:, 3 + 2 * i:4 + 2 * i] = e_vl

            oi = st[2]
            ok = oi <= cap

            @pl.when(ok)
            def _write():
                cp_o = pltpu.make_async_copy(stg, o_ref.at[pl.ds(oi, STG)],
                                             sem_o)
                cp_o.start()
                cp_o.wait()

            # ---- update SMEM state ----
            st[0] = ai + n_cons_a
            st[1] = si + n_cons_b
            st[2] = oi + n_emit
            open_vec = jnp.where(
                (mk_h == sent_h) & (mk_l == sent_l), jnp.int32(0),
                jnp.int32(1)
            )
            lo = open_vec[0, TILE - 1]
            lo_f = lo.astype(jnp.float32)
            st[3] = lo
            st[4] = lo * fscan[0, TILE - 1]
            st[5] = st[5] + nonini_new
            ckey[0] = lo * mk_h[0, TILE - 1] + (1 - lo) * _I32_MAX
            ckey[1] = lo * mk_l[0, TILE - 1] + (1 - lo) * _I32_MAX
            for i in range(r):
                cval[2 * i] = lo_f * sv_h[i][0, TILE - 1]
                cval[2 * i + 1] = lo_f * sv_l[i][0, TILE - 1]

        @pl.when(is_final)
        def _flush():
            oi = st[2]
            flush = (st[3] > 0) & _seg_alive_multi(st[4], r)

            @pl.when(flush)
            def _do_flush():
                kh0 = ckey[0]
                kl0 = ckey[1]
                s_out = lax.broadcasted_iota(jnp.int32, (STG, 1), 0)
                row0 = s_out == 0
                stg[:, 0:1] = jnp.where(row0, kh0, _I32_MAX)
                stg[:, 1:2] = jnp.where(row0, kl0, _I32_MAX)
                for col in range(2 * r):
                    stg[:, 2 + col:3 + col] = jnp.where(
                        row0, _f2i_k(jnp.full((STG, 1), cval[col])),
                        jnp.int32(0))

                @pl.when(oi <= cap)
                def _w():
                    cp_o = pltpu.make_async_copy(
                        stg, o_ref.at[pl.ds(oi, STG)], sem_o)
                    cp_o.start()
                    cp_o.wait()
                st[2] = oi + 1

            stats_ref[0] = st[2]
            stats_ref[1] = jnp.minimum(jnp.maximum(st[2] - cap, 0), 1)
            stats_ref[2] = st[5]
            for i in range(3, 8):
                stats_ref[i] = 0

    return kernel


@partial(jax.jit,
         static_argnames=("capacity", "n_words", "n_rows", "interpret"))
def _merge_call_multi(a_t, b_t, n_a, n_s, capacity, n_words, n_rows,
                      interpret):
    c_pad = a_t.shape[0]
    s_pad = b_t.shape[0]
    sent_h, sent_l = split_key(dets.invalid_det(n_words)[None, :])
    scal = jnp.stack([
        n_a.astype(jnp.int32), n_s.astype(jnp.int32),
        sent_h[0], sent_l[0], jnp.int32(capacity),
        jnp.int32(0), jnp.int32(0), jnp.int32(0)])
    g = _cdiv((c_pad - TILE) + (s_pad - TILE), TILE) + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, NCOL), jnp.int32),
            pltpu.VMEM((TILE, NCOL), jnp.int32),
            pltpu.VMEM((STG, NCOL), jnp.int32),
            pltpu.SMEM((16,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2 * n_rows,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_rows = capacity + STG + 8
    with jax.enable_x64(False):
        o_t, stats = pl.pallas_call(
            _make_kernel_multi(n_rows),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, NCOL), jnp.int32),
                jax.ShapeDtypeStruct((8,), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(scal, a_t, b_t)
    return o_t, stats


def accumulate_multi_pallas(arena, spawn_keys, spawn_vals, spawn_rows,
                            spawn_ini, *, interpret: bool = False,
                            version: str | None = None):
    """Drop-in for ``arena.accumulate_multi`` (per-spawn destination rows,
    initiator occupancy checked against the spawn's own row).  Requires
    packable det keys and ``arena.n_vecs <= 14`` (int32 flag bits)."""
    from fries_tpu.runtime import arena as arena_mod

    if version is None:
        version = os.environ.get("FRIES_MERGE_KERNEL", "v2")

    c, w = arena.keys.shape
    r = arena.n_vecs
    assert r <= 14, "pallas accumulate_multi supports <= 14 value rows"
    assert dets.packable(w), "pallas accumulate_multi needs packable keys"
    s = spawn_keys.shape[0]

    a_kh, a_kl = split_key(arena.keys)
    pad = jnp.zeros((TILE,), jnp.int32)
    sh, sl = split_key(dets.invalid_det(w)[None, :])

    def widen(cols, n):
        data = jnp.stack(cols, axis=1)
        return jnp.concatenate(
            [data, jnp.zeros((n + TILE, NCOL - len(cols)), jnp.int32)],
            axis=1)

    a_cols = [
        jnp.concatenate([a_kh, jnp.full((TILE,), sh[0], jnp.int32)]),
        jnp.concatenate([a_kl, jnp.full((TILE,), sl[0], jnp.int32)]),
    ]
    for i in range(r):
        vh_i, vl_i = split_val(arena.vals[i].astype(jnp.float64))
        a_cols.append(jnp.concatenate([_f2i(vh_i), pad]))
        a_cols.append(jnp.concatenate([_f2i(vl_i), pad]))
    a_t = widen(a_cols, c)

    skey = dets.pack_key(spawn_keys)
    skey_s, sval_s, sini_s, srow_s = lax.sort(
        [skey, spawn_vals.astype(jnp.float64),
         spawn_ini.astype(jnp.int32), spawn_rows.astype(jnp.int32)],
        num_keys=1, is_stable=True)
    s_kh = (skey_s >> jnp.int64(32)).astype(jnp.int32)
    s_kl = lax.bitcast_convert_type(
        (skey_s & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        ^ jnp.uint32(0x80000000), jnp.int32)
    s_vh, s_vl = split_val(sval_s)
    s_valid = ~((s_kh == sh[0]) & (s_kl == sl[0]))
    s_vh = jnp.where(s_valid, s_vh, 0.0)
    s_vl = jnp.where(s_valid, s_vl, 0.0)
    sini_s = jnp.where(s_valid, sini_s, 0)
    srow_s = jnp.where(s_valid, jnp.clip(srow_s, 0, r - 1), 0)
    b_t = widen([
        jnp.concatenate([s_kh, jnp.full((TILE,), sh[0], jnp.int32)]),
        jnp.concatenate([s_kl, jnp.full((TILE,), sl[0], jnp.int32)]),
        jnp.concatenate([_f2i(s_vh), pad]),
        jnp.concatenate([_f2i(s_vl), pad]),
        jnp.concatenate([sini_s, pad]),
        jnp.concatenate([srow_s, pad]),
    ], s)

    n_a = jnp.sum(arena.valid, dtype=jnp.int32)
    n_s = jnp.sum(s_valid, dtype=jnp.int32)

    o_t, kstats = _merge_call_multi(a_t, b_t, n_a, n_s, c, w, r, interpret)

    n_out = kstats[0]
    overflow = kstats[1] > 0
    live = jnp.arange(c, dtype=jnp.int32) < jnp.minimum(n_out, c)
    kh = jnp.where(live, o_t[:c, 0], sh[0])
    kl = jnp.where(live, o_t[:c, 1], sl[0])
    keys = unsplit_key(kh, kl, w)

    def decode(hi_col, lo_col):
        v = (_i2f_host(o_t[:c, hi_col]).astype(jnp.float64)
             + _i2f_host(o_t[:c, lo_col]).astype(jnp.float64))
        return jnp.where(live, v, 0.0)

    vals = jnp.stack(
        [decode(2 + 2 * i, 3 + 2 * i) for i in range(r)]
    ).astype(arena.vals.dtype)
    new_arena = arena_mod.Arena(
        keys=keys, vals=vals, n_used=jnp.minimum(n_out, c)[None])
    return new_arena, {"overflow": overflow,
                       "nonini_occ_add": kstats[2]}


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def _cdiv(a, b):
    return -(-a // b)


@partial(jax.jit, static_argnames=("capacity", "n_words", "interpret"))
def _merge_call(a_t, b_t, n_a, n_s, capacity, n_words, interpret):
    c_pad = a_t.shape[0]
    s_pad = b_t.shape[0]
    sent_h, sent_l = split_key(dets.invalid_det(n_words)[None, :])
    scal = jnp.stack([
        n_a.astype(jnp.int32), n_s.astype(jnp.int32),
        sent_h[0], sent_l[0], jnp.int32(capacity),
        jnp.int32(0), jnp.int32(0), jnp.int32(0)])
    g = _cdiv((c_pad - TILE) + (s_pad - TILE), TILE) + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, NCOL), jnp.int32),   # arena window
            pltpu.VMEM((TILE, NCOL), jnp.int32),   # spawn window
            pltpu.VMEM((STG, NCOL), jnp.int32),    # staging
            pltpu.SMEM((16,), jnp.int32),       # state
            pltpu.SMEM((2,), jnp.int32),        # carry key
            pltpu.SMEM((4,), jnp.float32),      # carry value pairs (g, d)
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_rows = capacity + STG + 8
    # Trace the kernel under 32-bit mode: with global x64 the lowering
    # emits an i64 grid scalar Mosaic cannot legalize (see tpu_supported).
    with jax.enable_x64(False):
        o_t, stats = pl.pallas_call(
            _KERNEL,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, NCOL), jnp.int32),
                jax.ShapeDtypeStruct((8,), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the (TILE, TILE) merge-rank/placement temporaries exceed
                # the default 16 MiB scoped-vmem stack at TILE >= 128
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(scal, a_t, b_t)
    return o_t, stats


def accumulate_pallas(arena, spawn_keys, spawn_vals, spawn_ini,
                      origin_row: int = 0, dest_row: int = 0,
                      *, keep_mask=None, interpret: bool = False,
                      version: str | None = None):
    """Drop-in for ``arena.accumulate``.

    Supports the two layouts the drivers use: a single value row with
    origin == dest == 0 (fciqmc / observables), and a two-row arena with
    origin_row=0 (the gate/solution row, passed through) and dest_row=1
    (the spawn-accumulation row, zeroed by the power step before entry) -
    the flagship power-iteration layout (drivers/power.py).  Returns
    (new_arena, stats) with semantics identical to ``arena.accumulate``;
    see the module docstring for the 32-bit re-encoding.  Requires
    ``dets.packable(arena.n_words)``.

    ``keep_mask`` (C,) bool enables fused compaction: arena rows whose
    origin value is zero, whose mask bit is False, and which receive no
    surviving spawn are dropped from the output - equivalent to
    ``arena.compact(arena, (origin != 0) | keep_mask)`` followed by plain
    accumulate, in one kernel pass (replaces the driver-level compact,
    vec_utils.hpp:466-478 del_at_pos bookkeeping).
    """
    from fries_tpu.runtime import arena as arena_mod

    if version is None:
        version = os.environ.get("FRIES_MERGE_KERNEL", "v2")

    c, w = arena.keys.shape
    r = arena.n_vecs
    assert (r, origin_row, dest_row) in ((1, 0, 0), (2, 0, 1)), (
        "pallas accumulate supports (n_vecs, origin, dest) = (1,0,0)|(2,0,1)")
    assert dets.packable(w), "pallas accumulate needs packable det keys"
    s = spawn_keys.shape[0]

    # ---- encode arena stream (sorted, unique, sentinel padded) ----
    a_kh, a_kl = split_key(arena.keys)
    a_gh, a_gl = split_val(arena.vals[origin_row].astype(jnp.float64))
    if r == 2:
        a_dh, a_dl = split_val(arena.vals[dest_row].astype(jnp.float64))
    else:
        a_dh, a_dl = a_gh, a_gl
    pad = jnp.zeros((TILE,), jnp.int32)
    sh, sl = split_key(dets.invalid_det(w)[None, :])

    if keep_mask is None:
        a_prot = jnp.ones((c,), jnp.int32)   # classic: every arena row kept
    else:
        a_prot = keep_mask.astype(jnp.int32)

    def widen(cols, n):
        """(n+TILE, len(cols)) data columns -> (n+TILE, NCOL) padded rows."""
        data = jnp.stack(cols, axis=1)
        return jnp.concatenate(
            [data, jnp.zeros((n + TILE, NCOL - len(cols)), jnp.int32)],
            axis=1)

    a_t = widen([
        jnp.concatenate([a_kh, jnp.full((TILE,), sh[0], jnp.int32)]),
        jnp.concatenate([a_kl, jnp.full((TILE,), sl[0], jnp.int32)]),
        jnp.concatenate([_f2i(a_gh), pad]),
        jnp.concatenate([_f2i(a_gl), pad]),
        jnp.concatenate([_f2i(a_dh), pad]),
        jnp.concatenate([_f2i(a_dl), pad]),
        jnp.concatenate([a_prot, pad]),
    ], c)

    # ---- sort + encode spawn stream ----
    skey = dets.pack_key(spawn_keys)
    skey_s, sval_s, sini_s = lax.sort(
        [skey, spawn_vals.astype(jnp.float64),
         spawn_ini.astype(jnp.int32)], num_keys=1, is_stable=True)
    s_kh = (skey_s >> jnp.int64(32)).astype(jnp.int32)
    s_kl = lax.bitcast_convert_type(
        (skey_s & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        ^ jnp.uint32(0x80000000), jnp.int32)
    s_vh, s_vl = split_val(sval_s)
    # blocked-invalid spawns must not contribute: zero their values
    s_valid = ~((s_kh == sh[0]) & (s_kl == sl[0]))
    s_vh = jnp.where(s_valid, s_vh, 0.0)
    s_vl = jnp.where(s_valid, s_vl, 0.0)
    sini_s = jnp.where(s_valid, sini_s, 0)
    b_t = widen([
        jnp.concatenate([s_kh, jnp.full((TILE,), sh[0], jnp.int32)]),
        jnp.concatenate([s_kl, jnp.full((TILE,), sl[0], jnp.int32)]),
        jnp.concatenate([_f2i(s_vh), pad]),
        jnp.concatenate([_f2i(s_vl), pad]),
        jnp.concatenate([sini_s, pad]),
    ], s)

    n_a = jnp.sum(arena.valid, dtype=jnp.int32)
    n_s = jnp.sum(s_valid, dtype=jnp.int32)

    o_t, kstats = _merge_call(a_t, b_t, n_a, n_s, c, w, interpret)

    n_out = kstats[0]
    overflow = kstats[1] > 0
    live = jnp.arange(c, dtype=jnp.int32) < jnp.minimum(n_out, c)
    kh = jnp.where(live, o_t[:c, 0], sh[0])
    kl = jnp.where(live, o_t[:c, 1], sl[0])
    keys = unsplit_key(kh, kl, w)

    def decode(hi_col, lo_col):
        v = (_i2f_host(o_t[:c, hi_col]).astype(jnp.float64)
             + _i2f_host(o_t[:c, lo_col]).astype(jnp.float64))
        return jnp.where(live, v, 0.0)

    if r == 1:
        vals = decode(4, 5)[None, :].astype(arena.vals.dtype)
    else:
        vals = jnp.stack([decode(2, 3), decode(4, 5)]).astype(arena.vals.dtype)
    new_arena = arena_mod.Arena(
        keys=keys, vals=vals, n_used=jnp.minimum(n_out, c)[None])
    return new_arena, {"overflow": overflow,
                       "nonini_occ_add": kstats[2]}
