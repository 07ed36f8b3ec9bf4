"""Linearithmic Pallas merge-accumulate kernel (v3).

Same contract and semantics as the v2 kernel in
:mod:`fries_tpu.runtime.pallas_merge` (streaming sorted-merge + dedup +
initiator gating + optional fused compaction; reference two-pass add
FRIES/vec_utils.hpp:991-1019 + 606-641), but the per-tile math is
linearithmic instead of quadratic:

* v2 computes merge ranks from two (TILE, TILE) cross-compare matrices and
  places rows through (TILE, TILE)/(STG, TILE) one-hot masked reductions -
  O(TILE^2) VPU work per TILE merged elements.  Doubling TILE halves the
  step count but doubles per-element work, which is why TILE=256 measured
  no faster than 128 (PLAN.md).
* v3 merges the two sorted windows with a **bitonic merge network** (the
  ascending arena window concatenated with the descending spawn window is
  bitonic; log2(2*TB) compare-exchange stages sort it, and the payload
  columns ride the exchanges - no rank computation, no placement masks),
  runs the segment machinery with the same log-step scans in a 2-D
  (rows, 128) layout, and compacts emitted rows with an **LSB-first
  monotone-gap packing network** (each emitted row moves left by
  ``position - rank``; gaps from a compaction are non-decreasing, so
  per-bit shifts never collide).  O(TB log TB) per TB merged elements.

This lets one grid step consume ``TB = 1024`` merged elements (vs 128)
with ~7x less VPU work per element and 8x fewer sequential grid steps.

Stream encoding matches v2 (order-preserving int32 key splits, f32-pair
compensated values) with two deltas:

* the spawn stream is stored **descending** (host-side flip) so each
  window is the descending half of a bitonic sequence without an
  in-kernel reverse;
* each spawn row carries a ``tie`` column = its ascending sort rank; the
  merge comparator is (kh, kl, tie) with arena rows at tie = -1, making
  the network a *stable* merge: arena-first within a determinant (the
  inclusive OR-scan then shows arena occupancy to every spawn in the
  segment) and spawn-order-preserving (compensated sums reproduce the
  XLA path bit-for-bit).
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
from fries_tpu.runtime.pallas_merge import (
    NCOL,
    _F_ARENA,
    _F_INISP,
    _F_OCC,
    _F_PROT,
    _F_SP,
    _I32_MAX,
    _count,
    _dd_add,
    _f2i,
    _f2i_k,
    _i2f_host,
    _seg_alive,
    _seg_alive_i,
    _seg_alive_multi,
    _seg_alive_multi_i,
    split_key,
    split_val,
    unsplit_key,
)

TB = int(os.environ.get("FRIES_MERGE_V3_TB", "1024"))
                    # merged elements consumed per grid step; power of two,
                    # multiple of 128 (the 2-D layout is (TB/128, 128))
RB = TB // 128      # rows of the consumed slice
R2 = 2 * RB         # rows of the full merged window (A ++ reversed B)
STG3 = TB + 8       # staging rows (emits <= TB + 1 carry flush)


def _iota2(shape, axis):
    return lax.broadcasted_iota(jnp.int32, shape, axis)


def _xor_shuffle(x, d):
    """x at partner index ``e ^ d`` over the flattened (rows, 128) layout.

    ``d`` is a power of two: a lane-axis pair of rolls for d < 128, a
    sublane-axis pair for d >= 128 (then d must be a multiple of 128).
    """
    if d < 128:
        a = jnp.roll(x, d, axis=1)
        b = jnp.roll(x, -d, axis=1)
        return jnp.where((_iota2(x.shape, 1) & d) != 0, a, b)
    dr = d // 128
    a = jnp.roll(x, dr, axis=0)
    b = jnp.roll(x, -dr, axis=0)
    return jnp.where((_iota2(x.shape, 0) & dr) != 0, a, b)


def _shift_down2(x, d, fill):
    """y[e] = x[e - d] over the flattened layout; ``fill`` for e < d."""
    if d < 128:
        z = jnp.roll(x, d, axis=1)
        w = jnp.roll(z, 1, axis=0)
        lane = _iota2(x.shape, 1)
        y = jnp.where(lane >= d, z, w)
        return jnp.where((_iota2(x.shape, 0) == 0) & (lane < d), fill, y)
    dr = d // 128
    z = jnp.roll(x, dr, axis=0)
    return jnp.where(_iota2(x.shape, 0) >= dr, z, fill)


def _shift_up2(x, d, fill):
    """y[e] = x[e + d] over the flattened layout; ``fill`` past the end."""
    r = x.shape[0]
    if d < 128:
        z = jnp.roll(x, -d, axis=1)
        w = jnp.roll(z, -1, axis=0)
        lane = _iota2(x.shape, 1)
        y = jnp.where(lane < 128 - d, z, w)
        return jnp.where((_iota2(x.shape, 0) == r - 1) & (lane >= 128 - d),
                         fill, y)
    dr = d // 128
    z = jnp.roll(x, -dr, axis=0)
    return jnp.where(_iota2(x.shape, 0) < r - dr, z, fill)


def _seg_or_scan2(flags, heads):
    """Inclusive segmented OR-scan of int32 ``flags`` over (RB, 128)."""
    n = flags.shape[0] * 128
    f = flags
    h = heads.astype(jnp.int32)
    d = 1
    while d < n:
        pf = _shift_down2(f, d, jnp.int32(0))
        ph = _shift_down2(h, d, jnp.int32(1))
        f = jnp.where(h > 0, f, f | pf)
        h = h | ph
        d *= 2
    return f


def _prefix_or2(x):
    n = x.shape[0] * 128
    d = 1
    while d < n:
        x = x | _shift_down2(x, d, jnp.int32(0))
        d *= 2
    return x


def _seg_sum_scan2(vh, vl, heads):
    """Inclusive segmented compensated f32-pair sum-scan over (RB, 128)."""
    n = vh.shape[0] * 128
    h = heads.astype(jnp.int32)
    d = 1
    while d < n:
        pvh = _shift_down2(vh, d, jnp.float32(0))
        pvl = _shift_down2(vl, d, jnp.float32(0))
        ph = _shift_down2(h, d, jnp.int32(1))
        blocked = h > 0
        nvh, nvl = _dd_add(vh, vl,
                           jnp.where(blocked, 0.0, pvh),
                           jnp.where(blocked, 0.0, pvl))
        vh = jnp.where(blocked, vh, nvh)
        vl = jnp.where(blocked, vl, nvl)
        h = h | ph
        d *= 2
    return vh, vl


def _cumsum2(x):
    n = x.shape[0] * 128
    d = 1
    while d < n:
        x = x + _shift_down2(x, d, jnp.int32(0))
        d *= 2
    return x


def _bitonic_merge(kh, kl, tie, payload):
    """Sort the bitonic (rows, 128) sequence ascending by (kh, kl, tie).

    ``payload`` columns ride the compare-exchanges.  Returns the sorted
    (kh, kl, tie, payload).  The kernels call this on the (RB, 128) low
    half produced by :func:`_merge_low`; the (R2, 128) full window form is
    kept for the interpret-mode unit tests.
    """
    d = kh.shape[0] * 128 // 2
    while d >= 1:
        pkh = _xor_shuffle(kh, d)
        pkl = _xor_shuffle(kl, d)
        ptie = _xor_shuffle(tie, d)
        if d < 128:
            lower = (_iota2(kh.shape, 1) & d) == 0
        else:
            lower = (_iota2(kh.shape, 0) & (d // 128)) == 0
        gt = (kh > pkh) | ((kh == pkh)
                           & ((kl > pkl) | ((kl == pkl) & (tie > ptie))))
        lt = (kh < pkh) | ((kh == pkh)
                           & ((kl < pkl) | ((kl == pkl) & (tie < ptie))))
        # select i32 0/1, not i1 operands: Mosaic cannot truncate the
        # resulting i8 select back to an i1 vector at (R2, 128)
        swap = jnp.where(lower, gt.astype(jnp.int32),
                         lt.astype(jnp.int32)) > 0
        kh = jnp.where(swap, pkh, kh)
        kl = jnp.where(swap, pkl, kl)
        tie = jnp.where(swap, ptie, tie)
        payload = [jnp.where(swap, _xor_shuffle(c, d), c) for c in payload]
        d //= 2
    return kh, kl, tie, payload


def _merge_low(akh, akl, bkh, bkl, btie, pairs):
    """Low half of the first bitonic-merge stage over the two (RB, 128)
    tiles (arena window ascending, spawn window descending).

    Stage d=TB of the network on ``concat(A, B)`` compares A[p] with B[p]
    elementwise and the low half keeps the TB smallest elements — so the
    concatenated (R2, 128) window never needs to exist (Mosaic cannot
    lower ``tpu.concatenate`` of tiles whose lazy column-slice layouts
    carry different lane offsets), and the remaining stages run on half
    the rows.  Arena rows take tie = -1 (< any spawn rank), so on equal
    keys A wins without consulting the tie column.  ``pairs`` is a list of
    (a_side, b_side) payload columns.  Returns (kh, kl, tie, payload).
    """
    swap = (bkh < akh) | ((bkh == akh) & (bkl < akl))
    kh = jnp.where(swap, bkh, akh)
    kl = jnp.where(swap, bkl, akl)
    tie = jnp.where(swap, btie, jnp.int32(-1))
    payload = [jnp.where(swap, b, a) for a, b in pairs]
    return kh, kl, tie, payload


def _pack_left(gap, cols):
    """Move element e left by ``gap[e]`` (monotone non-decreasing over the
    active elements, 0 = inactive).  LSB-first bit shifts; a moved-from slot
    freezes (gap 0) so stale copies never move again, and arrivals always
    overwrite.  Returns the packed columns."""
    d = 1
    while d < TB:
        g_src = _shift_up2(gap, d, jnp.int32(0))
        take = (g_src & d) != 0
        moved = (gap & d) != 0
        cols = [jnp.where(take, _shift_up2(c, d, jnp.int32(0)), c)
                for c in cols]
        gap = jnp.where(take, g_src, jnp.where(moved, jnp.int32(0), gap))
        d *= 2
    return cols


def _kernel_v3(scal, a_ref, b_ref, o_ref, stats_ref,
               awin, bwin, stg, st, ckey, cval, sem_a, sem_b, sem_o):
    """One grid step: consume <= TB merged elements, emit finished rows.

    scal: SMEM int32[8]: [n_a, n_s, sent_h, sent_l, capacity, b_base, 0, 0]
       where b_base = (padded spawn rows) - TB locates the descending
       window: rows [b_base - si, b_base - si + TB) of b_ref hold ascending
       spawn ranks si..si+TB-1 in descending order.
    a_ref: HBM int32 (C + TB, NCOL): kh, kl, gvh, gvl, dvh, dvl, prot
       (ascending, unique, sentinel padded).
    b_ref: HBM int32 (S + TB, NCOL): kh, kl, vh, vl, ini, tie - ascending
       sort order FLIPPED host-side (descending rows).
    o_ref: HBM int32 (C + STG3 + 8, NCOL) output rows: kh, kl, gvh, gvl,
       dvh, dvl.
    stats_ref: SMEM int32[8] out: [n_out, overflow, nonini_occ_add, 0...].
    st (SMEM int32[16]): 0 ai, 1 si, 2 oi, 3 carry_valid, 4 carry_flags,
       5 nonini_acc.  ckey: SMEM int32[2].  cval: SMEM f32[4].
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    n_a = scal[0]
    n_s = scal[1]
    sent_h = scal[2]
    sent_l = scal[3]
    cap = scal[4]
    b_base = scal[5]

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
        cp_a = pltpu.make_async_copy(a_ref.at[pl.ds(ai, TB)], awin, sem_a)
        cp_b = pltpu.make_async_copy(b_ref.at[pl.ds(b_base - si, TB)], bwin,
                                     sem_b)
        cp_a.start()
        cp_b.start()
        cp_a.wait()
        cp_b.wait()

        def col_a(c):
            return awin[:, c:c + 1].reshape(RB, 128)

        def col_b(c):
            return bwin[:, c:c + 1].reshape(RB, 128)

        zero = jnp.zeros((RB, 128), jnp.int32)
        kh, kl, tie, (gh, gl, vh, vl, ini, prot) = _merge_low(
            col_a(0), col_a(1), col_b(0), col_b(1), col_b(5),
            [(col_a(2), zero),       # gate pair (arena only)
             (col_a(3), zero),
             (col_a(4), col_b(2)),   # dest contribution
             (col_a(5), col_b(3)),
             (zero, col_b(4)),       # ini
             (col_a(6), zero)])      # prot

        kh, kl, tie, (gh, gl, vh, vl, ini, prot) = _bitonic_merge(
            kh, kl, tie, [gh, gl, vh, vl, ini, prot])

        # ---- consumed slice: the TB smallest merged elements ----
        mk_h, mk_l, m_tie = kh, kl, tie
        filled = ~((mk_h == sent_h) & (mk_l == sent_l))
        is_arena = (m_tie < 0) & filled
        is_spawn = (m_tie >= 0) & filled
        n_cons_a = _count(is_arena)
        n_cons_b = _count(is_spawn)
        m_ini = (ini > 0) & is_spawn
        m_prot = (prot > 0) & is_arena
        mg_h = lax.bitcast_convert_type(gh, jnp.float32)
        mg_l = lax.bitcast_convert_type(gl, jnp.float32)
        md_h = lax.bitcast_convert_type(vh, jnp.float32)
        md_l = lax.bitcast_convert_type(vl, jnp.float32)

        # ---- segment machinery (identical semantics to v2) ----
        pk_h = _shift_down2(mk_h, 1, ckey[0])
        pk_l = _shift_down2(mk_l, 1, ckey[1])
        cv_ok = st[3] > 0
        first = (mk_h != pk_h) | (mk_l != pk_l)

        arena_nz = is_arena & ((mg_h != 0.0) | (mg_l != 0.0))
        flags_src = (is_arena.astype(jnp.int32) * _F_ARENA
                     | arena_nz.astype(jnp.int32) * _F_OCC
                     | m_ini.astype(jnp.int32) * _F_INISP
                     | is_spawn.astype(jnp.int32) * _F_SP
                     | m_prot.astype(jnp.int32) * _F_PROT)
        fscan = _seg_or_scan2(flags_src, first)
        cont = (_prefix_or2(first.astype(jnp.int32)) == 0) & filled
        inject = cont & cv_ok
        fscan = jnp.where(inject, fscan | st[4], fscan)

        occ = (fscan & _F_OCC) > 0
        allowed_sp = is_spawn & (m_ini | occ)
        contributes = allowed_sp | is_arena
        nonini_new = _count(is_spawn & (~m_ini) & occ)

        add_h = jnp.where(contributes, md_h, 0.0)
        add_l = jnp.where(contributes, md_l, 0.0)
        sv_h, sv_l = _seg_sum_scan2(add_h, add_l, first)
        cc_h, cc_l = _dd_add(sv_h, sv_l, cval[2], cval[3])
        sv_h = jnp.where(inject, cc_h, sv_h)
        sv_l = jnp.where(inject, cc_l, sv_l)
        gv_h, gv_l = _seg_sum_scan2(mg_h, mg_l, first)
        cg_h, cg_l = _dd_add(gv_h, gv_l, cval[0], cval[1])
        gv_h = jnp.where(inject, cg_h, gv_h)
        gv_l = jnp.where(inject, cg_l, gv_l)

        # ---- emit completed segments ----
        nxt = _shift_up2(first.astype(jnp.int32), 1, jnp.int32(0))
        is_last = (nxt > 0) & filled
        emit = is_last & _seg_alive(fscan)
        first0_i = first.astype(jnp.int32)[0, 0]
        flush_i = st[3] * first0_i * _seg_alive_i(st[4])
        rank0 = _cumsum2(emit.astype(jnp.int32)) - 1
        n_emit = rank0[RB - 1, 127] + 1 + flush_i

        # pack emitted rows to the front (rank order), then shift by one
        # slot when the carried segment flushes
        pos = _iota2((RB, 128), 0) * 128 + _iota2((RB, 128), 1)
        gap = jnp.where(emit, pos - rank0, jnp.int32(0))
        e_kh, e_kl, e_gh, e_gl, e_vh, e_vl = _pack_left(
            gap,
            [mk_h, mk_l, _f2i_k(gv_h), _f2i_k(gv_l),
             _f2i_k(sv_h), _f2i_k(sv_l)])
        # flush shift: scalar f32 bitcasts are not lowerable (tpu.bitcast
        # needs vectors), so value carries are injected as vector selects
        # on slot 0 instead of shift fills
        fmask = (zero + flush_i) > 0
        slot0 = pos == 0
        e_kh = jnp.where(fmask, _shift_down2(e_kh, 1, ckey[0]), e_kh)
        e_kl = jnp.where(fmask, _shift_down2(e_kl, 1, ckey[1]), e_kl)

        def _carry_val(col, cv):
            shifted = jnp.where(fmask, _shift_down2(col, 1, jnp.int32(0)),
                                col)
            return jnp.where(fmask & slot0,
                             _f2i_k(jnp.full((RB, 128), cv)), shifted)

        e_gh = _carry_val(e_gh, cval[0])
        e_gl = _carry_val(e_gl, cval[1])
        e_vh = _carry_val(e_vh, cval[2])
        e_vl = _carry_val(e_vl, cval[3])
        vmask = pos < n_emit
        e_kh = jnp.where(vmask, e_kh, sent_h)
        e_kl = jnp.where(vmask, e_kl, sent_l)

        _stg_write(stg, 0, e_kh, sent_h)
        _stg_write(stg, 1, e_kl, sent_l)
        _stg_write(stg, 2, e_gh, jnp.int32(0))
        _stg_write(stg, 3, e_gl, jnp.int32(0))
        _stg_write(stg, 4, e_vh, jnp.int32(0))
        _stg_write(stg, 5, e_vl, jnp.int32(0))

        oi = st[2]
        ok = oi <= cap

        @pl.when(ok)
        def _write():
            cp_o = pltpu.make_async_copy(stg, o_ref.at[pl.ds(oi, STG3)],
                                         sem_o)
            cp_o.start()
            cp_o.wait()

        # ---- update SMEM state ----
        st[0] = ai + n_cons_a
        st[1] = si + n_cons_b
        st[2] = oi + n_emit
        lo = filled.astype(jnp.int32)[RB - 1, 127]
        lo_f = lo.astype(jnp.float32)
        st[3] = lo
        st[4] = lo * fscan[RB - 1, 127]
        st[5] = st[5] + nonini_new
        ckey[0] = lo * mk_h[RB - 1, 127] + (1 - lo) * _I32_MAX
        ckey[1] = lo * mk_l[RB - 1, 127] + (1 - lo) * _I32_MAX
        cval[0] = lo_f * gv_h[RB - 1, 127]
        cval[1] = lo_f * gv_l[RB - 1, 127]
        cval[2] = lo_f * sv_h[RB - 1, 127]
        cval[3] = lo_f * sv_l[RB - 1, 127]

    @pl.when(is_final)
    def _flush():
        oi = st[2]
        flush = (st[3] > 0) & _seg_alive(st[4])

        @pl.when(flush)
        def _do_flush():
            s_out = lax.broadcasted_iota(jnp.int32, (STG3, 1), 0)
            row0 = s_out == 0
            stg[:, 0:1] = jnp.where(row0, ckey[0], _I32_MAX)
            stg[:, 1:2] = jnp.where(row0, ckey[1], _I32_MAX)
            for col in range(4):
                stg[:, 2 + col:3 + col] = jnp.where(
                    row0, _f2i_k(jnp.full((STG3, 1), cval[col])),
                    jnp.int32(0))

            @pl.when(oi <= cap)
            def _w():
                cp_o = pltpu.make_async_copy(stg, o_ref.at[pl.ds(oi, STG3)],
                                             sem_o)
                cp_o.start()
                cp_o.wait()
            st[2] = oi + 1

        stats_ref[0] = st[2]
        stats_ref[1] = jnp.minimum(jnp.maximum(st[2] - cap, 0), 1)
        stats_ref[2] = st[5]
        for i in range(3, 8):
            stats_ref[i] = 0


def _stg_write(stg, c, x, sent):
    """Store the (RB, 128) packed column ``x`` into staging column ``c`` as
    (STG3, 1) rows (element pos = r*128 + lane -> row pos; tail = sent).

    Mosaic cannot lower the direct (RB, 128) -> (TB, 1) shape cast (nor a
    sublane-lane transpose), so each 128-row block is transposed as a
    single-vreg masked lane-reduce: block r = sum_l eye[i, l] * x[r, l].
    This works per (128, 128) tile instead of materializing (STG3, 128)
    temporaries per row-select (the original rolled-select form cost
    ~10 us/column/step and dominated the kernel)."""
    eye = _iota2((128, 128), 0) == _iota2((128, 128), 1)
    for r in range(RB):
        blk = jnp.sum(jnp.where(eye, x[r:r + 1, :], jnp.int32(0)),
                      axis=1, keepdims=True)
        stg[r * 128:(r + 1) * 128, c:c + 1] = blk
    stg[TB:STG3, c:c + 1] = jnp.full((STG3 - TB, 1), sent, jnp.int32)


@partial(jax.jit, static_argnames=("capacity", "n_words", "interpret"))
def _merge_call_v3(a_t, b_t, n_a, n_s, capacity, n_words, interpret):
    c_pad = a_t.shape[0]
    s_pad = b_t.shape[0]
    sent_h, sent_l = split_key(dets.invalid_det(n_words)[None, :])
    scal = jnp.stack([
        n_a.astype(jnp.int32), n_s.astype(jnp.int32),
        sent_h[0], sent_l[0], jnp.int32(capacity),
        jnp.int32(s_pad - TB), jnp.int32(0), jnp.int32(0)])
    g = _cdiv((c_pad - TB) + (s_pad - TB), TB) + 1
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
            pltpu.VMEM((TB, NCOL), jnp.int32),    # arena window
            pltpu.VMEM((TB, NCOL), jnp.int32),    # spawn window (descending)
            pltpu.VMEM((STG3, NCOL), jnp.int32),  # staging
            pltpu.SMEM((16,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_rows = capacity + STG3 + 8
    with jax.enable_x64(False):
        o_t, stats = pl.pallas_call(
            _kernel_v3,
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


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# multi-row kernel: per-spawn destination rows (subspace drivers)
#
# Same generalization as pallas_merge._make_kernel_multi (R arena value
# rows, per-spawn row ids, per-row occupancy gating of non-initiator
# spawns; flag-bit layout shared via _seg_alive_multi), rebuilt on the v3
# networks.  Spawn values are pre-split into their destination row's
# column pair when the combined window is assembled, so the merge moves
# 2R uniform value columns and the per-row segment sums need no selects.
# ---------------------------------------------------------------------------


def _make_kernel_v3_multi(r):
    def kernel(scal, a_ref, b_ref, o_ref, stats_ref,
               awin, bwin, stg, st, ckey, cval, sem_a, sem_b, sem_o):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)
        n_a = scal[0]
        n_s = scal[1]
        sent_h = scal[2]
        sent_l = scal[3]
        cap = scal[4]
        b_base = scal[5]

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
            cp_a = pltpu.make_async_copy(a_ref.at[pl.ds(ai, TB)], awin,
                                         sem_a)
            cp_b = pltpu.make_async_copy(b_ref.at[pl.ds(b_base - si, TB)],
                                         bwin, sem_b)
            cp_a.start()
            cp_b.start()
            cp_a.wait()
            cp_b.wait()

            def col_a(c):
                return awin[:, c:c + 1].reshape(RB, 128)

            def col_b(c):
                return bwin[:, c:c + 1].reshape(RB, 128)

            zero = jnp.zeros((RB, 128), jnp.int32)
            b_row = col_b(5)
            val_pairs = []
            for i in range(r):
                sel = b_row == i
                val_pairs.append((col_a(2 + 2 * i),
                                  jnp.where(sel, col_b(2), jnp.int32(0))))
                val_pairs.append((col_a(3 + 2 * i),
                                  jnp.where(sel, col_b(3), jnp.int32(0))))
            kh, kl, tie, moved = _merge_low(
                col_a(0), col_a(1), col_b(0), col_b(1), col_b(6),
                val_pairs + [(zero, col_b(4)), (zero - 1, b_row)])

            kh, kl, tie, moved = _bitonic_merge(kh, kl, tie, moved)
            pairs, ini, rowc = moved[:2 * r], moved[2 * r], moved[2 * r + 1]

            mk_h, mk_l, m_tie = kh, kl, tie
            filled = ~((mk_h == sent_h) & (mk_l == sent_l))
            is_arena = (m_tie < 0) & filled
            is_spawn = (m_tie >= 0) & filled
            n_cons_a = _count(is_arena)
            n_cons_b = _count(is_spawn)
            m_ini = (ini > 0) & is_spawn
            m_row = rowc
            pv_h = [lax.bitcast_convert_type(pairs[2 * i], jnp.float32)
                    for i in range(r)]
            pv_l = [lax.bitcast_convert_type(pairs[2 * i + 1], jnp.float32)
                    for i in range(r)]

            pk_h = _shift_down2(mk_h, 1, ckey[0])
            pk_l = _shift_down2(mk_l, 1, ckey[1])
            cv_ok = st[3] > 0
            first = (mk_h != pk_h) | (mk_l != pk_l)

            flags_src = (is_arena.astype(jnp.int32) * 1
                         | m_ini.astype(jnp.int32) * 2)
            for i in range(r):
                occ_i = is_arena & ((pv_h[i] != 0.0) | (pv_l[i] != 0.0))
                sp_i = is_spawn & (m_row == i)
                flags_src = (flags_src
                             | occ_i.astype(jnp.int32) * (4 << i)
                             | sp_i.astype(jnp.int32) * (4 << (r + i)))
            fscan = _seg_or_scan2(flags_src, first)
            cont = (_prefix_or2(first.astype(jnp.int32)) == 0) & filled
            inject = cont & cv_ok
            fscan = jnp.where(inject, fscan | st[4], fscan)

            occ_own = jnp.zeros_like(is_arena)
            for i in range(r):
                occ_own |= (m_row == i) & ((fscan & (4 << i)) > 0)
            allowed_sp = is_spawn & (m_ini | occ_own)
            contributes = allowed_sp | is_arena
            nonini_new = _count(is_spawn & (~m_ini) & occ_own)

            sv_h, sv_l = [], []
            for i in range(r):
                add_h = jnp.where(contributes, pv_h[i], 0.0)
                add_l = jnp.where(contributes, pv_l[i], 0.0)
                vh_i, vl_i = _seg_sum_scan2(add_h, add_l, first)
                ch_i, cl_i = _dd_add(vh_i, vl_i, cval[2 * i],
                                     cval[2 * i + 1])
                sv_h.append(jnp.where(inject, ch_i, vh_i))
                sv_l.append(jnp.where(inject, cl_i, vl_i))

            nxt = _shift_up2(first.astype(jnp.int32), 1, jnp.int32(0))
            is_last = (nxt > 0) & filled
            emit = is_last & _seg_alive_multi(fscan, r)
            first0_i = first.astype(jnp.int32)[0, 0]
            flush_i = st[3] * first0_i * _seg_alive_multi_i(st[4], r)
            rank0 = _cumsum2(emit.astype(jnp.int32)) - 1
            n_emit = rank0[RB - 1, 127] + 1 + flush_i

            pos = _iota2((RB, 128), 0) * 128 + _iota2((RB, 128), 1)
            gap = jnp.where(emit, pos - rank0, jnp.int32(0))
            packed = _pack_left(
                gap,
                [mk_h, mk_l]
                + [c for i in range(r)
                   for c in (_f2i_k(sv_h[i]), _f2i_k(sv_l[i]))])
            fmask = (zero + flush_i) > 0
            slot0 = pos == 0
            e_kh = jnp.where(fmask, _shift_down2(packed[0], 1, ckey[0]),
                             packed[0])
            e_kl = jnp.where(fmask, _shift_down2(packed[1], 1, ckey[1]),
                             packed[1])
            vmask = pos < n_emit
            e_kh = jnp.where(vmask, e_kh, sent_h)
            e_kl = jnp.where(vmask, e_kl, sent_l)
            _stg_write(stg, 0, e_kh, sent_h)
            _stg_write(stg, 1, e_kl, sent_l)
            for i in range(2 * r):
                # scalar f32 bitcasts don't lower; inject the carry as a
                # vector select on slot 0 (see _carry_val in _kernel_v3)
                e_v = jnp.where(
                    fmask, _shift_down2(packed[2 + i], 1, jnp.int32(0)),
                    packed[2 + i])
                e_v = jnp.where(fmask & slot0,
                                _f2i_k(jnp.full((RB, 128), cval[i])), e_v)
                _stg_write(stg, 2 + i, e_v, jnp.int32(0))

            oi = st[2]
            ok = oi <= cap

            @pl.when(ok)
            def _write():
                cp_o = pltpu.make_async_copy(stg, o_ref.at[pl.ds(oi, STG3)],
                                             sem_o)
                cp_o.start()
                cp_o.wait()

            st[0] = ai + n_cons_a
            st[1] = si + n_cons_b
            st[2] = oi + n_emit
            lo = filled.astype(jnp.int32)[RB - 1, 127]
            lo_f = lo.astype(jnp.float32)
            st[3] = lo
            st[4] = lo * fscan[RB - 1, 127]
            st[5] = st[5] + nonini_new
            ckey[0] = lo * mk_h[RB - 1, 127] + (1 - lo) * _I32_MAX
            ckey[1] = lo * mk_l[RB - 1, 127] + (1 - lo) * _I32_MAX
            for i in range(r):
                cval[2 * i] = lo_f * sv_h[i][RB - 1, 127]
                cval[2 * i + 1] = lo_f * sv_l[i][RB - 1, 127]

        @pl.when(is_final)
        def _flush():
            oi = st[2]
            flush = (st[3] > 0) & _seg_alive_multi(st[4], r)

            @pl.when(flush)
            def _do_flush():
                s_out = lax.broadcasted_iota(jnp.int32, (STG3, 1), 0)
                row0 = s_out == 0
                stg[:, 0:1] = jnp.where(row0, ckey[0], _I32_MAX)
                stg[:, 1:2] = jnp.where(row0, ckey[1], _I32_MAX)
                for col in range(2 * r):
                    stg[:, 2 + col:3 + col] = jnp.where(
                        row0, _f2i_k(jnp.full((STG3, 1), cval[col])),
                        jnp.int32(0))

                @pl.when(oi <= cap)
                def _w():
                    cp_o = pltpu.make_async_copy(
                        stg, o_ref.at[pl.ds(oi, STG3)], sem_o)
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
def _merge_call_v3_multi(a_t, b_t, n_a, n_s, capacity, n_words, n_rows,
                         interpret):
    s_pad = b_t.shape[0]
    sent_h, sent_l = split_key(dets.invalid_det(n_words)[None, :])
    scal = jnp.stack([
        n_a.astype(jnp.int32), n_s.astype(jnp.int32),
        sent_h[0], sent_l[0], jnp.int32(capacity),
        jnp.int32(s_pad - TB), jnp.int32(0), jnp.int32(0)])
    g = _cdiv((a_t.shape[0] - TB) + (s_pad - TB), TB) + 1
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
            pltpu.VMEM((TB, NCOL), jnp.int32),
            pltpu.VMEM((TB, NCOL), jnp.int32),
            pltpu.VMEM((STG3, NCOL), jnp.int32),
            pltpu.SMEM((16,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2 * n_rows,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_rows = capacity + STG3 + 8
    with jax.enable_x64(False):
        o_t, stats = pl.pallas_call(
            _make_kernel_v3_multi(n_rows),
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


def accumulate_multi_pallas_v3(arena, spawn_keys, spawn_vals, spawn_rows,
                               spawn_ini, *, interpret: bool = False):
    """Drop-in for ``pallas_merge.accumulate_multi_pallas`` via the v3
    networks (per-spawn destination rows, initiator occupancy checked
    against the spawn's own row)."""
    from fries_tpu.runtime import arena as arena_mod

    c, w = arena.keys.shape
    r = arena.n_vecs
    assert r <= 13, "pallas accumulate_multi supports <= 13 value rows"
    assert dets.packable(w), "pallas accumulate_multi needs packable keys"
    s = spawn_keys.shape[0]

    a_kh, a_kl = split_key(arena.keys)
    pad = jnp.zeros((TB,), jnp.int32)
    sh, sl = split_key(dets.invalid_det(w)[None, :])

    def widen(cols, n):
        data = jnp.stack(cols, axis=1)
        return jnp.concatenate(
            [data, jnp.zeros((n + TB, NCOL - len(cols)), jnp.int32)],
            axis=1)

    a_cols = [
        jnp.concatenate([a_kh, jnp.full((TB,), sh[0], jnp.int32)]),
        jnp.concatenate([a_kl, jnp.full((TB,), sl[0], jnp.int32)]),
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
        jnp.concatenate([s_kh, jnp.full((TB,), sh[0], jnp.int32)]),
        jnp.concatenate([s_kl, jnp.full((TB,), sl[0], jnp.int32)]),
        jnp.concatenate([_f2i(s_vh), pad]),
        jnp.concatenate([_f2i(s_vl), pad]),
        jnp.concatenate([sini_s, pad]),
        jnp.concatenate([srow_s, pad]),
        jnp.arange(s + TB, dtype=jnp.int32),
    ], s)
    b_t = jnp.flip(b_t, axis=0)

    n_a = jnp.sum(arena.valid, dtype=jnp.int32)
    n_s = jnp.sum(s_valid, dtype=jnp.int32)

    o_t, kstats = _merge_call_v3_multi(a_t, b_t, n_a, n_s, c, w, r,
                                       interpret)

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


def accumulate_pallas_v3(arena, spawn_keys, spawn_vals, spawn_ini,
                         origin_row: int = 0, dest_row: int = 0,
                         *, keep_mask=None, interpret: bool = False):
    """Drop-in for ``pallas_merge.accumulate_pallas`` via the v3 kernel.

    Same supported layouts (single row, or two-row power layout with
    origin=0/dest=1), same fused-compaction ``keep_mask`` semantics."""
    from fries_tpu.runtime import arena as arena_mod

    c, w = arena.keys.shape
    r = arena.n_vecs
    assert (r, origin_row, dest_row) in ((1, 0, 0), (2, 0, 1)), (
        "pallas accumulate supports (n_vecs, origin, dest) = (1,0,0)|(2,0,1)")
    assert dets.packable(w), "pallas accumulate needs packable det keys"
    s = spawn_keys.shape[0]

    # ---- encode arena stream (ascending, unique, sentinel padded) ----
    a_kh, a_kl = split_key(arena.keys)
    a_gh, a_gl = split_val(arena.vals[origin_row].astype(jnp.float64))
    if r == 2:
        a_dh, a_dl = split_val(arena.vals[dest_row].astype(jnp.float64))
    else:
        a_dh, a_dl = a_gh, a_gl
    pad = jnp.zeros((TB,), jnp.int32)
    sh, sl = split_key(dets.invalid_det(w)[None, :])

    if keep_mask is None:
        a_prot = jnp.ones((c,), jnp.int32)
    else:
        a_prot = keep_mask.astype(jnp.int32)

    def widen(cols, n):
        data = jnp.stack(cols, axis=1)
        return jnp.concatenate(
            [data, jnp.zeros((n + TB, NCOL - len(cols)), jnp.int32)],
            axis=1)

    a_t = widen([
        jnp.concatenate([a_kh, jnp.full((TB,), sh[0], jnp.int32)]),
        jnp.concatenate([a_kl, jnp.full((TB,), sl[0], jnp.int32)]),
        jnp.concatenate([_f2i(a_gh), pad]),
        jnp.concatenate([_f2i(a_gl), pad]),
        jnp.concatenate([_f2i(a_dh), pad]),
        jnp.concatenate([_f2i(a_dl), pad]),
        jnp.concatenate([a_prot, pad]),
    ], c)

    # ---- sort + encode spawn stream, then flip to descending ----
    skey = dets.pack_key(spawn_keys)
    skey_s, sval_s, sini_s = lax.sort(
        [skey, spawn_vals.astype(jnp.float64),
         spawn_ini.astype(jnp.int32)], num_keys=1, is_stable=True)
    s_kh = (skey_s >> jnp.int64(32)).astype(jnp.int32)
    s_kl = lax.bitcast_convert_type(
        (skey_s & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        ^ jnp.uint32(0x80000000), jnp.int32)
    s_vh, s_vl = split_val(sval_s)
    s_valid = ~((s_kh == sh[0]) & (s_kl == sl[0]))
    s_vh = jnp.where(s_valid, s_vh, 0.0)
    s_vl = jnp.where(s_valid, s_vl, 0.0)
    sini_s = jnp.where(s_valid, sini_s, 0)
    b_t = widen([
        jnp.concatenate([s_kh, jnp.full((TB,), sh[0], jnp.int32)]),
        jnp.concatenate([s_kl, jnp.full((TB,), sl[0], jnp.int32)]),
        jnp.concatenate([_f2i(s_vh), pad]),
        jnp.concatenate([_f2i(s_vl), pad]),
        jnp.concatenate([sini_s, pad]),
        jnp.arange(s + TB, dtype=jnp.int32),       # tie = ascending rank
    ], s)
    b_t = jnp.flip(b_t, axis=0)

    n_a = jnp.sum(arena.valid, dtype=jnp.int32)
    n_s = jnp.sum(s_valid, dtype=jnp.int32)

    o_t, kstats = _merge_call_v3(a_t, b_t, n_a, n_s, c, w, interpret)

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
