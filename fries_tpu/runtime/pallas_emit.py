"""Pallas comp_sub emission kernel (TPU).

Replaces :func:`fries_tpu.compress.comp_sub`'s XLA output-slot inversion
(``emit``; the batched form of the reference's per-sample emission loops in
FRIES/compression_utils branch of comp_sub, compress_utils.cpp:108-276) with
one sequential-grid kernel:

* **No sort**: the XLA path finds each output slot's parent with a
  sort-method searchsorted over ~N+M keys.  Here parent-of-slot is a linear
  merge: ``offsets`` (ascending) and the slot index (ascending) are walked
  together with a parent *pointer carried in SMEM across slot tiles* - the
  same two-pointer structure as :mod:`fries_tpu.runtime.pallas_merge`.
* **No HBM row gathers**: per-parent metadata and sub-weight rows are packed
  into one ``(N, NCOL)`` f32 table; each tile DMAs a *contiguous* parent
  window and selects per-slot rows with a one-hot MXU matmul (exact at
  ``Precision.HIGHEST``).
* All emission math runs lane-major ``(rows, T)`` in VMEM with the slot
  axis on the 128-lane dimension.

Numerics: every integer column (offsets, counts, grid starts) is an exact
small integer stored in f32 (validity gated on ``out_size <= 2**23``), so
compares and ranks are bit-exact vs the XLA path.  The f64 grid positions
(``(rn + g) * unit - cum_parent``) use paired-f32 (Knuth two-sum / Dekker
two-product) arithmetic, accurate to ~2^-46 relative - grid boundary
decisions can differ from the f64 path with probability ~1e-9 per sample,
which perturbs selection probabilities by the same relative amount (the
systematic-sampling estimator stays unbiased to that precision).  Keep
thresholds are made exact by pre-rounding them to f32 in the enclosing
direction (``w >= thr`` over f32 ``w`` equals ``w >= ceil32(thr)``).

Mosaic has no 64-bit types: the wrapper traces the kernel under
``jax.enable_x64(False)`` with all inputs pre-split to 32-bit, mirroring
``pallas_merge._merge_call``.
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

T = int(os.environ.get("FRIES_EMIT_TILE", "256"))   # slots per tile (lanes)
W = int(os.environ.get("FRIES_EMIT_WIN", "256"))    # parent rows per window
NCOL = 128                                          # packed row width
                                                    # (Mosaic DMA windows need
                                                    # 128-aligned lane dims; the
                                                    # lanes past _C_W0+K are dead)

# packed-column layout (lane index in the (N, NCOL) table)
_C_OFF = 0      # output-slot offset (exclusive cumsum of counts)
_C_KCNT = 1     # kept-emission count
_C_GS = 2       # first grid index landing in this parent
_C_NDIV = 3     # uniform subdivision count (0 = weighted)
_C_UNI = 4      # uniform flag
_C_CUMH = 5     # cumulative non-kept mass before parent (f32 pair)
_C_CUML = 6
_C_REMH = 7     # parent non-kept mass (f32 pair)
_C_REML = 8
_C_UH = 9       # values/ndiv kept value (f32 pair)
_C_UL = 10
_C_ONE = 11     # constant 1.0 (selection hit detector)
_C_W0 = 12      # sub-weight row starts here (K lanes)
MAX_K = NCOL - _C_W0

_SENTINEL = np.float32(2.0 ** 24)  # > any valid slot/offset, f32-exact


def force_mode() -> str:
    """FRIES_PALLAS_EMIT: '' auto, '0' off, '1' force-on, 'interpret'."""
    return os.environ.get("FRIES_PALLAS_EMIT", "")


def supported(k: int, out_size: int, cdtype) -> bool:
    """Static eligibility (the caller additionally checks the backend)."""
    if force_mode() == "0":
        return False
    return (
        cdtype == jnp.float32
        and k <= MAX_K
        and out_size <= (1 << 23)
    )


# ---------------------------------------------------------------------------
# paired-f32 helpers (Knuth two-sum / Dekker two-product); branch-free
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _dk_split(a):
    c = a * np.float32(4097.0)  # 2^12 + 1
    h = c - (c - a)
    return h, a - h


def _two_prod(a, b):
    p = a * b
    ah, al = _dk_split(a)
    bh, bl = _dk_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _pair_add(ah, al, bh, bl):
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    return _two_sum(s, e)


def _pair_mul(ah, al, bh, bl):
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return _two_sum(p, e)


def _pair_le(ah, al, bh, bl):
    dh, dl = _pair_add(ah, al, -bh, -bl)
    return (dh < 0) | ((dh == 0) & (dl <= 0))


def _split64(x):
    """f64 scalar/array -> (hi, lo) f32 pair (lo = 0 when hi is non-finite)."""
    hi = x.astype(jnp.float32)
    lo = jnp.where(
        jnp.isfinite(hi),
        (x - hi.astype(jnp.float64)).astype(jnp.float32),
        jnp.float32(0.0),
    )
    return hi, lo


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _make_kernel(k: int):
    def kernel(iscal, fscal, data_ref, o_ref,
               win, cnt_ref, sel_ref, ptr, sem):
        t = pl.program_id(0)
        total = iscal[0]
        max_start = iscal[1]           # n_pad - W

        @pl.when(t == 0)
        def _():
            ptr[0] = 0

        p0 = ptr[0]
        slot0 = t * T
        slot_r = slot0 + lax.broadcasted_iota(jnp.int32, (1, T), 1)  # (1, T)
        slot_f = slot_r.astype(jnp.float32)
        last_eff = jnp.minimum(
            jnp.float32(slot0 + T - 1),
            total.astype(jnp.float32) - 1.0,
        )
        sub_iota = lax.broadcasted_iota(jnp.int32, (W, 1), 0)        # (W, 1)

        cnt_ref[...] = jnp.zeros((1, T), jnp.int32)
        sel_ref[...] = jnp.zeros((NCOL, T), jnp.float32)

        def body(carry):
            _, step = carry
            start = jnp.minimum(p0 + step * W, max_start)
            cp = pltpu.make_async_copy(data_ref.at[pl.ds(start, W)], win, sem)
            cp.start()
            cp.wait()
            wb = win[...]                                   # (W, NCOL)
            offw = wb[:, _C_OFF:_C_OFF + 1]                 # (W, 1)
            cmp = offw <= slot_f                            # (W, T)
            cnt_c = jnp.sum(cmp.astype(jnp.int32), axis=0, keepdims=True)
            oh = (cmp & (sub_iota == (cnt_c - 1))).astype(jnp.float32)
            # (NCOL, T) selected rows; HIGHEST keeps f32 table values exact
            rows = lax.dot_general(
                wb, oh, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            has = rows[_C_ONE:_C_ONE + 1, :] > 0.5          # (1, T)
            sel_ref[...] = jnp.where(has, rows, sel_ref[...])
            cnt_ref[...] = cnt_ref[...] + cnt_c
            # continue while the window's last (ascending) offset still lies
            # inside this tile's live slot range.  Scalar VMEM read - a full
            # reduce here would lower through a jnp proxy OUTSIDE the
            # enable_x64(False) tracing scope and emit i64 converts Mosaic
            # rejects.
            more = win[W - 1, _C_OFF] <= last_eff
            return more, step + 1

        lax.while_loop(lambda c: c[0], body, (jnp.bool_(True), jnp.int32(0)))
        cnt = cnt_ref[...]
        sel = sel_ref[...]

        parent = p0 + cnt - 1                               # (1, T) i32
        # advance the pointer to the parent of the next tile's first slot
        ptr[0] = jnp.clip(p0 + cnt[0, T - 1] - 1, 0, max_start)

        # ---- emission math, all (rows, T) lane-major ----
        off = sel[_C_OFF:_C_OFF + 1, :]
        kcnt = sel[_C_KCNT:_C_KCNT + 1, :]
        gs = sel[_C_GS:_C_GS + 1, :]
        ndiv = sel[_C_NDIV:_C_NDIV + 1, :]
        uni = sel[_C_UNI:_C_UNI + 1, :] > 0.5
        cum_h = sel[_C_CUMH:_C_CUMH + 1, :]
        cum_l = sel[_C_CUML:_C_CUML + 1, :]
        rem_h = sel[_C_REMH:_C_REMH + 1, :]
        rem_l = sel[_C_REML:_C_REML + 1, :]
        u_h = sel[_C_UH:_C_UH + 1, :]
        u_l = sel[_C_UL:_C_UL + 1, :]

        r = slot_f - off                                    # exact ints
        is_kept = r < kcnt

        thr32 = fscal[4]
        wf32 = fscal[5]

        # grid position y = (rn + g) * unit - cum_parent, paired-f32
        g = gs + (r - kcnt)
        xh, xl = _two_sum(fscal[0], g)
        xl = xl + fscal[1]
        xh, xl = _pair_mul(xh, xl, fscal[2], fscal[3])
        yh, yl = _pair_add(xh, xl, -cum_h, -cum_l)

        # pass 1 over sub columns: kept rank/column/value, non-kept count,
        # grid-boundary count (inclusive pair cumsum of non-kept mass <= y)
        zero = jnp.zeros((1, T), jnp.float32)
        kacc = zero            # running kept count (exclusive)
        kcol = zero
        kval = zero
        nk_tot = zero          # total non-kept subs
        wt_cnt = zero          # boundaries passed by y
        ch = zero
        cl = zero
        for j in range(k):
            w_j = sel[_C_W0 + j:_C_W0 + j + 1, :]
            keep_j = (w_j > wf32) & (w_j >= thr32)
            hit_k = keep_j & (kacc == r)
            kcol = jnp.where(hit_k, jnp.float32(j), kcol)
            kval = jnp.where(hit_k, w_j, kval)
            kacc = kacc + keep_j.astype(jnp.float32)
            rem_j = jnp.where(keep_j, 0.0, w_j)
            live_j = rem_j > 0
            ch, cl = _pair_add(ch, cl, rem_j, zero)
            wt_cnt = wt_cnt + (
                _pair_le(ch, cl, yh, yl) & live_j
            ).astype(jnp.float32)
            nk_tot = nk_tot + live_j.astype(jnp.float32)

        wt_cl = jnp.minimum(wt_cnt, jnp.maximum(nk_tot - 1.0, 0.0))

        # pass 2: column of the wt_cl-th non-kept sub
        nk_acc = zero
        wcol = zero
        for j in range(k):
            w_j = sel[_C_W0 + j:_C_W0 + j + 1, :]
            keep_j = (w_j > wf32) & (w_j >= thr32)
            live_j = (~keep_j) & (w_j > 0)
            hit_w = live_j & (nk_acc == wt_cl)
            wcol = jnp.where(hit_w, jnp.float32(j), wcol)
            nk_acc = nk_acc + live_j.astype(jnp.float32)

        # uniform-parent grid sub-index
        q = jnp.floor(yh / jnp.maximum(rem_h, 1e-30) * ndiv)
        q = jnp.clip(q, 0.0, jnp.maximum(ndiv - 1.0, 0.0))

        sub = jnp.where(
            is_kept, jnp.where(uni, r, kcol), jnp.where(uni, q, wcol)
        )
        vh = jnp.where(uni, u_h, kval)
        vl = jnp.where(uni, u_l, zero)

        # pack the five per-slot outputs as rows of one (8, T) i32 block
        # (Mosaic requires the block's sublane dim divisible by 8; separate
        # (1, T) outputs are rejected)
        pad3 = jnp.zeros((3, T), jnp.int32)
        o_ref[0] = jnp.concatenate(
            [
                parent,
                is_kept.astype(jnp.int32),
                sub.astype(jnp.int32),
                pltpu.bitcast(vh, jnp.int32),
                pltpu.bitcast(vl, jnp.int32),
                pad3,
            ],
            axis=0,
        )

    return kernel


@partial(jax.jit, static_argnames=("out_size", "k", "interpret"))
def _emit_call(data, total, fscal, out_size, k, interpret):
    n_pad = data.shape[0]
    m_pad = -(-out_size // T) * T
    n_tiles = m_pad // T
    iscal = jnp.stack([
        total.astype(jnp.int32),
        jnp.int32(n_pad - W),
        jnp.int32(0),
        jnp.int32(0),
    ])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 8, T), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, NCOL), jnp.float32),
            pltpu.VMEM((1, T), jnp.int32),
            pltpu.VMEM((NCOL, T), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    with jax.enable_x64(False):
        packed = pl.pallas_call(
            _make_kernel(k),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, 8, T), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(iscal, fscal, data)[0]
    flat = lambda a: a.reshape(-1)[:out_size]
    f32 = lambda a: lax.bitcast_convert_type(a, jnp.float32)
    return (
        flat(packed[:, 0]), flat(packed[:, 1]), flat(packed[:, 2]),
        f32(flat(packed[:, 3])), f32(flat(packed[:, 4])),
    )


def emit(offsets, kept_counts, g_start, ndiv, uniform, w_sub,
         cum_parent, parent_rem, u_val, rn, unit, thr_f, w_floor,
         total, out_size, *, interpret: bool = False):
    """Pallas replacement for comp_sub's ``emit(jnp.arange(out_size))``.

    Args mirror the intermediates of :func:`fries_tpu.compress.comp_sub`;
    ``w_sub`` must be float32.  Returns ``(out_val, out_parent, out_sub)``
    matching the XLA path (modulo ~1e-9-probability grid-boundary
    rounding differences, see module docstring).
    """
    n, k = w_sub.shape
    assert k <= MAX_K

    cum_h, cum_l = _split64(cum_parent.astype(jnp.float64))
    rem_h, rem_l = _split64(parent_rem.astype(jnp.float64))
    u_h, u_l = _split64(u_val.astype(jnp.float64))

    cols = [
        offsets.astype(jnp.float32),
        kept_counts.astype(jnp.float32),
        g_start.astype(jnp.float32),
        ndiv.astype(jnp.float32),
        uniform.astype(jnp.float32),
        cum_h, cum_l, rem_h, rem_l, u_h, u_l,
        jnp.ones((n,), jnp.float32),
    ]
    data = jnp.concatenate(
        [jnp.stack(cols, axis=1), w_sub.astype(jnp.float32),
         jnp.zeros((n, NCOL - _C_W0 - k), jnp.float32)],
        axis=1,
    )
    pad = jnp.zeros((W, NCOL), jnp.float32)
    pad = pad.at[:, _C_OFF].set(_SENTINEL)
    pad = pad.at[:, _C_ONE].set(1.0)
    pad = pad.at[:, _C_REMH].set(1.0)
    data = jnp.concatenate([data, pad], axis=0)

    rn64 = jnp.asarray(rn, jnp.float64)
    unit64 = jnp.asarray(unit, jnp.float64)
    thr64 = jnp.asarray(thr_f, jnp.float64)
    wf64 = jnp.asarray(w_floor, jnp.float64)
    rn_h, rn_l = _split64(rn64)
    un_h, un_l = _split64(unit64)
    # enclosing-direction f32 thresholds: exact keep decisions over f32 w
    t32 = thr64.astype(jnp.float32)
    t32 = jnp.where(
        t32.astype(jnp.float64) < thr64,
        jnp.nextafter(t32, jnp.float32(np.inf)), t32,
    )
    f32c = wf64.astype(jnp.float32)
    wf32 = jnp.where(
        f32c.astype(jnp.float64) > wf64,
        jnp.nextafter(f32c, jnp.float32(-np.inf)), f32c,
    )
    fscal = jnp.stack([
        rn_h, rn_l, un_h, un_l, t32, wf32,
        jnp.float32(0.0), jnp.float32(0.0),
    ])

    par, kept, sub, vh, vl = _emit_call(
        data, jnp.asarray(total, jnp.int32), fscal, out_size, k, interpret
    )

    slot = jnp.arange(out_size, dtype=jnp.int32)
    valid = slot < total
    keptb = kept != 0
    kept_val = vh.astype(jnp.float64) + vl.astype(jnp.float64)
    out_val = jnp.where(
        valid, jnp.where(keptb, kept_val, unit64), 0.0
    )
    out_parent = jnp.where(valid, par, -1)
    out_sub = jnp.where(valid, sub, -1)
    return out_val, out_parent, out_sub
