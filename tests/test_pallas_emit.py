"""Pallas comp_sub emission kernel vs the XLA output-slot inversion.

Runs the kernel in interpret mode on CPU (the Mosaic path is exercised on
TPU by the production spawner).  Discrete outputs (parent, sub) must match
the XLA path exactly except for paired-f32 grid-boundary flips
(probability ~1e-9/sample, see pallas_emit docstring): the comparisons
below demand >= 99.99% exact agreement plus exact agreement of every kept
emission, and mapped-back mass conservation for the rest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fries_tpu import compress


def _run_both(values, ndiv, w, mask, n_samp, rn, out_size):
    args = (jnp.asarray(values), jnp.asarray(ndiv, jnp.int32),
            jnp.asarray(w, jnp.float32), jnp.asarray(mask),
            n_samp, jnp.asarray(rn, jnp.float64), out_size)
    ref = compress.comp_sub(*args, pallas_emit=False)
    out = compress.comp_sub(*args, pallas_emit="interpret")
    return ref, out


def _check(ref, out, n_samp):
    rv, rp, rs, rn_, rof = ref
    ov, op, os_, on_, oof = out
    assert int(rn_) == int(on_)
    assert bool(rof) == bool(oof)
    rv, rp, rs = map(np.asarray, (rv, rp, rs))
    ov, op, os_ = map(np.asarray, (ov, op, os_))
    # parents must agree exactly (integer merge, no float rounding involved)
    np.testing.assert_array_equal(rp, op)
    same = (rs == os_)
    frac = same.mean() if same.size else 1.0
    assert frac >= 0.9999, f"sub agreement {frac}"
    # values agree wherever the discrete choice agreed
    np.testing.assert_allclose(ov[same], rv[same], rtol=1e-13, atol=1e-300)
    # total emitted mass agrees regardless of boundary flips
    np.testing.assert_allclose(ov.sum(), rv.sum(), rtol=1e-11)


def test_weighted_only():
    rng = np.random.default_rng(0)
    n, k, m = 3000, 14, 2048
    values = np.where(rng.random(n) < 0.7, rng.gamma(1.0, 1.0, n), 0.0)
    w = rng.random((n, k)) + 1e-6
    w /= w.sum(1, keepdims=True)
    ndiv = np.zeros(n, np.int32)
    ref, out = _run_both(values, ndiv, w, np.ones((n, k), bool),
                         1500, 0.3711, m)
    _check(ref, out, 1500)


def test_mixed_uniform_weighted():
    rng = np.random.default_rng(1)
    n, k, m = 2500, 9, 4096
    values = np.where(rng.random(n) < 0.8, rng.gamma(1.2, 1.0, n), 0.0)
    w = rng.random((n, k)) + 1e-6
    mask = rng.random((n, k)) < 0.8
    mask[:, 0] = True
    w = np.where(mask, w, 0.0)
    w /= w.sum(1, keepdims=True)
    ndiv = np.where(rng.random(n) < 0.4,
                    rng.integers(1, 17, n), 0).astype(np.int32)
    ref, out = _run_both(values, ndiv, w, mask, 3000, 0.0377, m)
    _check(ref, out, 3000)


def test_sparse_parents_exercise_chunk_loop():
    """Live parents separated by > window-size dead runs: the in-kernel
    chunk loop must walk multiple windows per slot tile."""
    rng = np.random.default_rng(2)
    n, k, m = 40_000, 5, 1024
    values = np.zeros(n)
    live = rng.choice(n, size=60, replace=False)
    values[live] = rng.gamma(2.0, 1.0, live.size) + 5.0
    w = rng.random((n, k)) + 1e-6
    w /= w.sum(1, keepdims=True)
    ndiv = np.zeros(n, np.int32)
    ref, out = _run_both(values, ndiv, w, np.ones((n, k), bool),
                         700, 0.9113, m)
    _check(ref, out, 700)


def test_heavy_parent_many_grid_hits():
    """One dominant parent soaks up most of the grid budget (slot runs much
    longer than a tile)."""
    rng = np.random.default_rng(3)
    n, k, m = 512, 7, 2048
    values = rng.random(n) * 1e-3
    values[17] = 50.0
    values[400] = 30.0
    w = rng.random((n, k)) + 1e-6
    w /= w.sum(1, keepdims=True)
    # suppress exact preservation so the big parents resample on the grid
    ref, out = _run_both(values * 1e-6, np.zeros(n, np.int32), w,
                         np.ones((n, k), bool), 1800, 0.5521, m)
    _check(ref, out, 1800)


def test_overflow_tail():
    """total > out_size: overflow flagged identically, valid prefix agrees."""
    rng = np.random.default_rng(4)
    n, k, m = 600, 6, 256   # out_size far below the budget
    values = rng.gamma(1.0, 1.0, n)
    w = rng.random((n, k)) + 1e-6
    w /= w.sum(1, keepdims=True)
    ref, out = _run_both(values, np.zeros(n, np.int32), w,
                         np.ones((n, k), bool), 900, 0.123, m)
    assert bool(ref[4]) and bool(out[4])
    _check(ref, out, 900)


def test_zero_budget():
    rng = np.random.default_rng(5)
    n, k, m = 300, 4, 512
    w = rng.random((n, k)) + 1e-6
    w /= w.sum(1, keepdims=True)
    ref, out = _run_both(np.zeros(n), np.zeros(n, np.int32), w,
                         np.ones((n, k), bool), 100, 0.7, m)
    _check(ref, out, 100)


def test_unbiasedness_mapped_back():
    """E[mapped-back Pallas output] == input masses (CLT bound)."""
    rng = np.random.default_rng(6)
    n, k = 400, 8
    values = rng.gamma(1.0, 1.0, n) * (rng.random(n) < 0.9)
    w = rng.random((n, k)) + 1e-6
    w /= w.sum(1, keepdims=True)
    mass = values[:, None] * w
    m = 1024
    n_rep = 64

    @jax.jit
    def one(rn):
        v, p, s, _, _ = compress.comp_sub(
            jnp.asarray(values), jnp.zeros(n, jnp.int32),
            jnp.asarray(w, jnp.float32), jnp.ones((n, k), bool),
            500, rn, m, pallas_emit="interpret",
        )
        acc = jnp.zeros((n, k))
        ok = p >= 0
        return acc.at[jnp.where(ok, p, 0), jnp.where(ok, s, 0)].add(
            jnp.where(ok, v, 0.0))

    rns = jax.random.uniform(jax.random.PRNGKey(0), (n_rep,),
                             dtype=jnp.float64)
    tot = np.zeros((n, k))
    for i in range(n_rep):
        tot += np.asarray(one(rns[i]))
    mean = tot / n_rep
    resid = mean - mass
    # systematic sampling at 500 samples over ~unit masses: the per-cell
    # spread is bounded by the grid unit; 5 sigma CLT envelope
    unit = mass.sum() / 500
    tol = 5 * unit / np.sqrt(n_rep)
    assert np.abs(resid).max() < max(tol, 1e-12), np.abs(resid).max()
