"""Compression-kernel tests.

Covers the reference tests/test_compression.cpp (identity when budget >= nnz,
alias-method distribution) plus the statistical CLT harness pattern of
tests/clt/ (unbiasedness of every compression primitive), checked against
sequential numpy ports of the reference algorithms.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fries_tpu import compress


# ---------------------------------------------------------------------------
# sequential numpy port of the reference find_preserve greedy
# (FRIES/compress_utils.cpp:29-105) used as ground truth
# ---------------------------------------------------------------------------

def np_find_preserve(values, n_samp):
    absv = np.abs(values)
    keep = np.zeros(len(values), dtype=bool)
    order = np.argsort(-absv, kind="stable")
    remaining_norm = absv.sum()
    budget = n_samp
    for idx in order:
        if absv[idx] <= 0 or budget <= 0:
            break
        if absv[idx] >= remaining_norm / budget:
            keep[idx] = True
            remaining_norm -= absv[idx]
            budget -= 1
        else:
            break
    if remaining_norm < 1e-9:
        budget = 0
    return keep, budget, remaining_norm


def np_sys_comp(values, keep, n_samp, rn):
    """Sequential systematic resampling (FRIES/compress_utils.cpp:283-327)."""
    out = values.astype(np.float64).copy()
    absv = np.abs(values)
    glob_norm = absv[~keep & (absv > 0)].sum()
    if n_samp == 0:
        out[~keep] = 0.0
        return out
    unit = glob_norm / n_samp
    pos = rn * unit
    lbound = 0.0
    for i in range(len(values)):
        if keep[i] or values[i] == 0:
            if not keep[i]:
                out[i] = 0.0
            continue
        lbound += absv[i]
        if pos < lbound:
            out[i] = np.sign(values[i]) * unit
            pos += unit
        else:
            out[i] = 0.0
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(777)


def test_find_preserve_matches_sequential_greedy(rng):
    n = 200  # fixed shape: one XLA compilation for all trials
    for trial in range(20):
        n_active = rng.integers(5, 200)
        vals = rng.standard_normal(n) * 10 ** rng.uniform(-2, 2, size=n)
        vals[rng.random(n) < 0.2] = 0.0
        vals[n_active:] = 0.0
        n_samp = int(rng.integers(1, n_active + 5))
        keep, left, loc_norm = compress.find_preserve(
            jnp.abs(jnp.asarray(vals)), n_samp
        )
        want_keep, want_budget, want_norm = np_find_preserve(vals, n_samp)
        np.testing.assert_array_equal(np.asarray(keep), want_keep)
        assert int(left) == want_budget
        # decremental vs re-summed residual norms differ by float roundoff
        np.testing.assert_allclose(float(loc_norm), want_norm, atol=1e-9)


def test_compression_identity_when_budget_large(rng):
    # reference tests/test_compression.cpp:62-117: compression with
    # n_samp >= nnz must return the vector unchanged
    vals = rng.standard_normal(50)
    out = compress.compress_vector(jnp.asarray(vals), 50, jnp.asarray(0.3))
    np.testing.assert_allclose(np.asarray(out), vals, rtol=1e-12)
    out = compress.compress_vector(jnp.asarray(vals), 200, jnp.asarray(0.9))
    np.testing.assert_allclose(np.asarray(out), vals, rtol=1e-12)


def test_sys_comp_matches_sequential(rng):
    n = 100  # fixed shape: one XLA compilation for all trials
    for trial in range(10):
        n_active = int(rng.integers(10, 100))
        vals = rng.standard_normal(n)
        vals[n_active:] = 0.0
        n_samp = int(rng.integers(1, n_active))
        rn = float(rng.random())
        keep, left, loc_norm = compress.find_preserve(jnp.abs(jnp.asarray(vals)), n_samp)
        got = compress.sys_comp(
            jnp.asarray(vals), keep, left, jnp.asarray(rn), loc_norm
        )
        want = np_sys_comp(vals, np.asarray(keep), int(left), rn)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-12)


def test_sys_comp_unbiased(rng):
    """CLT harness: mean over repeated compressions converges to the input
    (pattern of tests/clt/main.cpp, SysStratified sampler)."""
    n = 40
    vals = rng.standard_normal(n)
    n_samp = 12
    n_rep = 3000
    keep, left, loc_norm = compress.find_preserve(jnp.abs(jnp.asarray(vals)), n_samp)
    rns = jax.random.uniform(jax.random.key(5), (n_rep,), dtype=jnp.float64)
    outs = jax.jit(
        jax.vmap(lambda r: compress.sys_comp(jnp.asarray(vals), keep, left, r, loc_norm))
    )(rns)
    mean = np.asarray(outs).mean(0)
    err = np.abs(mean - vals).max()
    # stochastic error ~ unit/sqrt(n_rep)
    unit = float(loc_norm) / int(left)
    assert err < 4 * unit / np.sqrt(n_rep)


def test_piv_comp_unbiased_and_count(rng):
    n = 30
    vals = rng.standard_normal(n)
    n_samp = 10
    keep, left, loc_norm = compress.find_preserve(jnp.abs(jnp.asarray(vals)), n_samp)
    keys = jax.random.split(jax.random.key(7), 2000)
    outs = jax.jit(
        jax.vmap(lambda k: compress.piv_comp_serial(k, jnp.asarray(vals), keep, left, loc_norm))
    )(keys)
    outs = np.asarray(outs)
    # each realization keeps exactly n_samp_left nonzeros among the resampled
    nonzero_counts = (np.abs(outs[:, ~np.asarray(keep)]) > 0).sum(1)
    assert np.all(np.abs(nonzero_counts - int(left)) <= 1)
    mean = outs.mean(0)
    unit = float(loc_norm) / int(left)
    assert np.abs(mean - vals).max() < 5 * unit / np.sqrt(2000)


def test_round_binomially_unbiased():
    key = jax.random.key(3)
    p = jnp.asarray([0.25, -1.75, 3.5, 0.0])
    n = jnp.asarray([4, 4, 2, 5])
    keys = jax.random.split(key, 4000)
    outs = jax.jit(jax.vmap(lambda k: compress.round_binomially(k, p, n)))(keys)
    mean = np.asarray(outs).mean(0)
    np.testing.assert_allclose(mean, np.asarray(p) * np.asarray(n), atol=0.1)


def test_alias_distribution(rng):
    # reference tests/test_compression.cpp:12-59
    probs = rng.random(7)
    probs /= probs.sum()
    aliases, alias_probs = compress.setup_alias(probs)
    samples = compress.sample_alias(jax.random.key(11), aliases, alias_probs, (40000,))
    counts = np.bincount(np.asarray(samples), minlength=7) / 40000
    np.testing.assert_allclose(counts, probs, atol=0.02)


def test_sample_categorical_rows(rng):
    probs = rng.random((5, 6))
    valid = rng.random((5, 6)) < 0.8
    valid[:, 0] = True
    p = np.where(valid, probs, 0)
    p = p / p.sum(1, keepdims=True)
    keys = jax.random.split(jax.random.key(2), 20000)
    draws = jax.jit(
        jax.vmap(lambda k: compress.sample_categorical_rows(k, jnp.asarray(probs), jnp.asarray(valid)))
    )(keys)
    draws = np.asarray(draws)
    for row in range(5):
        counts = np.bincount(draws[:, row], minlength=6) / 20000
        np.testing.assert_allclose(counts, p[row], atol=0.02)
        assert np.all(valid[row, np.unique(draws[:, row])])


# ---------------------------------------------------------------------------
# comp_sub: hierarchical compression
# ---------------------------------------------------------------------------

def _comp_sub_dense_mean(values, ndiv, sub_weights, sub_mask, n_samp, rns, out_size):
    """Mean reconstructed dense (parent, sub) mass over many runs (vmapped:
    one compilation on this single-core host)."""
    n, k = sub_weights.shape
    kmax = max(k, int(ndiv.max()) if len(ndiv) else k)

    def one(rn):
        out_val, out_parent, out_sub, n_out, overflow = compress.comp_sub(
            jnp.asarray(values),
            jnp.asarray(ndiv),
            jnp.asarray(sub_weights),
            jnp.asarray(sub_mask),
            n_samp,
            rn,
            out_size,
        )
        dense = jnp.zeros((n, kmax))
        m = out_parent >= 0
        dense = dense.at[
            jnp.where(m, out_parent, 0), jnp.where(m, out_sub, 0)
        ].add(jnp.where(m, out_val, 0.0))
        return dense, overflow

    dense, overflow = jax.jit(jax.vmap(one))(jnp.asarray(rns))
    assert not bool(jnp.any(overflow))
    return np.asarray(jnp.mean(dense, axis=0))


def test_comp_sub_identity_when_budget_large(rng):
    n, k = 6, 4
    values = rng.random(n) + 0.1
    sub_weights = rng.random((n, k))
    sub_mask = np.ones((n, k), dtype=bool)
    sub_weights /= sub_weights.sum(1, keepdims=True)
    ndiv = np.zeros(n, dtype=np.int32)
    ndiv[0] = 3  # one uniformly divided parent
    out_val, out_parent, out_sub, n_out, overflow = compress.comp_sub(
        jnp.asarray(values),
        jnp.asarray(ndiv),
        jnp.asarray(sub_weights),
        jnp.asarray(sub_mask),
        1000,
        jnp.asarray(0.5),
        64,
    )
    assert not bool(overflow)
    dense = np.zeros((n, k))
    ov, op, os = np.asarray(out_val), np.asarray(out_parent), np.asarray(out_sub)
    m = op >= 0
    np.add.at(dense, (op[m], os[m]), ov[m])
    want = values[:, None] * sub_weights
    want[0] = 0
    want[0, :3] = values[0] / 3
    np.testing.assert_allclose(dense, want, rtol=1e-10, atol=1e-12)


def test_comp_sub_unbiased(rng):
    n, k = 8, 5
    values = rng.random(n)
    values[2] = 0.0  # inactive parent
    sub_weights = rng.random((n, k))
    sub_mask = rng.random((n, k)) < 0.8
    sub_mask[:, 0] = True
    sub_weights = np.where(sub_mask, sub_weights, 0)
    sub_weights /= sub_weights.sum(1, keepdims=True)
    ndiv = np.zeros(n, dtype=np.int32)
    ndiv[5] = 4
    n_samp = 10
    rns = np.random.default_rng(1).random(4000)
    mean = _comp_sub_dense_mean(values, ndiv, sub_weights, sub_mask, n_samp, rns, 64)
    want = values[:, None] * sub_weights
    want[5] = 0
    want[5, :4] = values[5] / 4
    want[2] = 0
    np.testing.assert_allclose(mean[:, :k], want, atol=0.02)


def test_comp_sub_budget_respected(rng):
    n, k = 10, 6
    values = rng.random(n)
    sub_weights = rng.random((n, k))
    sub_mask = np.ones((n, k), bool)
    sub_weights /= sub_weights.sum(1, keepdims=True)
    ndiv = np.zeros(n, np.int32)
    n_samp = 7
    for rn in [0.01, 0.37, 0.99]:
        out_val, out_parent, out_sub, n_out, overflow = compress.comp_sub(
            jnp.asarray(values),
            jnp.asarray(ndiv),
            jnp.asarray(sub_weights),
            jnp.asarray(sub_mask),
            n_samp,
            jnp.asarray(rn),
            64,
        )
        assert int(n_out) <= n_samp + 1
        assert int(n_out) >= n_samp - 1


# ---------------------------------------------------------------------------
# shift controllers
# ---------------------------------------------------------------------------

def test_adjust_shift_semantics():
    # inactive until norm exceeds target (reference compress_utils.cpp:684-693)
    shift, last = compress.adjust_shift(
        jnp.asarray(0.0), jnp.asarray(5.0), jnp.asarray(0.0), 10.0, 0.05
    )
    assert float(shift) == 0.0 and float(last) == 0.0
    shift, last = compress.adjust_shift(
        jnp.asarray(0.0), jnp.asarray(15.0), jnp.asarray(0.0), 10.0, 0.05
    )
    assert float(shift) == 0.0 and float(last) == 15.0
    shift2, last2 = compress.adjust_shift(
        shift, jnp.asarray(18.0), last, 10.0, 0.05
    )
    np.testing.assert_allclose(float(shift2), -0.05 * np.log(18.0 / 15.0))
    assert float(last2) == 18.0


def test_piv_budget_sums_to_n_samp(rng):
    norms = jnp.asarray(rng.random(8) * 10)
    for trial in range(5):
        budgets = compress.piv_budget(jax.random.key(trial), norms, 100)
        assert int(jnp.sum(budgets)) == 100
    # proportionality
    many = np.stack([
        np.asarray(compress.piv_budget(jax.random.key(100 + t), norms, 100))
        for t in range(200)
    ])
    frac = many.mean(0) / 100
    np.testing.assert_allclose(frac, np.asarray(norms) / float(jnp.sum(norms)), atol=0.01)


def test_piv_select_tree_unbiased_and_count(rng):
    """Tree-pivotal selection: E[sel_i] = p_i, count in {floor, ceil}(sum p)."""
    n = 37
    p = rng.random(n) * 0.6
    p[rng.random(n) < 0.2] = 0.0
    pj = jnp.asarray(p)
    keys = jax.random.split(jax.random.key(11), 4000)
    sels = jax.jit(jax.vmap(lambda k: compress.piv_select_tree(k, pj)))(keys)
    sels = np.asarray(sels)
    tot = p.sum()
    counts = sels.sum(1)
    assert np.all((counts == np.floor(tot)) | (counts == np.ceil(tot)))
    mean = sels.mean(0)
    assert np.abs(mean - p).max() < 5 / np.sqrt(4000)


def test_piv_select_tree_2d_unbiased_and_count(rng):
    """Blocked (within-row then cross-row) tree-pivotal selection keeps the
    pivotal guarantees: E[sel] = p elementwise, count in {floor, ceil}(sum p),
    nothing with p == 0 selected, everything with p == 1 selected."""
    n, k = 23, 7
    p = rng.random((n, k)) * 0.5
    p[rng.random((n, k)) < 0.3] = 0.0
    p[0, 2] = 1.0
    pj = jnp.asarray(p)
    keys = jax.random.split(jax.random.key(19), 4000)
    sels = np.asarray(
        jax.jit(jax.vmap(lambda kk: compress.piv_select_tree_2d(kk, pj)))(keys)
    )
    tot = p.sum()
    counts = sels.reshape(4000, -1).sum(1)
    assert np.all((counts == np.floor(tot)) | (counts == np.ceil(tot)))
    assert not sels[:, p == 0.0].any()
    assert sels[:, 0, 2].all()
    mean = sels.mean(0)
    assert np.abs(mean - p).max() < 5 / np.sqrt(4000)


def test_piv_select_tree_2d_wide_rows(rng):
    """Rows wider than 32 columns exercise the multi-word bitfield marking."""
    n, k = 9, 50
    p = rng.random((n, k)) * 0.25
    pj = jnp.asarray(p)
    keys = jax.random.split(jax.random.key(23), 4000)
    sels = np.asarray(
        jax.jit(jax.vmap(lambda kk: compress.piv_select_tree_2d(kk, pj)))(keys)
    )
    tot = p.sum()
    counts = sels.reshape(4000, -1).sum(1)
    assert np.all((counts == np.floor(tot)) | (counts == np.ceil(tot)))
    mean = sels.mean(0)
    assert np.abs(mean - p).max() < 5 / np.sqrt(4000)


def test_piv_comp_full_pipeline_unbiased(rng):
    """piv_comp (find_preserve + capping + tree pivotal) is unbiased and
    respects the budget (reference piv_comp_parallel semantics)."""
    n = 50
    vals = rng.standard_normal(n)
    vals[rng.random(n) < 0.3] = 0.0
    n_samp = 14
    vj = jnp.asarray(vals)
    keys = jax.random.split(jax.random.key(13), 3000)
    outs = np.asarray(
        jax.jit(jax.vmap(lambda k: compress.piv_comp(k, vj, n_samp)))(keys)
    )
    nonz = (outs != 0).sum(1)
    assert np.all(nonz <= n_samp + 1)
    mean = outs.mean(0)
    assert np.abs(mean - vals).max() < 0.15


def test_piv_comp_identity_when_budget_large(rng):
    vals = rng.standard_normal(20)
    out = compress.piv_comp(jax.random.key(0), jnp.asarray(vals), 1000)
    np.testing.assert_allclose(np.asarray(out), vals, rtol=1e-12)


def test_multi_comp_unbiased(rng):
    """Multinomial compression (compress_vecs_multi, vec_utils.cpp:73-127):
    counts ~ Multinomial(n_samp, |v|/norm), E[out] = in."""
    n = 40
    vals = rng.standard_normal(n)
    n_samp = 12
    vj = jnp.asarray(vals)
    keep, left, loc_norm = compress.find_preserve(jnp.abs(vj), n_samp)
    keys = jax.random.split(jax.random.key(17), 3000)
    outs = np.asarray(
        jax.jit(
            jax.vmap(lambda k: compress.multi_comp(k, vj, keep, left, loc_norm))
        )(keys)
    )
    # total sampled count == budget in every realization
    unit = float(loc_norm) / int(left)
    counts = np.abs(outs[:, ~np.asarray(keep)]).sum(1) / unit
    np.testing.assert_allclose(counts, int(left), atol=1e-6)
    mean = outs.mean(0)
    assert np.abs(mean - vals).max() < 5 * unit / np.sqrt(3000)


@pytest.mark.parametrize("row_chunk", [0, 7])
@pytest.mark.parametrize("with_kill", [False, True])
@pytest.mark.parametrize("f32", [False, True])
def test_comp_sub_factored_matches_materialized(rng, row_chunk, with_kill, f32):
    """comp_sub_factored must emit the SAME compression as comp_sub over the
    materialized rank-1 joint (same budget, same systematic grid rn), for
    every (chunking, kill_b0, stage-dtype) combination.  f64 factors make
    the (values*a)*b vs values*(a*b) reassociation the only slack."""
    n, e_k, v_k = 23, 3, 4
    k = e_k * v_k
    values = rng.random(n) + 0.05
    values[4] = 0.0
    fa = rng.random((n, e_k))
    fb = rng.random((n, v_k))
    kill = (rng.random((n, e_k)) < 0.4) if with_kill else None
    ndiv = np.zeros(n, np.int32)
    ndiv[7] = 3  # one uniform parent rides the same stage
    ndiv[11] = 5

    dt = np.float32 if f32 else np.float64
    joint = (values[:, None, None].astype(dt) * fa[:, :, None].astype(dt)
             * fb[:, None, :].astype(dt))
    # comp_sub scales values internally; divide back out so its
    # values * sub_weights reproduces the factored (values*a)*b product order
    joint = joint.reshape(n, k)
    if with_kill:
        km = np.repeat(kill, v_k, axis=1) & (np.arange(k) % v_k == 0)[None, :]
        joint = np.where(km, 0.0, joint)
    sw = np.where(values[:, None] > 0, joint / np.maximum(values[:, None], 1e-300), 0.0)

    n_samp, rn, cap = 40, 0.37, 96
    got = compress.comp_sub_factored(
        jnp.asarray(values), jnp.asarray(ndiv),
        jnp.asarray(fa.astype(dt)), jnp.asarray(fb.astype(dt)),
        n_samp, jnp.asarray(rn), cap,
        kill_b0=jnp.asarray(kill) if with_kill else None,
        row_chunk=row_chunk,
    )
    want = compress.comp_sub(
        jnp.asarray(values), jnp.asarray(ndiv),
        jnp.asarray(sw.astype(dt)), jnp.asarray(sw > 0),
        n_samp, jnp.asarray(rn), cap,
    )
    for g, w, name in zip(got, want, ("val", "parent", "sub", "n", "ovf")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-6 if f32 else 1e-9,
            atol=1e-12, err_msg=f"{name} row_chunk={row_chunk}",
        )


def test_comp_sub_factored_unbiased(rng):
    """E[mapped-back output] == values * a (x) b over repetitions, chunked."""
    n, e_k, v_k = 12, 2, 3
    k = e_k * v_k
    values = rng.random(n)
    fa = rng.random((n, e_k))
    fb = rng.random((n, v_k))
    # normalize rows so the joint is a probability row (not required, but
    # keeps the comparison scale simple)
    fa /= fa.sum(1, keepdims=True)
    fb /= fb.sum(1, keepdims=True)
    ndiv = np.zeros(n, np.int32)
    ndiv[3] = 4
    want = values[:, None] * np.repeat(fa, v_k, 1) * np.tile(fb, (1, e_k))
    want[3] = 0.0
    want[3, :4] = values[3] / 4

    n_samp, cap = 10, 64
    n_rep = 4000
    rns = jax.random.uniform(jax.random.key(3), (n_rep,), dtype=jnp.float64)
    out = jax.jit(jax.vmap(lambda r: compress.comp_sub_factored(
        jnp.asarray(values), jnp.asarray(ndiv), jnp.asarray(fa),
        jnp.asarray(fb), n_samp, r, cap, row_chunk=5)[:3]))(rns)
    ov, op, os_ = (np.asarray(x) for x in out)
    dense = np.zeros((n, k))
    m = op >= 0
    np.add.at(dense, (op[m], os_[m]), ov[m] / n_rep)
    assert np.abs(dense - want).max() < 0.02
