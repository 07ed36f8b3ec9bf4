"""Flagship frisys (HB-PP factorized FRI) tests.

The sharpest check: with compression budgets exceeding the number of sampling
paths, every comp_sub level keeps everything exactly and the five-level
factorization must reconstruct -eps * H_offdiag * v EXACTLY (the conditional
probabilities cancel against calc_norm_wt).  Then end-to-end energies vs
dense FCI, for both the normalized and unnormalized HB-PP distributions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu import dets
from fries_tpu.drivers import frisys
from fries_tpu.ops import heat_bath as hb
from fries_tpu.ops import molecule as mol


def build_ham(n_orb, n_elec, symm=None, seed=0):
    rng = np.random.default_rng(seed)
    h, eris = dense_fci.random_integrals(rng, n_orb)
    if symm is None:
        symm = np.zeros(n_orb, np.int32)
    # project out symmetry-violating integrals
    sp = symm[:, None] == symm[None, :]
    h = np.where(sp, h, 0.0)
    g = symm
    allowed = (
        g[:, None, None, None] ^ g[None, :, None, None]
        ^ g[None, None, :, None] ^ g[None, None, None, :]
    ) == 0
    eris = np.where(allowed, eris, 0.0)
    return mol.MolecularHamiltonian(
        hcore=jnp.asarray(h), eris=jnp.asarray(eris),
        symm=jnp.asarray(symm, jnp.int32), n_orb=n_orb, n_elec=n_elec,
    ), h, eris


def dense_spawn_map(ham, words, amps, n_bits):
    out = {}
    words = np.asarray(words)
    amps = np.asarray(amps)
    for i in range(len(amps)):
        if amps[i] == 0:
            continue
        mask = 0
        for b in range(n_bits):
            if (words[i, b // 32] >> (b % 32)) & 1:
                mask |= 1 << b
        out[mask] = out.get(mask, 0.0) + amps[i]
    return out


@pytest.mark.parametrize("unnorm", [False, True])
@pytest.mark.parametrize("with_symm", [False, True])
@pytest.mark.parametrize("fuse_cd", [True, False])
def test_hbpp_exact_when_budget_large(unnorm, with_symm, fuse_cd):
    n_orb, n_elec = 5, 4
    symm = np.array([0, 1, 0, 1, 0], np.int32) if with_symm else None
    ham, h, eris = build_ham(n_orb, n_elec, symm=symm, seed=4)
    syminfo = mol.SymmInfo.build(np.asarray(ham.symm))
    tens = hb.setup(ham)
    p_doub = frisys.hf_p_doub(ham, syminfo)

    # stage_f32=False: this test asserts f64-exact reconstruction; the f32
    # production default rounds kept stage values at ~1e-7 relative (checked
    # separately below)
    cfg = frisys.FrisysConfig(
        eps=0.01, vec_nonz=64, matr_samp=100000, capacity=8,
        spawn_cap=1024, unnorm=unnorm, stage_f32=False, fuse_cd=fuse_cd,
    )
    spawn = frisys.make_hbpp_spawner(ham, tens, syminfo, p_doub, cfg, e_ref=0.0)
    cfg32 = frisys.FrisysConfig(
        eps=0.01, vec_nonz=64, matr_samp=100000, capacity=8,
        spawn_cap=1024, unnorm=unnorm, stage_f32=True, emit_chunk=256,
        fuse_cd=fuse_cd,
    )
    spawn32 = frisys.make_hbpp_spawner(ham, tens, syminfo, p_doub, cfg32, e_ref=0.0)

    # a 3-determinant vector: HF + two excited dets
    hf_words, hf_occ, _ = mol.hf_reference(ham)
    d2, s2 = dets.double_parity(
        hf_words[None], jnp.asarray([0]), jnp.asarray([6]),
        jnp.asarray([3]), jnp.asarray([8]),
    )
    d3, s3 = dets.single_parity(hf_words[None], jnp.asarray([1]), jnp.asarray([3]))
    keys = jnp.concatenate([hf_words[None], d2, d3])
    if with_symm:
        keys = keys[:1]  # excited dets above may violate symmetry; HF only
    occ = dets.occ_list(keys, 2 * n_orb, n_elec)
    vals = jnp.asarray([1.0, -0.5, 0.25][: keys.shape[0]])

    from fries_tpu.runtime import arena as ar
    a = ar.make(cfg.capacity, ham.n_words, 1)
    a = ar.from_unsorted(a, keys, vals[None, :])
    avals = jnp.where(a.valid, a.vals[0], 0.0)

    w, amp, _ = jax.jit(spawn)(
        a.keys, avals, -cfg.eps, jax.random.key(0)
    )
    got = dense_spawn_map(ham, w, amp, 2 * n_orb)

    # exact reference
    tmpl = mol.ExcitationTemplate.build(n_orb, n_elec)
    aocc = dets.occ_list(a.keys, 2 * n_orb, n_elec)
    ew, ea, _ = mol.exact_offdiag_batch(ham, tmpl, a.keys, aocc, avals, -cfg.eps)
    want = dense_spawn_map(ham, ew.reshape(-1, ham.n_words), ea.reshape(-1), 2 * n_orb)

    all_keys = set(got) | set(want)
    for k in all_keys:
        np.testing.assert_allclose(
            got.get(k, 0.0), want.get(k, 0.0), rtol=1e-8, atol=1e-12,
            err_msg=f"unnorm={unnorm} with_symm={with_symm} det={k:x}",
        )

    # f32 stage rows + chunked emission: same set of excitations, values
    # within f32 rounding of exact
    w32, amp32, _ = jax.jit(spawn32)(
        a.keys, avals, -cfg.eps, jax.random.key(0)
    )
    got32 = dense_spawn_map(ham, w32, amp32, 2 * n_orb)
    for k in set(got32) | set(want):
        np.testing.assert_allclose(
            got32.get(k, 0.0), want.get(k, 0.0), rtol=3e-6, atol=1e-10,
            err_msg=f"f32 unnorm={unnorm} with_symm={with_symm} det={k:x}",
        )


@pytest.mark.parametrize("unnorm", [False, True])
@pytest.mark.parametrize("fuse_cd", [True, False])
def test_hbpp_unbiased_small_budget(unnorm, fuse_cd):
    """E[spawn] over many repetitions must equal -eps*H_offdiag*v."""
    n_orb, n_elec = 5, 4
    ham, h, eris = build_ham(n_orb, n_elec, seed=5)
    syminfo = mol.SymmInfo.build(np.asarray(ham.symm))
    tens = hb.setup(ham)
    p_doub = frisys.hf_p_doub(ham, syminfo)
    cfg = frisys.FrisysConfig(
        eps=0.01, vec_nonz=64, matr_samp=30, capacity=8,
        spawn_cap=512, unnorm=unnorm, fuse_cd=fuse_cd,
    )
    spawn = frisys.make_hbpp_spawner(ham, tens, syminfo, p_doub, cfg, e_ref=0.0)

    hf_words, hf_occ, _ = mol.hf_reference(ham)
    from fries_tpu.runtime import arena as ar
    a = ar.make(cfg.capacity, ham.n_words, 1)
    a = ar.from_unsorted(a, hf_words[None], jnp.asarray([[1.0]]))
    avals = jnp.where(a.valid, a.vals[0], 0.0)

    n_rep = 600
    keys = jax.random.split(jax.random.key(7), n_rep)
    w, amp, _ = jax.jit(
        jax.vmap(lambda k: spawn(a.keys, avals, -cfg.eps, k))
    )(keys)

    acc = {}
    w = np.asarray(w)
    amp = np.asarray(amp)
    for r in range(n_rep):
        m = dense_spawn_map(ham, w[r], amp[r], 2 * n_orb)
        for k, v in m.items():
            acc[k] = acc.get(k, 0.0) + v / n_rep

    tmpl = mol.ExcitationTemplate.build(n_orb, n_elec)
    aocc = dets.occ_list(a.keys, 2 * n_orb, n_elec)
    ew, ea, _ = mol.exact_offdiag_batch(ham, tmpl, a.keys, aocc, avals, -cfg.eps)
    want = dense_spawn_map(ham, ew.reshape(-1, ham.n_words), ea.reshape(-1), 2 * n_orb)

    tot_want = sum(abs(v) for v in want.values())
    err = 0.0
    for k in set(acc) | set(want):
        err = max(err, abs(acc.get(k, 0.0) - want.get(k, 0.0)))
    # stochastic tolerance: a few sigma of the per-element estimator noise
    assert err < 0.25 * tot_want / np.sqrt(n_rep), (err, tot_want)


def test_frisys_end_to_end_energy():
    ham, h, eris = build_ham(5, 4, seed=11)
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, 5, 2, 2)
    e0, _ = dense_fci.ground_state(dense_h)
    cfg = frisys.FrisysConfig(
        eps=0.05, vec_nonz=50, matr_samp=150, capacity=128,
        spawn_cap=512, target_norm=300.0,
    )
    step, run_steps, state, aux = frisys.build(ham, cfg, seed=2)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 2000,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[600:]
    den = np.asarray(traj["proj_den"])[600:]
    e_est = float(aux["e_ref"]) + num.sum() / den.sum()
    blocks = np.array_split(num, 10)
    dblocks = np.array_split(den, 10)
    bm = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = bm.std() / np.sqrt(len(bm))
    assert abs(e_est - e0) < max(5 * sigma, 0.03), (e_est, e0, sigma)


def test_semistochastic_full_space_is_exact():
    """With the deterministic subspace covering the whole Hilbert space the
    semistochastic driver is an exact power method."""
    ham, h, eris = build_ham(5, 4, seed=11)
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, 5, 2, 2)
    e0, _ = dense_fci.ground_state(dense_h)
    all_keys = np.stack([dense_fci.mask_to_words(m, 2 * ham.n_orb) for m in basis])
    determ = frisys.build_determ_block(ham, jnp.asarray(all_keys))
    cfg = frisys.FrisysConfig(
        eps=0.05, vec_nonz=128, matr_samp=determ["n_elements"] + 64,
        capacity=128, spawn_cap=256,
    )
    step, run_steps, state, aux = frisys.build(
        ham, cfg, seed=0, determ_keys=jnp.asarray(all_keys)
    )
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 400, aux["protected_keys"],
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    e_est = np.asarray(traj["proj_num"])[-1] / np.asarray(traj["proj_den"])[-1]
    np.testing.assert_allclose(float(aux["e_ref"]) + e_est, e0, atol=2e-4)


def test_semistochastic_partial_space_energy():
    """HF + singles/doubles-of-HF deterministic core, stochastic remainder."""
    ham, h, eris = build_ham(5, 4, seed=11)
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, 5, 2, 2)
    e0, _ = dense_fci.ground_state(dense_h)
    # choose the 20 lowest-diagonal determinants as the deterministic core
    order = np.argsort(np.diag(dense_h))[:20]
    dkeys = np.stack(
        [dense_fci.mask_to_words(basis[i], 2 * ham.n_orb) for i in order]
    )
    determ = frisys.build_determ_block(ham, jnp.asarray(dkeys))
    cfg = frisys.FrisysConfig(
        eps=0.05, vec_nonz=50, matr_samp=determ["n_elements"] + 120,
        capacity=128, spawn_cap=3000, target_norm=300.0,
    )
    step, run_steps, state, aux = frisys.build(
        ham, cfg, seed=7, determ_keys=jnp.asarray(dkeys)
    )
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 1500, aux["protected_keys"],
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[500:]
    den = np.asarray(traj["proj_den"])[500:]
    e_est = float(aux["e_ref"]) + num.sum() / den.sum()
    blocks = np.array_split(num, 10)
    dblocks = np.array_split(den, 10)
    bm = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = bm.std() / np.sqrt(len(bm))
    assert abs(e_est - e0) < max(5 * sigma, 0.02), (e_est, e0, sigma)


@pytest.mark.parametrize("dist", ["NU", "HB"])
def test_frimulti_end_to_end_energy(dist):
    from fries_tpu.drivers import frimulti

    ham, h, eris = build_ham(5, 4, seed=11)
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, 5, 2, 2)
    e0, _ = dense_fci.ground_state(dense_h)
    cfg = frimulti.FrimultiConfig(
        eps=0.05, vec_nonz=50, matr_samp=200, capacity=128, spawn_cap=512,
        target_norm=300.0, distribution=dist,
    )
    step, run_steps, state, aux = frimulti.build(ham, cfg, seed=6)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 2000,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[600:]
    den = np.asarray(traj["proj_den"])[600:]
    e_est = float(aux["e_ref"]) + num.sum() / den.sum()
    blocks = np.array_split(num, 10)
    dblocks = np.array_split(den, 10)
    bm = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = bm.std() / np.sqrt(len(bm))
    assert abs(e_est - e0) < max(5 * sigma, 0.03), (dist, e_est, e0, sigma)


def test_frisys_with_trial_vector_and_ini_vec():
    """Trial-vector estimator (frisys_mol.cpp:159-214) reduces variance and
    stays unbiased; initial vector loading reproduces the same fixed point."""
    ham, h, eris = build_ham(5, 4, seed=11)
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, 5, 2, 2)
    e0, psi0 = dense_fci.ground_state(dense_h)
    # trial = truncated exact ground state (like a CISD trial)
    top = np.argsort(-np.abs(psi0))[:10]
    tkeys = np.stack([dense_fci.mask_to_words(basis[i], 2 * ham.n_orb) for i in top])
    tvals = psi0[top]
    cfg = frisys.FrisysConfig(
        eps=0.05, vec_nonz=50, matr_samp=150, capacity=128,
        spawn_cap=512, target_norm=300.0,
    )
    step, run_steps, state, aux = frisys.build(
        ham, cfg, seed=9, trial=(tkeys, tvals),
        init_vec=(tkeys, 100 * tvals),
    )
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 1500,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[400:]
    den = np.asarray(traj["proj_den"])[400:]
    e_est = float(aux["e_ref"]) + num.sum() / den.sum()
    blocks = np.array_split(num, 10)
    dblocks = np.array_split(den, 10)
    bm = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = bm.std() / np.sqrt(len(bm))
    assert abs(e_est - e0) < max(5 * sigma, 0.02), (e_est, e0, sigma)


def test_spawn_rows_prefix_exact():
    """The prefix spawn bound (PowerConfig.spawn_rows) is bit-exact while
    the arena's OCCUPIED prefix (which, under the fused compaction, still
    holds the previous merge's dead rows until the next merge drops them)
    fits the bound - and must raise the overflow flag when it does not."""
    n_orb, n_elec = 5, 4
    ham, h, eris = build_ham(n_orb, n_elec, seed=9)

    def run(spawn_rows):
        cfg = frisys.FrisysConfig(
            eps=0.05, vec_nonz=24, matr_samp=200, capacity=256,
            spawn_cap=512, target_norm=50.0, spawn_rows=spawn_rows,
        )
        step, run_steps, state, aux = frisys.build(ham, cfg, seed=3)
        state, m = run_steps(
            state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"], 6)
        return np.asarray(m["proj_num"]), np.asarray(m["norm"]), \
            bool(np.asarray(m["overflow"]).any())

    full_num, full_norm, full_ovf = run(0)
    # full FCI dim is 100 for (5 orb, 4 elec): a 128-row bound always holds
    pre_num, pre_norm, pre_ovf = run(128)
    assert not full_ovf and not pre_ovf
    np.testing.assert_array_equal(full_num, pre_num)
    np.testing.assert_array_equal(full_norm, pre_norm)
    # a bound below the merged support must trip the loud overflow abort
    _, _, tight_ovf = run(64)
    assert tight_ovf
