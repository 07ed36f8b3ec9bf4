"""Near-uniform / heat-bath multinomial samplers and FCIQMC driver tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu import dets
from fries_tpu.drivers import fciqmc, frisys
from fries_tpu.ops import heat_bath as hb
from fries_tpu.ops import molecule as mol
from fries_tpu.ops import near_uniform as nu


def build_ham(n_orb, n_elec, symm=None, seed=0):
    rng = np.random.default_rng(seed)
    h, eris = dense_fci.random_integrals(rng, n_orb)
    if symm is None:
        symm = np.zeros(n_orb, np.int32)
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


def exact_column(ham, words, occ):
    tmpl = mol.ExcitationTemplate.build(ham.n_orb, ham.n_elec)
    ew, ea, _ = mol.exact_offdiag_batch(
        ham, tmpl, words, occ, jnp.ones(words.shape[0]), 1.0
    )
    out = {}
    ew = np.asarray(ew.reshape(-1, ham.n_words))
    ea = np.asarray(ea.reshape(-1))
    for i in range(len(ea)):
        if ea[i] == 0:
            continue
        key = tuple(ew[i])
        out[key] = out.get(key, 0.0) + ea[i]
    return out


@pytest.mark.parametrize("mode", ["NU", "HB"])
@pytest.mark.parametrize("with_symm", [False, True])
def test_sampler_unbiased(mode, with_symm):
    """E[mel/p_gen per attempt] must reconstruct the exact H column."""
    n_orb, n_elec = 5, 4
    symm = np.array([0, 1, 0, 1, 0], np.int32) if with_symm else None
    ham, _, _ = build_ham(n_orb, n_elec, symm=symm, seed=6)
    syminfo = mol.SymmInfo.build(np.asarray(ham.symm))
    lookup = jnp.asarray(syminfo.lookup)
    symm_j = jnp.asarray(syminfo.symm)
    counts_j = jnp.asarray(syminfo.counts)
    tens = hb.setup(ham)

    hf_words, hf_occ, _ = mol.hf_reference(ham)
    b = 4096  # attempts per batch
    words = jnp.tile(hf_words[None], (b, 1))
    occ = jnp.tile(hf_occ[None], (b, 1))
    bits = dets.unpack_bits(words, 2 * n_orb)
    counts = hb.unocc_symm_counts(n_orb, n_elec, symm_j, counts_j, occ)

    n_batches = 40

    def one_batch(key):
        kd, ks = jax.random.split(key)
        if mode == "HB":
            d = nu.sample_doubles_heat_bath(
                kd, tens, n_orb, n_elec, symm_j, lookup, occ, bits
            )
        else:
            d = nu.sample_doubles(
                kd, n_orb, n_elec, symm_j, lookup, occ, bits, counts
            )
        s = nu.sample_singles(ks, n_orb, n_elec, symm_j, lookup, occ, bits, counts)
        dmel = mol.doub_matr_el(ham, d["o1"], d["o2"], d["u1"], d["u2"])
        dw, dsign = dets.double_parity(words, d["o1"], d["o2"], d["u1"], d["u2"])
        damp = jnp.where(d["valid"], dmel * dsign / d["prob"], 0.0)
        smel = mol.sing_matr_el(ham, s["o"], s["u"], occ)
        sw, ssign = dets.single_parity(words, s["o"], s["u"])
        samp = jnp.where(s["valid"], smel * ssign / s["prob"], 0.0)
        return dw, damp, sw, samp

    keys = jax.random.split(jax.random.key(3), n_batches)
    dw, damp, sw, samp = jax.jit(jax.vmap(one_batch))(keys)
    dw = np.asarray(dw.reshape(-1, ham.n_words))
    damp = np.asarray(damp.reshape(-1))
    sw = np.asarray(sw.reshape(-1, ham.n_words))
    samp = np.asarray(samp.reshape(-1))

    acc = {}
    n_att = n_batches * b
    for w_arr, a_arr in ((dw, damp), (sw, samp)):
        for i in range(len(a_arr)):
            if a_arr[i] == 0:
                continue
            acc[tuple(w_arr[i])] = acc.get(tuple(w_arr[i]), 0.0) + a_arr[i] / n_att

    want = exact_column(ham, hf_words[None], hf_occ[None])
    # split exact column into singles/doubles magnitudes for tolerance
    tot = sum(abs(v) for v in want.values())
    for k in set(acc) | set(want):
        got = acc.get(k, 0.0)
        expect = want.get(k, 0.0)
        assert abs(got - expect) < 0.12 * max(tot / 20, abs(expect)), (
            mode, with_symm, k, got, expect,
        )


def test_fciqmc_end_to_end_energy():
    ham, h, eris = build_ham(5, 4, seed=13)
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, 5, 2, 2)
    e0, _ = dense_fci.ground_state(dense_h)
    cfg = fciqmc.FciqmcConfig(
        eps=0.02, target_walkers=1500.0, capacity=256, attempt_cap=16384,
        init_thresh=0.0, distribution="NU", shift_damping=0.25,
    )
    step, run_steps, state, aux = fciqmc.build(ham, cfg, seed=4, init_walkers=1000)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 3000,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[1000:]
    den = np.asarray(traj["proj_den"])[1000:]
    e_est = float(aux["e_ref"]) + num.sum() / den.sum()
    blocks = np.array_split(num, 10)
    dblocks = np.array_split(den, 10)
    bm = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = bm.std() / np.sqrt(len(bm))
    assert abs(e_est - e0) < max(5 * sigma, 0.05), (e_est, e0, sigma)


def test_fciqmc_fp_variant_runs():
    ham, _, _ = build_ham(5, 4, seed=13)
    cfg = fciqmc.FciqmcConfig(
        eps=0.02, target_walkers=500.0, capacity=256, attempt_cap=4096,
        distribution="HB", integer_walkers=False,
    )
    step, run_steps, state, aux = fciqmc.build(ham, cfg, seed=5, init_walkers=50)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 200,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    assert np.isfinite(np.asarray(traj["norm"])).all()
    assert np.asarray(traj["norm"])[-1] > 0


def test_fciqmc_spawn_cap_compaction_identical():
    """Compacting attempt outputs into a bounded spawn buffer happens after
    all sampling, so (when nothing overflows) the trajectory is bit-identical
    to the uncompacted path."""
    ham, _, _ = build_ham(5, 4, seed=13)
    base = dict(
        eps=0.02, target_walkers=1500.0, capacity=256, attempt_cap=16384,
        init_thresh=0.0, distribution="NU", shift_damping=0.25,
    )
    cfg_a = fciqmc.FciqmcConfig(**base)
    cfg_b = fciqmc.FciqmcConfig(**base, spawn_cap=2048)
    out = []
    for cfg in (cfg_a, cfg_b):
        step, run_steps, state, aux = fciqmc.build(
            ham, cfg, seed=4, init_walkers=1000
        )
        state, traj = run_steps(
            state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"], 60,
        )
        assert not bool(np.asarray(traj["overflow"]).any())
        out.append(traj)
    np.testing.assert_array_equal(
        np.asarray(out[0]["norm"]), np.asarray(out[1]["norm"])
    )
    np.testing.assert_array_equal(
        np.asarray(out[0]["proj_num"]), np.asarray(out[1]["proj_num"])
    )
    np.testing.assert_array_equal(
        np.asarray(out[0]["n_dets"]), np.asarray(out[1]["n_dets"])
    )
