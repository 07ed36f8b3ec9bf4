"""Multi-state subspace iteration (FRIES_bin/subsp_mol.cpp): simultaneous
stochastic power iteration of n_trial vectors sharing one determinant index
set, with per-iteration trial-projected h/d matrices and periodic
QR-orthonormalization restarts.

Per iteration (subsp_mol.cpp:398-640):
  1. normalize each vector by its norm factor (adjust_shift2 controller,
     compress_utils.cpp:695-700);
  2. h_mat[i,j] = <trial_i |(H - e_ref)| v_j>, d_mat[i,j] = <trial_i | v_j>
     (recorded every iteration; energies come from the generalized
     eigenproblem of the averaged matrices, linalg.subspace_energies);
  3. every restart_int iterations recombine v_new = v_old @ R^-1 where
     QR(d - eps h) = Q R, then restore the per-vector norms (:480-510);
  4. per-row vector compression (find_preserve + systematic resampling; the
     reference's compress_vecs uses the pivotal variant - both unbiased);
     entries zero in every row are deleted;
  5. per-vector stochastically-compressed multiplication by
     1 - eps (H - e_ref) with the unnormalized HB-PP factorization and a
     norm-relative initiator threshold (:520-618).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fries_tpu import compress, dets
from fries_tpu.drivers import frisys
from fries_tpu.ops import heat_bath as hb
from fries_tpu.ops import molecule as mol
from fries_tpu.runtime import arena as ar


@dataclass(frozen=True)
class SubspaceConfig:
    eps: float
    n_trial: int
    vec_nonz: int           # per-vector compression budget
    matr_samp: int          # per-vector Hamiltonian budget
    capacity: int
    spawn_cap: int
    restart_int: int = 10
    init_thresh: float = 0.0
    shift_interval: int = 10
    shift_damping: float = 0.05
    unnorm: bool = True
    exact_h: bool = False   # exact H application (subspfull_mol.cpp)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SubspaceState:
    arena: ar.Arena
    norm_factors: jax.Array   # (T,)
    last_norms: jax.Array     # (T,)
    key: jax.Array
    iterat: jax.Array


def build(ham: mol.MolecularHamiltonian, cfg: SubspaceConfig,
          trial_keys, trial_vals, seed: int):
    """trial_keys: (T, Nt, W) determinants of each trial vector (sentinel-
    padded); trial_vals: (T, Nt).  The iterates start as the trial vectors
    (subsp_mol.cpp:197-235)."""
    t = cfg.n_trial
    syminfo = mol.SymmInfo.build(np.asarray(ham.symm))
    tens = hb.setup(ham)
    p_doub = frisys.hf_p_doub(ham, syminfo)
    hf_words, hf_occ, hf_en = mol.hf_reference(ham)
    n_orb, n_elec = ham.n_orb, ham.n_elec

    fcfg = frisys.FrisysConfig(
        eps=cfg.eps, vec_nonz=cfg.vec_nonz, matr_samp=cfg.matr_samp,
        capacity=cfg.capacity, spawn_cap=cfg.spawn_cap, unnorm=cfg.unnorm,
    )
    if cfg.exact_h:
        # subspfull_mol: exact (uncompressed) H application per vector
        tmpl_x = mol.ExcitationTemplate.build(ham.n_orb, ham.n_elec)

        def spawn(keys, occ, vals, h_fac, key, thresh=None):
            w, amp, nocc = mol.exact_offdiag_batch(
                ham, tmpl_x, keys, occ, vals, h_fac
            )
            fw = w.reshape(-1, ham.n_words)
            fa = amp.reshape(-1)
            fo = nocc.reshape(-1, ham.n_elec)
            fd = mol.diag_matrel_chunked(ham, fo) - hf_en
            fi = jnp.ones(fa.shape, jnp.bool_)
            return fw, fa, fo, fd, fi
    else:
        spawn = frisys.make_hbpp_spawner(ham, tens, syminfo, p_doub, fcfg, hf_en)

    # H * trial (exact) for the h_mat projections (subsp_mol.cpp:258-270)
    tmpl = mol.ExcitationTemplate.build(n_orb, n_elec)
    htrial_keys = []
    htrial_vals = []
    for j in range(t):
        tk = np.asarray(trial_keys[j])
        tv = np.asarray(trial_vals[j])
        live = tv != 0
        tk = tk[live]
        tv = tv[live]
        occ_j = dets.occ_list(jnp.asarray(tk), ham.n_bits, n_elec)
        w, amp, _ = mol.exact_offdiag_batch(
            ham, tmpl, jnp.asarray(tk), occ_j, jnp.asarray(tv), 1.0
        )
        w = np.asarray(w.reshape(-1, ham.n_words))
        amp = np.asarray(amp.reshape(-1))
        diag_j = np.asarray(mol.diag_matrel(ham, occ_j)) - float(hf_en)
        keys_all = np.concatenate([tk, w[amp != 0]])
        vals_all = np.concatenate([tv * diag_j, amp[amp != 0]])
        # merge duplicates
        merged = {}
        for kk, vv in zip(map(tuple, keys_all), vals_all):
            merged[kk] = merged.get(kk, 0.0) + vv
        htrial_keys.append(np.asarray(list(merged.keys()), np.uint32))
        htrial_vals.append(np.asarray(list(merged.values())))

    nh = max(len(v) for v in htrial_vals)
    h_keys = np.tile(np.asarray(dets.invalid_det(ham.n_words)), (t, nh, 1))
    h_vals = np.zeros((t, nh))
    for j in range(t):
        h_keys[j, : len(htrial_vals[j])] = htrial_keys[j]
        h_vals[j, : len(htrial_vals[j])] = htrial_vals[j]
    h_keys = jnp.asarray(h_keys)
    h_vals = jnp.asarray(h_vals)
    t_keys = jnp.asarray(trial_keys)
    t_vals = jnp.asarray(trial_vals)

    # initial arena: union of trial dets with each row = trial vector
    all_keys = np.asarray(trial_keys).reshape(-1, ham.n_words)
    uniq = {}
    for row in range(all_keys.shape[0]):
        kk = tuple(all_keys[row])
        if kk not in uniq and not all(x == 0xFFFFFFFF for x in kk):
            uniq[kk] = len(uniq)
    init_keys = np.asarray(list(uniq.keys()), np.uint32)
    init_vals = np.zeros((t, len(uniq)))
    for j in range(t):
        tk = np.asarray(trial_keys[j])
        tv = np.asarray(trial_vals[j])
        for r in range(tk.shape[0]):
            kk = tuple(tk[r])
            if kk in uniq:
                init_vals[j, uniq[kk]] += tv[r]
    init_occ = dets.occ_list(jnp.asarray(init_keys), ham.n_bits, n_elec)
    init_diag = mol.diag_matrel(ham, init_occ) - hf_en

    a = ar.make(cfg.capacity, ham.n_words, t, n_elec)
    a = ar.from_unsorted(a, jnp.asarray(init_keys), jnp.asarray(init_vals),
                         init_occ, init_diag)

    state = SubspaceState(
        arena=a,
        norm_factors=jnp.ones((t,)),
        last_norms=jnp.sum(jnp.abs(jnp.asarray(init_vals)), axis=1),
        key=jax.random.key(seed),
        iterat=jnp.int32(0),
    )

    @jax.jit
    def step(state: SubspaceState):
        a = state.arena
        key_iter = jax.random.fold_in(state.key, state.iterat)

        # ---- 1. normalize by the norm-factor controller ----
        norms = jnp.stack(
            [jnp.sum(jnp.abs(jnp.where(a.valid, a.vals[j], 0.0))) for j in range(t)]
        )
        do_shift = (state.iterat + 1) % cfg.shift_interval == 0
        nf_new, ln_new = compress.adjust_shift2(
            state.norm_factors, norms, state.last_norms, cfg.shift_damping
        )
        norm_factors = jnp.where(do_shift, nf_new, state.norm_factors)
        last_norms = jnp.where(do_shift, ln_new, state.last_norms)
        vals = a.vals / norm_factors[:, None]
        a = ar.Arena(a.keys, vals, a.occ, a.diag, a.n_used)

        # ---- 2. h/d projection matrices ----
        def dots(qkeys, qvals):
            pos, found = dets.lookup_dets(a.keys, qkeys.reshape(-1, ham.n_words))
            out = []
            for j in range(t):
                row = a.vals[j]
                g = jnp.where(found, row[pos], 0.0).reshape(qkeys.shape[0], -1)
                out.append(jnp.sum(g * qvals, axis=1))
            return jnp.stack(out, axis=1)  # (T_query, T_vec)

        d_mat = dots(t_keys, t_vals)
        h_mat = dots(h_keys, h_vals)

        # ---- 3. restart recombination ----
        do_restart = (state.iterat + 1) % cfg.restart_int == 0

        def restarted(vals):
            m = d_mat - cfg.eps * h_mat
            rinv = jnp.linalg.inv(jnp.linalg.qr(m)[1])
            new_vals = jnp.einsum("kj,kc->jc", rinv, vals)
            old_norms = jnp.stack([jnp.sum(jnp.abs(vals[j])) for j in range(t)])
            new_norms = jnp.stack(
                [jnp.sum(jnp.abs(new_vals[j])) for j in range(t)]
            )
            scale = old_norms / jnp.maximum(new_norms, 1e-300)
            return new_vals * scale[:, None]

        vals = jnp.where(do_restart, restarted(a.vals), a.vals)
        a = ar.Arena(a.keys, vals, a.occ, a.diag, a.n_used)

        # ---- 4. per-row compression ----
        comp_rows = []
        for j in range(t):
            vj = jnp.where(a.valid, a.vals[j], 0.0)
            keep, n_left, loc_norm = compress.find_preserve(
                jnp.abs(vj), cfg.vec_nonz
            )
            rn = jax.random.uniform(
                jax.random.fold_in(key_iter, 100 + j), dtype=jnp.float64
            )
            comp_rows.append(compress.sys_comp(vj, keep, n_left, rn, loc_norm))
        vals = jnp.stack(comp_rows)
        a = ar.Arena(a.keys, vals, a.occ, a.diag, a.n_used)
        any_nonzero = jnp.any(vals != 0, axis=0)
        a = ar.compact(a, any_nonzero)

        # ---- 5. per-vector stochastic multiplication ----
        all_words, all_amps, all_occ, all_diag, all_ini, all_rows = (
            [], [], [], [], [], []
        )
        norms_now = jnp.stack(
            [jnp.sum(jnp.abs(jnp.where(a.valid, a.vals[j], 0.0))) for j in range(t)]
        )
        overflow = jnp.bool_(False)
        for j in range(t):
            vj = jnp.where(a.valid, a.vals[j], 0.0)
            kj = jax.random.fold_in(key_iter, 200 + j)
            # norm-relative initiator threshold (subsp_mol.cpp:522-523):
            # init_thresh * ||v_j||_1 / matr_samp, recomputed per vector per
            # iteration (init_thresh=0 keeps every parent an initiator)
            thr_j = cfg.init_thresh * norms_now[j] / cfg.matr_samp
            w, amp, occ_s, diag_s, ini_j = spawn(
                a.keys, a.occ, vj, -cfg.eps, kj, thresh=thr_j
            )
            all_words.append(w)
            all_amps.append(amp)
            all_occ.append(occ_s)
            all_diag.append(diag_s)
            all_ini.append(ini_j)
            all_rows.append(jnp.full(amp.shape, j, jnp.int32))

        sw = jnp.concatenate(all_words)
        sa = jnp.concatenate(all_amps)
        so = jnp.concatenate(all_occ)
        sd = jnp.concatenate(all_diag)
        si = jnp.concatenate(all_ini)
        sr = jnp.concatenate(all_rows)

        # death on every row, then merge spawns
        death = 1 - cfg.eps * a.diag
        dvals = jnp.where(a.valid[None, :], a.vals * death[None, :], 0.0)
        a = ar.Arena(a.keys, dvals, a.occ, a.diag, a.n_used)
        a2, stats = ar.accumulate_multi(a, sw, sa, sr, so, sd, si)
        overflow |= stats["overflow"]

        metrics = {
            "h_mat": h_mat,
            "d_mat": d_mat,
            "norms": norms,
            "norm_factors": norm_factors,
            "n_dets": a2.n_used,
            "overflow": overflow,
        }
        return (
            SubspaceState(a2, norm_factors, last_norms, state.key, state.iterat + 1),
            metrics,
        )

    @partial(jax.jit, static_argnames=("n_iter",))
    def run_steps(state, n_iter: int):
        def body(s, _):
            return step(s)

        return lax.scan(body, state, None, length=n_iter)

    aux = {
        "e_ref": hf_en,
        "trial_keys": t_keys,
        "trial_vals": t_vals,
        "htrial_keys": h_keys,
        "htrial_vals": h_vals,
    }
    return step, run_steps, state, aux
