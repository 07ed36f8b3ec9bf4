"""Observable estimators for operators not commuting with H.

observables_mol.cpp: Rayleigh-quotient estimator with importance-sampled
compression - the iterate evolves by exact (1 - eps(H - e_ref)) multiplication
with systematic vector compression; on an alternating schedule
(burn-in | observable | free periods, observables_mol.cpp:230-244) the vector
is snapshotted (row 2) and O|v> computed (row 3, one_elec_op molecule.cpp:
222-252); during observable periods the compression is importance-weighted by
(1 + |O v|)^exponent around the compression (weight_vec, vec_utils.hpp:
569-573) and the estimator accumulates <v_t | O v_s> / <v_t | v_s> from
internal dots (observables_mol.cpp:281-290).

obs_repl_mol.cpp: replica-trick estimator - two independently-evolving
iterates v1, v2; observable = <v1 | O | v2> / <v1 | v2> each iteration
(obs_repl_mol.cpp:178, 238-240), removing the Rayleigh bias.

The observable is the spin-summed single excitation O = sum_s a^+_cre,s
a_des,s.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fries_tpu import compress, dets
from fries_tpu.ops import molecule as mol
from fries_tpu.runtime import arena as ar


@dataclass(frozen=True)
class ObservablesConfig:
    eps: float
    target_nonz: int
    capacity: int
    obs_des: int            # spatial orbital annihilated
    obs_cre: int            # spatial orbital created
    exponent: float = 0.5   # importance-sampling exponent
    burn_in: int = 100
    n_obs: int = 20         # observable-period length
    btw_obs: int = 20       # free-evolution period length
    replica: bool = False   # replica-trick estimator instead of Rayleigh
    # multi-chip: hash-sharded arena under shard_map
    axis_name: str | None = None
    n_shards: int = 1
    exchange_cap: int = 0


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ObsState:
    arena: ar.Arena
    key: jax.Array
    iterat: jax.Array


def build(ham: mol.MolecularHamiltonian, cfg: ObservablesConfig, seed: int,
          init_val: float = 100.0):
    hf_words, hf_occ, hf_en = mol.hf_reference(ham)
    n_orb, n_elec = ham.n_orb, ham.n_elec
    tmpl = mol.ExcitationTemplate.build(n_orb, n_elec)
    n_rows = 4
    axis = cfg.axis_name

    def gsum(x):
        return lax.psum(x, axis) if axis else x

    def route(sw, sv, ovf):
        # shard-route spawned contributions (Adder::perform_add)
        if not (axis and cfg.n_shards > 1):
            return sw, sv, ovf
        from fries_tpu.runtime import shard as sh

        cap = cfg.exchange_cap or max(1, 2 * sv.shape[0] // cfg.n_shards)
        tgt = sh.shard_of_words(sw, cfg.n_shards)
        rec, exch_ovf = sh.exchange(
            {"keys": sw, "amps": sv}, tgt, cfg.n_shards, cap, axis,
        )
        sw = rec["keys"]
        sv = jnp.where(~dets.is_invalid(sw), rec["amps"], 0.0)
        return sw, sv, ovf | exch_ovf

    def apply_one_elec(a: ar.Arena, src_row: int, dest_row: int):
        """dest_row <- O * src_row via arena accumulate."""
        vals = jnp.where(a.valid, a.vals[src_row], 0.0)
        spawns_w, spawns_v = [], []
        for spin in range(2):
            des = cfg.obs_des + spin * n_orb
            cre = cfg.obs_cre + spin * n_orb
            ok = dets.read_bit(a.keys, des) & ~dets.read_bit(a.keys, cre)
            nw, sign = dets.single_parity(a.keys, des, cre)
            amp = jnp.where(ok & (vals != 0), sign * vals, 0.0)
            spawns_w.append(jnp.where(
                (amp != 0)[:, None], nw, jnp.asarray(dets.invalid_det(ham.n_words))
            ))
            spawns_v.append(amp)
        sw = jnp.concatenate(spawns_w)
        sv = jnp.concatenate(spawns_v)
        sw, sv, ovf = route(sw, sv, jnp.bool_(False))
        a = ar.set_row(a, dest_row, jnp.zeros((a.capacity,)))
        a2, stats = ar.accumulate(
            a, sw, sv, jnp.ones(sv.shape, jnp.bool_),
            origin_row=src_row, dest_row=dest_row,
        )
        return a2, stats["overflow"] | ovf

    def h_multiply(a: ar.Arena, src_row: int, dest_row: int, key):
        """dest <- (1 - eps (H - e_ref)) src, exact; occ/diag recomputed
        from keys (no arena caches)."""
        vals = jnp.where(a.valid, a.vals[src_row], 0.0)
        arena_occ = dets.occ_list(a.keys, ham.n_bits, n_elec)
        arena_diag = mol.diag_matrel_chunked(ham, arena_occ) - hf_en
        w, amp, _ = mol.exact_offdiag_batch(
            ham, tmpl, a.keys, arena_occ, vals, -cfg.eps
        )
        fw = w.reshape(-1, ham.n_words)
        fa = amp.reshape(-1)
        fw, fa, _ = route(fw, fa, jnp.bool_(False))
        diag_part = vals * (1 - cfg.eps * arena_diag)
        a1 = ar.set_row(a, dest_row, diag_part)
        a2, stats = ar.accumulate(
            a1, fw, fa, jnp.ones(fa.shape, jnp.bool_),
            origin_row=src_row, dest_row=dest_row,
        )
        return a2, stats["overflow"]

    def internal_dot(a, r1, r2):
        return gsum(jnp.sum(
            jnp.where(a.valid, a.vals[r1] * a.vals[r2], 0.0)
        ))

    @jax.jit
    def step(state: ObsState):
        a = state.arena
        it = state.iterat
        key_iter = jax.random.fold_in(state.key, it)
        period = cfg.n_obs + cfg.btw_obs
        phase = jnp.maximum(it - cfg.burn_in, 0) % period
        in_obs = (it >= cfg.burn_in) & (phase < cfg.n_obs)
        at_obs_start = (it >= cfg.burn_in) & (phase == 0)

        if cfg.replica:
            # replica mode: rows 0 and 1 evolve independently; row 3 = O v2
            a, ovf0 = apply_one_elec(a, 1, 3)
            obs_num = internal_dot(a, 0, 3)
            obs_den = internal_dot(a, 0, 1)
            overflow = ovf0
        else:
            # Rayleigh mode: snapshot + O v at period start
            def snapshot(a):
                a1 = ar.set_row(a, 2, a.vals[0])
                a2, _ = apply_one_elec(a1, 0, 3)
                return a2

            # period-start updates (traced-conditional via cond)
            a = lax.cond(at_obs_start, snapshot, lambda x: x, a)
            obs_num = internal_dot(a, 0, 3)
            obs_den = internal_dot(a, 0, 2)
            overflow = jnp.bool_(False)

        # --- compression with importance weighting ---
        def compress_row(a, row, key, weighted):
            v = jnp.where(a.valid, a.vals[row], 0.0)
            wfac = (1.0 + jnp.abs(a.vals[3])) ** cfg.exponent
            v_w = jnp.where(weighted, v * wfac, v)
            keep, n_left, loc_norm = compress.find_preserve(
                jnp.abs(v_w), cfg.target_nonz, axis_name=axis
            )
            rn = jax.random.uniform(key, dtype=jnp.float64)
            cv = compress.sys_comp(
                v_w, keep, n_left, rn, loc_norm, axis_name=axis
            )
            cv = jnp.where(weighted, cv / wfac, cv)
            return ar.set_row(a, row, cv)

        a = compress_row(a, 0, jax.random.fold_in(key_iter, 1), in_obs)
        if cfg.replica:
            a = compress_row(a, 1, jax.random.fold_in(key_iter, 2), in_obs)

        # --- exact H multiplication + normalization ---
        a, ovf1 = h_multiply(a, 0, 0, key_iter)
        overflow |= ovf1
        if cfg.replica:
            a, ovf2 = h_multiply(a, 1, 1, key_iter)
            overflow |= ovf2
        norm = gsum(jnp.sum(jnp.abs(jnp.where(a.valid, a.vals[0], 0.0))))
        a = ar.set_row(a, 0, a.vals[0] / jnp.maximum(norm, 1e-300))
        if cfg.replica:
            norm2 = gsum(
                jnp.sum(jnp.abs(jnp.where(a.valid, a.vals[1], 0.0)))
            )
            a = ar.set_row(a, 1, a.vals[1] / jnp.maximum(norm2, 1e-300))

        any_nonzero = jnp.any(a.vals != 0, axis=0)
        a = ar.compact(a, any_nonzero)

        metrics = {
            "obs_num": obs_num,
            "obs_den": obs_den,
            "in_obs": in_obs,
            "norm": norm,
            "n_dets": gsum(a.n_used),
            "overflow": (
                gsum(overflow.astype(jnp.int32)) > 0 if axis else overflow
            ),
        }
        return ObsState(a, state.key, it + 1), metrics

    @partial(jax.jit, static_argnames=("n_iter",))
    def run_steps(state, n_iter: int):
        return lax.scan(lambda s, _: step(s), state, None, length=n_iter)

    a = ar.make(cfg.capacity, ham.n_words, n_rows)
    init_vals = np.zeros((n_rows, 1))
    init_vals[0, 0] = init_val
    if cfg.replica:
        init_vals[1, 0] = init_val
    a = ar.from_unsorted(a, hf_words[None], jnp.asarray(init_vals))
    state = ObsState(a, jax.random.key(seed), jnp.int32(0))
    aux = {"e_ref": hf_en}
    return step, run_steps, state, aux


def build_sharded(ham: mol.MolecularHamiltonian, cfg: ObservablesConfig,
                  seed: int, mesh, init_val: float = 100.0):
    """Hash-sharded observable estimators over a 1-D mesh (per-shard
    capacity)."""
    from fries_tpu import parallel
    from jax.sharding import PartitionSpec as P

    assert cfg.axis_name and cfg.n_shards == mesh.devices.size
    step, run_steps, state0, aux = build(ham, cfg, seed, init_val)
    a = state0.arena
    live = np.asarray(a.valid)
    gk, gv, gn = parallel.distribute_rows(
        np.asarray(a.keys)[live], np.asarray(a.vals)[:, live],
        cfg.n_shards, cfg.capacity,
    )
    st = ObsState(
        arena=ar.Arena(keys=gk, vals=gv, n_used=gn),
        key=state0.key, iterat=state0.iterat,
    )
    sspec = ObsState(
        arena=parallel.arena_spec(cfg.axis_name), key=P(), iterat=P()
    )
    mspec = {
        "obs_num": P(), "obs_den": P(), "in_obs": P(), "norm": P(),
        "n_dets": P(), "overflow": P(),
    }
    sharded_step = jax.jit(
        jax.shard_map(step, mesh=mesh, in_specs=(sspec,),
                      out_specs=(sspec, mspec), check_vma=False)
    )

    _cache: dict = {}

    def sharded_run(state, n_iter: int):
        # cached per n_iter - a fresh shard_map lambda per call is a new
        # jit cache key, i.e. a full recompile every invocation
        if n_iter not in _cache:
            _cache[n_iter] = jax.jit(
                jax.shard_map(
                    lambda s: run_steps(s, n_iter), mesh=mesh,
                    in_specs=(sspec,), out_specs=(sspec, mspec),
                    check_vma=False,
                )
            )
        return _cache[n_iter](state)

    return sharded_step, sharded_run, st, aux
