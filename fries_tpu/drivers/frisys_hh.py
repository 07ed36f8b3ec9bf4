"""frisys_hh: systematic FRI with two-level factorized Hamiltonian
compression for the Hubbard-Holstein model (FRIES_bin/frisys_hh.cpp).

Factorization (frisys_hh.cpp:187-295): level 1 splits each determinant's
weight between the electron-hop channel (weight t) and the phonon channel
(weight g) with *unnormalized* sub-weights - comp_sub is linear in the
weights, so the surviving sample values approximate |v| * |H| directly;
level 2 divides each channel uniformly over its branches (hops: allowed
nearest-neighbor moves; phonons: 2 * n_elec (electron, raise/lower) pairs so
doubly-occupied sites naturally acquire the factor n_i), after multiplying
the value by the branch count (frisys_hh.cpp:208-219).  Finalization applies
the channel sign (-t hops) and sqrt(ph) phonon factors.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from fries_tpu import compress, dets, kernels
from fries_tpu.drivers import power
from fries_tpu.ops import hubbard as hub
from fries_tpu.runtime import arena as ar


@dataclass(frozen=True)
class FrisysHHConfig:
    eps: float
    vec_nonz: int
    matr_samp: int          # matrix budget (reference reuses vec_nonz)
    capacity: int
    spawn_cap: int
    init_thresh: float = 0.0
    target_norm: float = 0.0
    shift_interval: int = 10
    shift_damping: float = 0.05
    axis_name: str | None = None
    n_shards: int = 1
    exchange_cap: int = 0

    def power(self) -> power.PowerConfig:
        return power.PowerConfig(
            eps=self.eps,
            target_nonz=self.vec_nonz,
            capacity=self.capacity,
            init_thresh=self.init_thresh,
            target_norm=self.target_norm,
            shift_interval=self.shift_interval,
            shift_damping=self.shift_damping,
            axis_name=self.axis_name,
            n_shards=self.n_shards,
            exchange_cap=self.exchange_cap,
        )


def _rank_to_index(mask, rank):
    k = mask.shape[-1]
    cum = kernels.row_cumsum(mask).astype(jnp.int32) - 1
    hit = mask & (cum == rank[..., None])
    idx = jnp.sum(jnp.where(hit, jnp.arange(k, dtype=jnp.int32), 0), axis=-1)
    return jnp.where(jnp.any(hit, axis=-1), idx, k), jnp.any(hit, axis=-1)


def make_spawner(ham: hub.HubbardHolstein, cfg: FrisysHHConfig, e_ref):
    n = ham.n_sites
    n_elec = ham.n_elec
    s_cap = cfg.spawn_cap
    m_samp = cfg.matr_samp

    # static hop-candidate grid: (spin, bond, direction)
    froms, tos, spins = [], [], []
    for s in range(2):
        for i in range(n - 1):
            froms += [i, i + 1]
            tos += [i + 1, i]
            spins += [s, s]
    from_bit = jnp.asarray(np.asarray(froms, np.int32) + np.asarray(spins, np.int32) * n)
    to_bit = jnp.asarray(np.asarray(tos, np.int32) + np.asarray(spins, np.int32) * n)
    n_hop_cand = from_bit.shape[0]

    def spawn(keys, vals, h_fac, key):
        c = keys.shape[0]
        occ = hub.occ_list(ham, keys)
        absv = jnp.abs(vals)
        rns = jax.random.uniform(key, (2,), dtype=jnp.float64)

        # ---- level 1: electron vs phonon channel ----
        ndiv = jnp.zeros((c,), jnp.int32)
        subw = jnp.tile(jnp.asarray([[ham.t, ham.g]]), (c, 1))
        mask1 = jnp.ones((c, 2), bool)
        val, parent, sub, _, ovf1 = compress.comp_sub(
            absv, ndiv, subw, mask1, m_samp, rns[0], s_cap,
            axis_name=cfg.axis_name,
        )
        live = parent >= 0
        det_idx = jnp.where(live, parent, 0)
        is_ph = (sub == 1) & live

        # ---- level 2: uniform branch choice ----
        s_keys = keys[det_idx]
        hop_ok = dets.read_bit(s_keys[:, None, :], from_bit) & ~dets.read_bit(
            s_keys[:, None, :], to_bit
        )
        n_hops = jnp.sum(hop_ok, axis=-1).astype(jnp.int32)
        ndiv2 = jnp.where(is_ph, 2 * n_elec, jnp.maximum(n_hops, 1)).astype(jnp.int32)
        val2 = jnp.where(live & (is_ph | (n_hops > 0)), val * ndiv2, 0.0)
        val, parent, sub, _, ovf2 = compress.comp_sub(
            val2, ndiv2, jnp.zeros((s_cap, 1)), jnp.zeros((s_cap, 1), bool),
            m_samp, rns[1], s_cap, axis_name=cfg.axis_name,
        )
        live = parent >= 0
        pidx = jnp.where(live, parent, 0)
        det_idx = det_idx[pidx]
        is_ph = is_ph[pidx] & live
        branch = jnp.where(live, sub, 0)

        # ---- finalize ----
        s_keys = keys[det_idx]
        s_occ = occ[det_idx]
        sign = jnp.sign(vals[det_idx])

        # hops
        hop_ok = dets.read_bit(s_keys[:, None, :], from_bit) & ~dets.read_bit(
            s_keys[:, None, :], to_bit
        )
        hop_col, hop_found = _rank_to_index(hop_ok, branch)
        hf_bit = from_bit[jnp.clip(hop_col, 0, n_hop_cand - 1)]
        ht_bit = to_bit[jnp.clip(hop_col, 0, n_hop_cand - 1)]
        hop_words = dets.set_bit(dets.clear_bit(s_keys, hf_bit), ht_bit)
        hop_amp = jnp.where(
            (~is_ph) & live & hop_found, h_fac * (-1.0) * val * sign, 0.0
        )

        # phonons: branch = electron index + n_elec * (0=lower, 1=raise)
        ph_nums = hub.phonon_nums(ham, s_keys)
        elec = branch % n_elec
        raise_ = branch >= n_elec
        site = kernels.take_along_small(s_occ, elec) % n
        ph_at = kernels.take_along_small(ph_nums, site)
        ok_lower = ~raise_ & (ph_at > 0)
        ok_raise = raise_ & (ph_at + 1 <= ham.max_ph)
        ph_ok = is_ph & (ok_lower | ok_raise)
        new_num = jnp.clip(jnp.where(raise_, ph_at + 1, ph_at - 1), 0, ham.max_ph)
        ph_words = hub.with_phonon(ham, s_keys, site, new_num)
        sqrt_fac = jnp.sqrt(jnp.where(raise_, ph_at + 1, jnp.maximum(ph_at, 1)).astype(jnp.float64))
        ph_amp = jnp.where(ph_ok, h_fac * val * sign * sqrt_fac, 0.0)

        amps = jnp.where(is_ph, ph_amp, hop_amp)
        new_words = jnp.where(is_ph[:, None], ph_words, hop_words)
        new_words = jnp.where(
            (amps != 0)[:, None], new_words, jnp.asarray(dets.invalid_det(ham.n_words))
        )
        ini = jnp.abs(vals[det_idx]) >= cfg.init_thresh
        return new_words, amps, ini

    return spawn


def build(ham: hub.HubbardHolstein, e_ref: float, cfg: FrisysHHConfig,
          seed: int, init_val: float = 100.0):
    neel = dets.pack_bits(
        dets.neel_bits_1d(ham.n_sites, ham.n_elec, ham.n_bits), ham.n_words
    )

    spawn = make_spawner(ham, cfg, e_ref)

    def diag_fn(keys):
        return hub.diag_matrel(ham, keys) - e_ref

    step, run_steps = power.make_stepper(
        spawn, diag_fn, cfg.power(), estimator="direct"
    )

    a = ar.make(cfg.capacity, ham.n_words, 2)
    a = ar.from_unsorted(a, neel[None], jnp.asarray([[init_val], [0.0]]))
    state = power.fresh_state(a, seed)

    conn_keys, conn_mels = hub.reference_connections(ham, neel, e_ref)
    aux = {
        "e_ref": e_ref,
        "num_keys": conn_keys,
        "num_vals": conn_mels,
        "den_keys": neel[None],
        "den_vals": jnp.ones((1,)),
        "ref_key": neel,
        "neel": neel,
    }
    return step, run_steps, state, aux
