"""Time-reversal (spin-flip) symmetry folding.

For MS=0 systems the Hamiltonian commutes with the spin-flip operation T
(alpha <-> beta); the reference exploits this by folding determinants onto
spin-flip canonical representatives and propagating in the even (+1) or odd
(-1) sector (h_op_offdiag's adjust_tr lambda, molecule.cpp:298-378;
apply_HBPP_piv spin_parity, heat_bathPP.cpp:1326-1407; flip_spins
fci_utils.c:158-201; tr_doub_connect fci_utils.c:310-359).

Symmetrized basis: for i != T(i), |i;p> = (|i> + p |T(i)>)/sqrt(2); for
self-conjugate i, |i;+> = |i>.  A vector is stored on canonical
representatives (the lexicographically smaller of i and T(i)); matrix
elements between symmetrized states combine the direct and spin-flipped
excitations with sqrt(2)/2 norm factors and the parity p.

This module provides the batched canonicalization and the exact-H element
adjustment; samplers reuse ``adjust_exact`` on their sampled excitations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fries_tpu import dets
from fries_tpu.ops import molecule as mol


def flip(ham: mol.MolecularHamiltonian, words):
    return dets.flip_spins(words, ham.n_orb, ham.n_bits)


def canonicalize(ham: mol.MolecularHamiltonian, words, spin_parity: int):
    """(canonical_words, factor, self_conj): the smaller of (det, T det); the
    amplitude factor is spin_parity when the flip was applied (reference
    adjust_tr, molecule.cpp:368-377).
    """
    flipped = flip(ham, words)
    take_flip = dets.det_less(flipped, words)
    canon = jnp.where(take_flip[..., None], flipped, words)
    factor = jnp.where(take_flip, float(spin_parity), 1.0)
    self_conj = dets.det_eq(words, flipped)
    return canon, factor, self_conj


def _excitation_between(ham: mol.MolecularHamiltonian, from_words, to_words):
    """Identify the (<= double) excitation connecting two determinants.

    Returns dict(o1, o2, u1, u2, n_diff) with n_diff in {0, 1, 2, >2 ->
    marked 3}; o* occupied in ``from``, u* occupied in ``to`` (ascending).
    Replaces the SSE find_excitation (fci_utils.c:205-306) with unpacked-bit
    rank extraction.
    """
    fb = dets.unpack_bits(from_words, ham.n_bits)
    tb = dets.unpack_bits(to_words, ham.n_bits)
    removed = fb & ~tb
    added = tb & ~fb
    n_diff = jnp.sum(removed, axis=-1)
    o_pos = dets.occ_list_from_bits(removed, 2)   # (..., 2), pad = n_bits
    u_pos = dets.occ_list_from_bits(added, 2)
    return {
        "o1": o_pos[..., 0], "o2": o_pos[..., 1],
        "u1": u_pos[..., 0], "u2": u_pos[..., 1],
        "n_diff": n_diff,
    }


def _element_between(ham, from_words, from_occ, ex):
    """Sign-carrying H element for the excitation dict from
    :func:`_excitation_between` (0 if n_diff > 2 or symmetry-forbidden)."""
    n_orb = ham.n_orb
    nb = ham.n_bits
    o1 = jnp.clip(ex["o1"], 0, nb - 1)
    o2 = jnp.clip(ex["o2"], 0, nb - 1)
    u1 = jnp.clip(ex["u1"], 0, nb - 1)
    u2 = jnp.clip(ex["u2"], 0, nb - 1)

    sing_ok = ex["n_diff"] == 1
    sing_allowed = ham.symm[o1 % n_orb] == ham.symm[u1 % n_orb]
    smel = mol.sing_matr_el(ham, o1, u1, from_occ)
    _, ssign = dets.single_parity(from_words, o1, u1)

    doub_ok = ex["n_diff"] == 2
    doub_allowed = (
        ham.symm[o1 % n_orb] ^ ham.symm[o2 % n_orb]
        ^ ham.symm[u1 % n_orb] ^ ham.symm[u2 % n_orb]
    ) == 0
    dmel = mol.doub_matr_el(ham, o1, o2, u1, u2)
    _, dsign = dets.double_parity(from_words, o1, o2, u1, u2)

    # same-spin-count sanity: removed/added spins must match for a valid
    # excitation between same-MS determinants (guaranteed here)
    return jnp.where(
        sing_ok & sing_allowed, smel * ssign,
        jnp.where(doub_ok & doub_allowed, dmel * dsign, 0.0),
    )


def adjust_exact(ham: mol.MolecularHamiltonian, parent_words, parent_occ,
                 new_words, mel, spin_parity: int, scale=None):
    """Batched adjust_tr (molecule.cpp:298-378): fold an exact spawn
    (parent -> new, amplitude ``mel``) onto the symmetrized basis.

    The reference folds the *bare* matrix element before multiplying the
    parent amplitude and step factor (h_op_offdiag, molecule.cpp:394-420);
    when ``mel`` already carries that scaling, pass the per-row ``scale``
    (= value * h_fac) so the reverse-excitation element is scaled to match.

    Returns (target_words, adjusted_mel); dropped spawns get mel 0.
    """
    if scale is None:
        scale = jnp.ones(mel.shape, mel.dtype if hasattr(mel, "dtype") else jnp.float64)
    b = parent_words.shape[0] if parent_words.ndim > 1 else 1
    flipped_parent = flip(ham, parent_words)
    parent_self = dets.det_eq(parent_words, flipped_parent)
    norm = jnp.where(parent_self, jnp.sqrt(2.0), 1.0)

    flipped_new = flip(ham, new_words)
    # target equals the parent's conjugate: diagonal in the folded basis,
    # handled by the death step -> drop (molecule.cpp:309-312)
    drop_conj = dets.det_eq(flipped_new, parent_words)

    new_self = dets.det_eq(new_words, flipped_new)
    # self-conjugate target: both excitations coincide
    mel_self = jnp.where(spin_parity == -1, 0.0, 2.0 * mel)
    norm_self = norm * jnp.sqrt(2.0)

    # generic target: add the reverse (spin-flipped) excitation's element;
    # the norm doubles whenever the reverse excitation is symmetry-allowed
    # (two distinct excitations reach the folded target, molecule.cpp:326-365)
    ex = _excitation_between(ham, parent_words, flipped_new)
    n_orb = ham.n_orb
    o1c = jnp.clip(ex["o1"], 0, ham.n_bits - 1)
    u1c = jnp.clip(ex["u1"], 0, ham.n_bits - 1)
    o2c = jnp.clip(ex["o2"], 0, ham.n_bits - 1)
    u2c = jnp.clip(ex["u2"], 0, ham.n_bits - 1)
    rev_allowed = jnp.where(
        ex["n_diff"] == 1,
        ham.symm[o1c % n_orb] == ham.symm[u1c % n_orb],
        jnp.where(
            ex["n_diff"] == 2,
            (
                ham.symm[o1c % n_orb] ^ ham.symm[o2c % n_orb]
                ^ ham.symm[u1c % n_orb] ^ ham.symm[u2c % n_orb]
            )
            == 0,
            False,
        ),
    )
    rev_mel = _element_between(ham, parent_words, parent_occ, ex)
    mel_gen = mel + jnp.where(rev_allowed, rev_mel * spin_parity * scale, 0.0)
    norm_gen = norm * jnp.where(rev_allowed, 2.0, 1.0)

    mel_out = jnp.where(new_self, mel_self, mel_gen)
    norm_out = jnp.where(new_self, norm_self, norm_gen)

    take_flip = dets.det_less(flipped_new, new_words)
    target = jnp.where(take_flip[..., None], flipped_new, new_words)
    mel_out = jnp.where(take_flip, mel_out * spin_parity, mel_out)
    mel_out = mel_out / norm_out
    mel_out = jnp.where(drop_conj, 0.0, mel_out)
    return target, mel_out


def adjust_sampled(ham: mol.MolecularHamiltonian, tens, symm, counts,
                   n_occ_allowed, parent_words, parent_occ, occ_bits,
                   new_words, mel_signed, sel_w, spin_parity: int,
                   p_doub, unnorm: bool):
    """Fold a *sampled* excitation onto the time-reversal symmetrized basis
    (the spin_parity branch of apply_HBPP_piv, heat_bathPP.cpp:1326-1407).

    Unlike the exact fold, the stochastic estimator must also account for
    the reverse (spin-flipped) excitation being independently sampleable:
    the reference ADDS the reverse excitation's selection weight to
    ``tot_weight`` so either sampled path contributes the full folded
    element divided by the union probability.

    Args:
      tens: HeatBathTensors;  symm (n_orb,);  counts (B, 8, 2) unoccupied
        per (irrep, spin);  n_occ_allowed (B,) electrons with any single.
      new_words (B, W) sampled target; mel_signed (B,) signed H element;
      sel_w (B,) the direct selection weight (p_doub * tot for doubles,
        (1-p_doub)/(n_occ*n_virt) for singles).

    Returns (target_words, mel_out, w_out, keep): amp = value *
    mel_out / w_out for kept rows; target is the canonical representative.
    """
    from fries_tpu import kernels
    from fries_tpu.ops import heat_bath as hb

    n_orb = ham.n_orb
    flipped_parent = flip(ham, parent_words)
    parent_self = dets.det_eq(parent_words, flipped_parent)
    norm = jnp.where(parent_self, jnp.sqrt(2.0), 1.0)

    flipped_new = flip(ham, new_words)
    drop_conj = dets.det_eq(flipped_new, parent_words)
    new_self = dets.det_eq(new_words, flipped_new)

    # reverse excitation parent -> T(new)
    ex = _excitation_between(ham, parent_words, flipped_new)
    nb = ham.n_bits
    o1c = jnp.clip(ex["o1"], 0, nb - 1)
    o2c = jnp.clip(ex["o2"], 0, nb - 1)
    u1c = jnp.clip(ex["u1"], 0, nb - 1)
    u2c = jnp.clip(ex["u2"], 0, nb - 1)
    sym_o1 = kernels.take_small(symm, o1c % n_orb)
    sym_o2 = kernels.take_small(symm, o2c % n_orb)
    sym_u1 = kernels.take_small(symm, u1c % n_orb)
    sym_u2 = kernels.take_small(symm, u2c % n_orb)
    rev_sing = (ex["n_diff"] == 1) & (sym_o1 == sym_u1)
    rev_doub = (ex["n_diff"] == 2) & ((sym_o1 ^ sym_o2 ^ sym_u1 ^ sym_u2) == 0)
    rev_allowed = (rev_sing | rev_doub) & ~new_self

    rev_mel = _element_between(ham, parent_words, parent_occ, ex)

    # reverse selection weight under the same distribution
    if unnorm:
        rev_tot_d = hb.unnorm_weight(tens, n_orb, o1c, o2c, u1c, u2c)
    else:
        rev_tot_d = hb.norm_weight(
            tens, n_orb, ham.n_elec, symm, None, parent_occ, occ_bits,
            o1c, o2c, u1c, u2c,
        )
    key16 = sym_u1 * 2 + (o1c // n_orb)
    n_virt_rev = kernels.take_along_small(
        counts.reshape(counts.shape[0], 16)[:, None, :], key16[:, None]
    )[:, 0].astype(jnp.float64)
    rev_w_s = (1.0 - p_doub) / jnp.maximum(
        n_occ_allowed.astype(jnp.float64) * n_virt_rev, 1e-300
    )
    rev_w = jnp.where(rev_sing, rev_w_s, rev_tot_d * p_doub)

    mel_out = mel_signed + jnp.where(
        rev_allowed, rev_mel * float(spin_parity), 0.0
    )
    w_out = sel_w + jnp.where(rev_allowed, rev_w, 0.0)

    # self-conjugate target: both excitations coincide (x2 element, sqrt(2)
    # extra norm); forbidden in the odd sector
    mel_out = jnp.where(new_self, 2.0 * mel_signed, mel_out)
    norm = norm * jnp.where(new_self, jnp.sqrt(2.0), 1.0)
    keep = ~drop_conj & ~(new_self & (spin_parity == -1))

    take_flip = dets.det_less(flipped_new, new_words)
    target = jnp.where(take_flip[..., None], flipped_new, new_words)
    mel_out = jnp.where(take_flip, mel_out * float(spin_parity), mel_out)
    return target, mel_out / norm, w_out, keep


def tr_diag(ham: mol.MolecularHamiltonian, words, occ, spin_parity: int):
    """Folded-basis diagonal adjustment (subsp_mol.cpp:122-147):

      <i;p| H |i;p> = H_ii + p * <i|H|T(i)>   when i and T(i) are doubly
      connected (exactly one alpha/beta open-shell swap, tr_doub_connect
      fci_utils.c:310-359); self-conjugate determinants are zeroed in the odd
      sector (they do not exist there).

    Returns (delta, forbid): caller adds ``delta`` to the bare diagonal and
    masks determinants with ``forbid`` True (odd-sector self-conjugates).
    """
    n_orb = ham.n_orb
    half = ham.n_elec // 2
    alpha = occ[..., :half]                 # spatial (alpha spin orbitals)
    beta = occ[..., half:] - n_orb          # spatial
    in_beta = jnp.any(
        alpha[..., :, None] == beta[..., None, :], axis=-1
    )                                       # (..., half)
    in_alpha = jnp.any(
        beta[..., :, None] == alpha[..., None, :], axis=-1
    )
    n_open_a = jnp.sum(~in_beta, axis=-1)
    self_conj = n_open_a == 0
    doubly = n_open_a == 1

    # the unique open-shell spatials x (alpha-only) and y (beta-only)
    x = jnp.sum(jnp.where(~in_beta, alpha, 0), axis=-1)
    y = jnp.sum(jnp.where(~in_alpha, beta, 0), axis=-1)
    o1 = x
    o2 = y + n_orb
    u1 = y
    u2 = x + n_orb
    mel = mol.doub_matr_el(ham, o1, o2, u1, u2)
    _, sign = dets.double_parity(words, o1, o2, u1, u2)
    delta = jnp.where(doubly, spin_parity * mel * sign, 0.0)
    forbid = self_conj & (spin_parity == -1)
    return delta, forbid


def fold_vector_host(ham: mol.MolecularHamiltonian, keys, vals,
                     spin_parity: int):
    """Host-side folding of a sparse vector onto canonical representatives
    (subsp_mol.cpp:207-224): canonical = min(det, T det); amplitude picks up
    the parity when the flip is canonical and 1/sqrt(2) for non-self-
    conjugate entries; duplicate canonical keys merge.  Odd-sector
    self-conjugate entries are dropped (they do not exist in that sector).

    Returns (keys (M, W), vals (M,)) numpy arrays.
    """
    import numpy as np

    keys = np.asarray(keys)
    vals = np.asarray(vals, dtype=np.float64)
    live = vals != 0
    keys = keys[live]
    vals = vals[live]
    flipped = np.asarray(flip(ham, jnp.asarray(keys)))
    merged: dict = {}
    for i in range(keys.shape[0]):
        k = keys[i]
        f = flipped[i]
        cmp = 0
        for w in range(k.shape[0] - 1, -1, -1):
            if k[w] != f[w]:
                cmp = 1 if k[w] > f[w] else -1
                break
        v = vals[i]
        if cmp == 0:
            if spin_parity == -1:
                continue
            canon = k
        else:
            v /= np.sqrt(2.0)
            if cmp > 0:
                canon = f
                v *= spin_parity
            else:
                canon = k
        tk = tuple(int(x) for x in canon)
        merged[tk] = merged.get(tk, 0.0) + v
    if not merged:
        return (
            np.zeros((0, keys.shape[1]), np.uint32), np.zeros((0,), np.float64)
        )
    out_k = np.asarray(list(merged.keys()), np.uint32)
    out_v = np.asarray(list(merged.values()), np.float64)
    return out_k, out_v
