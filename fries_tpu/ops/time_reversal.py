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
