"""Native CISD trial-vector generation + gauge matching.

The reference prepares its trial wavefunctions externally with PySCF
(Input_Data/gen_ex_trials.py: CASCI/CISD states saved as det/val text
files); this module makes the framework self-sufficient: enumerate the
symmetry-restricted CISD determinant space, build the dense H block with
the existing exact-application kernels (ops/molecule.exact_offdiag_batch),
and Lanczos the ground state.

Orbital-phase gauge: any HF code fixes MO phases only up to ±1 per
orbital (and the cross-irrep phases are unobservable in hcore —
scf.match_reference).  ``orbital_phases`` recovers the per-spatial-orbital
sign vector between two CI vectors over the same det set by solving the
GF(2) linear system sum_{p singly-occ in D} x_p = [sign ratio of D], which
lets the reference's shipped CISD trials be transported into our gauge
(and conversely validates our ERIs entry-by-entry against vectors computed
from the reference's own lost eris.txt).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fries_tpu import dets, linalg
from fries_tpu.ops import molecule as mol


def enumerate_cisd(ham: mol.MolecularHamiltonian, target_irrep: int = 0):
    """Packed det words (N, W) of the CISD space of ``ham`` restricted to
    total irrep ``target_irrep`` (XOR product relative to closed shell),
    sorted in framework key order, HF determinant included."""
    n_orb, n_elec = ham.n_orb, ham.n_elec
    half = n_elec // 2
    symm = np.asarray(ham.symm)
    hf_occ = list(range(half)) + list(range(n_orb, n_orb + half))

    def occ_irrep(occ):
        g = 0
        for p in occ:
            g ^= int(symm[p % n_orb])
        return g

    base_irrep = occ_irrep(hf_occ)
    occs = []
    hf_set = set(hf_occ)
    virt = [p for p in range(2 * n_orb) if p not in hf_set]
    # singles
    for o in hf_occ:
        for u in virt:
            if (o < n_orb) != (u < n_orb):
                continue
            occ = sorted(hf_set - {o} | {u})
            if occ_irrep(occ) ^ base_irrep == target_irrep:
                occs.append(occ)
    # doubles
    ho = list(hf_occ)
    for i in range(n_elec):
        for j in range(i + 1, n_elec):
            o1, o2 = ho[i], ho[j]
            for ui, u1 in enumerate(virt):
                for u2 in virt[ui + 1:]:
                    ns_up = ((o1 < n_orb) + (o2 < n_orb)
                             - (u1 < n_orb) - (u2 < n_orb))
                    if ns_up != 0:
                        continue
                    occ = sorted(hf_set - {o1, o2} | {u1, u2})
                    if occ_irrep(occ) ^ base_irrep == target_irrep:
                        occs.append(occ)
    occs.insert(0, sorted(hf_occ))
    n_words = ham.n_words
    words = np.zeros((len(occs), n_words), np.uint32)
    for k, occ in enumerate(occs):
        for p in occ:
            words[k, p // 32] |= np.uint32(1 << (p % 32))
    # sort in framework arena order.  pack_key only fits 2*n_orb <= 62 bits
    # (dets.PACK_MAX_WORDS); wider systems (e.g. Ne/cc-pVQZ, 54 orbitals =
    # 4 words) sort lexicographically most-significant-word-first, matching
    # arena._sort_perm's multiword path — the packed shortcut silently
    # COLLIDED keys here and the paranoia-dedup then threw away most of the
    # CISD space (579 of ~18k dets survived, and the truncated-key spawn
    # matching produced a nonsensical H: CISD "below" FCI).
    if dets.packable(n_words):
        keys = np.asarray(dets.pack_key(jnp.asarray(words)))
        order = np.argsort(keys, kind="stable")
        words = words[order]
        keys = keys[order]
        keep = np.ones(len(keys), bool)
        keep[1:] = keys[1:] != keys[:-1]
        return words[keep]
    order = np.lexsort(tuple(words[:, w] for w in range(n_words)))
    words = words[order]
    keep = np.ones(len(words), bool)
    keep[1:] = np.any(words[1:] != words[:-1], axis=1)
    return words[keep]


def build_dense_h(ham: mol.MolecularHamiltonian, det_words, chunk=256):
    """Dense H matrix (N, N) over the determinant set, f64.

    Off-diagonals via exact_offdiag_batch; spawns landing outside the det
    set are discarded (CISD projection)."""
    det_words = np.asarray(det_words)
    n = det_words.shape[0]
    sorted_words = jnp.asarray(det_words)
    occ_all = dets.occ_list(jnp.asarray(det_words), ham.n_bits, ham.n_elec)
    tmpl = mol.ExcitationTemplate.build(ham.n_orb, ham.n_elec)

    @jax.jit
    def chunk_rows(words_c, occ_c):
        w, amp, _ = mol.exact_offdiag_batch(
            ham, tmpl, words_c, occ_c, jnp.ones((words_c.shape[0],)), 1.0)
        # multiword-safe lookup (pack_key collides beyond 62 bits)
        pos_c, hit = dets.lookup_dets(
            sorted_words, w.reshape(-1, ham.n_words))
        hit = hit & (amp.reshape(-1) != 0.0)
        cols = jnp.where(hit, pos_c, n)  # n = dump slot
        b = words_c.shape[0]
        rows = jnp.repeat(jnp.arange(b, dtype=jnp.int32),
                          amp.shape[1], total_repeat_length=cols.shape[0])
        out = jnp.zeros((b, n + 1))
        out = out.at[rows, cols].add(
            jnp.where(hit, amp.reshape(-1), 0.0))
        return out[:, :n]

    h = np.zeros((n, n))
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        wc = jnp.asarray(det_words[s:e])
        oc = occ_all[s:e]
        if e - s < chunk:  # pad to fixed shape for one compile
            pad = chunk - (e - s)
            wc = jnp.concatenate([wc, jnp.tile(wc[-1:], (pad, 1))])
            oc = jnp.concatenate([oc, jnp.tile(oc[-1:], (pad, 1))])
        h[s:e] += np.asarray(chunk_rows(wc, oc))[: e - s]
    diag = np.asarray(mol.diag_matrel(ham, occ_all))
    h[np.arange(n), np.arange(n)] = diag
    return h


def cisd_ground_state(ham: mol.MolecularHamiltonian, target_irrep: int = 0,
                      m: int = 120):
    """(e_cisd_corr, det_words, coeffs): the CISD ground state of ``ham``.

    e_cisd_corr is relative to the HF determinant's diagonal (the usual
    CISD correlation energy).  coeffs normalized, HF coefficient positive.
    """
    words = enumerate_cisd(ham, target_irrep)
    h = build_dense_h(ham, words)
    n = h.shape[0]
    # locate HF det
    hf = np.asarray(dets.hf_det(ham.n_orb, ham.n_elec))
    hf_idx = int(np.where((np.asarray(words) == hf).all(axis=1))[0][0])
    e_hf = h[hf_idx, hf_idx]
    hm = jnp.asarray(h - e_hf * np.eye(n))

    def matvec(v):
        return hm @ v

    v0 = np.zeros(n)
    v0[hf_idx] = 1.0
    e, vec = linalg.lanczos_ground_state(matvec, n, m=m, v0=v0)
    vec = np.asarray(vec)
    if vec[hf_idx] < 0:
        vec = -vec
    return float(e), np.asarray(words), vec


def orbital_phases(det_words, vals_a, vals_b, n_orb, thresh=1e-4):
    """Per-spatial-orbital sign vector s (±1, length n_orb) such that
    vals_b[D] ≈ vals_a[D] * prod_{p singly-occ in D} s_p, plus a global
    sign.  Returns (s, global_sign, n_equations, max_resid_mask) or raises
    if the GF(2) system is inconsistent.

    Orbitals never singly occupied in a significant det keep s=+1
    (unobservable)."""
    det_words = np.asarray(det_words)
    vals_a = np.asarray(vals_a)
    vals_b = np.asarray(vals_b)
    sig = (np.abs(vals_a) > thresh) & (np.abs(vals_b) > thresh)
    rows, rhs = [], []
    for k in np.where(sig)[0]:
        mask = 0
        occ = []
        for w in range(det_words.shape[1]):
            word = int(det_words[k, w])
            for bit in range(32):
                if word >> bit & 1:
                    occ.append(32 * w + bit)
        parities = np.zeros(n_orb, np.int8)
        for p in occ:
            parities[p % n_orb] ^= 1
        rows.append(parities)
        rhs.append(1 if vals_a[k] * vals_b[k] < 0 else 0)
    a = np.asarray(rows, np.int8)
    b = np.asarray(rhs, np.int8)
    # include a global-sign unknown
    a = np.concatenate([a, np.ones((len(b), 1), np.int8)], axis=1)
    nvar = n_orb + 1
    # GF(2) gaussian elimination
    a = a.copy() % 2
    b = b.copy() % 2
    pivots = {}
    r = 0
    for col in range(nvar):
        piv = None
        for rr in range(r, len(b)):
            if a[rr, col]:
                piv = rr
                break
        if piv is None:
            continue
        a[[r, piv]] = a[[piv, r]]
        b[[r, piv]] = b[[piv, r]]
        for rr in range(len(b)):
            if rr != r and a[rr, col]:
                a[rr] ^= a[r]
                b[rr] ^= b[r]
        pivots[col] = r
        r += 1
    # consistency: zero rows must have zero rhs
    for rr in range(r, len(b)):
        if b[rr] and not a[rr].any():
            raise RuntimeError("orbital-phase system inconsistent: the two "
                               "CI vectors differ beyond orbital sign gauge")
    x = np.zeros(nvar, np.int8)
    for col, rr in pivots.items():
        x[col] = b[rr]
    s = np.where(x[:n_orb] == 1, -1, 1).astype(np.int64)
    gsign = -1 if x[n_orb] else 1
    return s, gsign, len(b)


def apply_phases(det_words, vals, s, gsign=1):
    """Transport CI coefficients across the orbital-sign gauge ``s``."""
    det_words = np.asarray(det_words)
    n_orb = len(s)
    out = np.asarray(vals, float).copy() * gsign
    for k in range(len(out)):
        for w in range(det_words.shape[1]):
            word = int(det_words[k, w])
            for bit in range(32):
                if word >> bit & 1 and s[(32 * w + bit) % n_orb] < 0:
                    out[k] = -out[k]
    return out
