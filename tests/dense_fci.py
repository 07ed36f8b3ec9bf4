"""Independent dense-FCI reference implementation (pure numpy).

Deliberately built from raw second quantization - literal creation /
annihilation operators on occupation-number bitmasks - so it shares no code or
formulation with the Slater-Condon rules in fries_tpu.ops.molecule.  Used to
validate matrix elements, exact H application, and stochastic driver energies
on small synthetic systems (the bundled reference inputs ship no ERIs, so
correctness is anchored to exact diagonalization instead).

Hamiltonian (physicist notation <pq|rs>):
    H = sum_{pq,s} h[p,q] c+_{p,s} c_{q,s}
      + 1/2 sum_{pqrs,st} <pq|rs> c+_{p,s} c+_{q,t} c_{s',t} c_{r,s'} ...

with spin orbitals indexed p + n_orb * spin, matching the bit layout of
fries_tpu.dets.
"""

from itertools import combinations

import numpy as np


def random_integrals(rng, n_orb, scale_two=0.2, diag_spread=2.0):
    """Random Hermitian one-body + 8-fold-symmetric two-body integrals.

    Returns (hcore (n,n), eris_phys (n,n,n,n)) with eris in physicist
    notation; diagonally dominant so the aufbau determinant is a good
    reference (molecule-like spectrum).
    """
    h = rng.standard_normal((n_orb, n_orb)) * 0.1
    h = (h + h.T) / 2
    h += np.diag(np.linspace(-diag_spread, diag_spread, n_orb))
    v_chem = rng.standard_normal((n_orb,) * 4) * scale_two
    # chemist-notation 8-fold symmetry: (ij|kl) = (ji|lk)* = (kl|ij) ...
    v = np.zeros_like(v_chem)
    for perm in [
        (0, 1, 2, 3), (1, 0, 3, 2), (2, 3, 0, 1), (3, 2, 1, 0),
        (1, 0, 2, 3), (0, 1, 3, 2), (3, 2, 0, 1), (2, 3, 1, 0),
    ]:
        v += np.transpose(v_chem, perm)
    v /= 8.0
    # physicist <pq|rs> = chemist (pr|qs)
    eris_phys = np.transpose(v, (0, 2, 1, 3))
    return h, eris_phys


def spin_basis(n_orb, n_alpha, n_beta):
    """All determinants as python-int bitmasks (alpha bits 0..n-1, beta n..2n-1),
    ordered with alpha-major lexicographic masks."""
    alphas = [sum(1 << o for o in c) for c in combinations(range(n_orb), n_alpha)]
    betas = [sum(1 << o for o in c) for c in combinations(range(n_orb), n_beta)]
    return [a | (b << n_orb) for a in alphas for b in betas]


def _sign_count(mask, p):
    """(-1)^{number of set bits below p}."""
    below = mask & ((1 << p) - 1)
    return -1 if bin(below).count("1") % 2 else 1


def annihilate(mask, p):
    if not (mask >> p) & 1:
        return None, 0
    return mask & ~(1 << p), _sign_count(mask, p)


def create(mask, p):
    if (mask >> p) & 1:
        return None, 0
    return mask | (1 << p), _sign_count(mask, p)


def build_hamiltonian(hcore, eris_phys, n_orb, n_alpha, n_beta, frozen=0):
    """Dense FCI Hamiltonian over the active space by literal operator
    application.  ``frozen`` spatial orbitals are doubly occupied and folded
    into an effective one-body term and core energy.

    Returns (H (D, D), basis list of bitmasks).
    """
    t = hcore.shape[0]
    act = np.arange(frozen, t)
    n_act = len(act)
    assert n_act == n_orb

    # effective one-body integrals with frozen core folded in
    core_energy = 2 * hcore[:frozen, :frozen].trace() if frozen else 0.0
    for j in range(frozen):
        for k in range(frozen):
            core_energy += 2 * eris_phys[j, k, j, k] - eris_phys[j, k, k, j]
    h_eff = hcore[np.ix_(act, act)].copy()
    for j in range(frozen):
        h_eff += 2 * eris_phys[np.ix_(act, [j], act, [j])][:, 0, :, 0]
        h_eff -= eris_phys[np.ix_(act, [j], [j], act)][:, 0, 0, :]
    v = eris_phys[np.ix_(act, act, act, act)]

    basis = spin_basis(n_act, n_alpha, n_beta)
    index = {m: i for i, m in enumerate(basis)}
    dim = len(basis)
    ham = np.zeros((dim, dim))

    spin_orbs = [(p, s) for s in (0, 1) for p in range(n_act)]

    def so(p, s):
        return p + s * n_act

    for col, mask in enumerate(basis):
        # one-body
        for (q, s) in spin_orbs:
            m1, s1 = annihilate(mask, so(q, s))
            if m1 is None:
                continue
            for p in range(n_act):
                if h_eff[p, q] == 0:
                    continue
                m2, s2 = create(m1, so(p, s))
                if m2 is None:
                    continue
                ham[index[m2], col] += h_eff[p, q] * s1 * s2
        # two-body: 1/2 sum <pq|rs> c+_{p,s1} c+_{q,s2} c_{s,s2} c_{r,s1}
        for (r, s1) in spin_orbs:
            m1, g1 = annihilate(mask, so(r, s1))
            if m1 is None:
                continue
            for (s_orb, s2) in spin_orbs:
                m2, g2 = annihilate(m1, so(s_orb, s2))
                if m2 is None:
                    continue
                for q in range(n_act):
                    m3, g3 = create(m2, so(q, s2))
                    if m3 is None:
                        continue
                    for p in range(n_act):
                        coeff = v[p, q, r, s_orb]
                        if coeff == 0:
                            continue
                        m4, g4 = create(m3, so(p, s1))
                        if m4 is None:
                            continue
                        ham[index[m4], col] += 0.5 * coeff * g1 * g2 * g3 * g4
    ham += np.eye(dim) * core_energy
    return ham, basis


def mask_to_words(mask, n_bits):
    """Bitmask int -> uint32 word array matching fries_tpu.dets layout."""
    n_words = -(-n_bits // 32)
    out = np.zeros(n_words, np.uint32)
    for w in range(n_words):
        out[w] = (mask >> (32 * w)) & 0xFFFFFFFF
    return out


def ground_state(ham):
    from scipy.linalg import eigh

    evals, evecs = eigh(ham)
    return evals[0], evecs[:, 0]
