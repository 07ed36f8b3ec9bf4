"""General contracted-Gaussian (s/p shell) molecular integrals: STO-3G for
H, Li, C, N, O via McMurchie-Davidson Hermite expansions.

Extends :mod:`fries_tpu.sto3g` (s-only closed forms) to the reference's own
headline molecules — H2O and N2 (Benchmarks/Results.tex tables; the
reference consumes externally-prepared integrals it does not ship, e.g.
Input_Data sys_params.txt + hcore/eris files, io_utils.cpp:98-187).  With
this module the framework prepares real-molecule Hamiltonians from nothing
but geometry: AO integrals -> RHF (sto3g.rhf) -> canonical-MO
MolecularHamiltonian.

Anchor: H2O at the Crawford-programming-projects STO-3G geometry reproduces
the published E_SCF = -74.942079928192 Ha and E_nuc = 8.0023670618 Ha
(tests/test_gto.py).

Everything is plain NumPy on the host: basis sizes are <= tens of AOs and
this runs once at setup, exactly like the reference's parse step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.special import erf

from fries_tpu.ops import molecule as mol

# ---------------------------------------------------------------------------
# STO-3G basis data (EMSL tabulation).  All first-row atoms share the same
# contraction coefficient sets; exponents are per-atom scaled.
# ---------------------------------------------------------------------------

_C1S = [0.15432897, 0.53532814, 0.44463454]
_C2S = [-0.09996723, 0.39951283, 0.70011547]
_C2P = [0.15591627, 0.60768372, 0.39195739]

# symbol -> (charge, [(l, exps, coefs), ...]); an l=1 entry expands to
# px, py, pz AOs sharing its radial part
BASIS = {
    "H": (1, [(0, [3.42525091, 0.62391373, 0.16885540], _C1S)]),
    "Li": (3, [(0, [16.1195750, 2.9362007, 0.7946505], _C1S),
               (0, [0.6362897, 0.1478601, 0.0480887], _C2S),
               (1, [0.6362897, 0.1478601, 0.0480887], _C2P)]),
    "C": (6, [(0, [71.6168370, 13.0450960, 3.5305122], _C1S),
              (0, [2.9412494, 0.6834831, 0.2222899], _C2S),
              (1, [2.9412494, 0.6834831, 0.2222899], _C2P)]),
    "N": (7, [(0, [99.1061690, 18.0523120, 4.8856602], _C1S),
              (0, [3.7804559, 0.8784966, 0.2857144], _C2S),
              (1, [3.7804559, 0.8784966, 0.2857144], _C2P)]),
    "O": (8, [(0, [130.7093200, 23.8088610, 6.4436083], _C1S),
              (0, [5.0331513, 1.1695961, 0.3803890], _C2S),
              (1, [5.0331513, 1.1695961, 0.3803890], _C2P)]),
}


def _boys(nmax, x):
    """Boys functions F_0..F_nmax(x), downward recursion (stable)."""
    out = np.zeros(nmax + 1)
    if x < 1e-13:
        for n in range(nmax + 1):
            out[n] = 1.0 / (2 * n + 1)
        return out
    if x < 35.0:
        # series F_n(x) = exp(-x) sum_k (2x)^k / (2n+1)(2n+3)...(2n+2k+1)
        # (all-positive terms, no cancellation), then downward recursion
        s = term = 1.0 / (2 * nmax + 1)
        k = 0
        while term > 1e-17 * s and k < 400:
            k += 1
            term *= 2.0 * x / (2 * nmax + 2 * k + 1)
            s += term
        out[nmax] = np.exp(-x) * s
        ex = np.exp(-x)
        for n in range(nmax, 0, -1):
            out[n - 1] = (2 * x * out[n] + ex) / (2 * n - 1)
        return out
    # large x: asymptotic F_0, upward with exp(-x) ~ 0
    out[0] = 0.5 * np.sqrt(np.pi / x) * erf(np.sqrt(x))
    ex = np.exp(-x)
    for n in range(nmax):
        out[n + 1] = ((2 * n + 1) * out[n] - ex) / (2 * x)
    return out


def _e_table(li, lj, a, b, ab):
    """Hermite expansion coefficients E_t^{ij} for one cartesian direction:
    (li+1, lj+1, li+lj+1) array; ``ab`` = A_x - B_x."""
    p = a + b
    q = a * b / p
    e = np.zeros((li + 1, lj + 1, li + lj + 2))
    e[0, 0, 0] = np.exp(-q * ab * ab)
    for i in range(1, li + 1):
        for t in range(i + 1):
            e[i, 0, t] = (
                (e[i - 1, 0, t - 1] / (2 * p) if t > 0 else 0.0)
                - q * ab / a * e[i - 1, 0, t]
                + (t + 1) * e[i - 1, 0, t + 1]
            )
    for j in range(1, lj + 1):
        for i in range(li + 1):
            for t in range(i + j + 1):
                e[i, j, t] = (
                    (e[i, j - 1, t - 1] / (2 * p) if t > 0 else 0.0)
                    + q * ab / b * e[i, j - 1, t]
                    + (t + 1) * e[i, j - 1, t + 1]
                )
    return e


def _r_table(tmax, umax, vmax, p, pc):
    """Hermite Coulomb integrals R^0_{tuv} for t<=tmax, u<=umax, v<=vmax."""
    ntot = tmax + umax + vmax
    f = _boys(ntot, p * float(pc @ pc))
    # R^n_{000}
    rn = np.array([(-2.0 * p) ** n * f[n] for n in range(ntot + 1)])
    r = np.zeros((ntot + 1, tmax + 1, umax + 1, vmax + 1))
    r[:, 0, 0, 0] = rn
    for t in range(tmax):
        for n in range(ntot - t):
            r[n, t + 1, 0, 0] = (t * r[n + 1, t - 1, 0, 0] if t > 0 else 0.0
                                 ) + pc[0] * r[n + 1, t, 0, 0]
    for u in range(umax):
        for t in range(tmax + 1):
            for n in range(ntot - t - u):
                r[n, t, u + 1, 0] = (
                    u * r[n + 1, t, u - 1, 0] if u > 0 else 0.0
                ) + pc[1] * r[n + 1, t, u, 0]
    for v in range(vmax):
        for u in range(umax + 1):
            for t in range(tmax + 1):
                for n in range(ntot - t - u - v):
                    r[n, t, u, v + 1] = (
                        v * r[n + 1, t, u, v - 1] if v > 0 else 0.0
                    ) + pc[2] * r[n + 1, t, u, v]
    return r[0]


def _prim_norm(l, m, n, a):
    """Normalization of a cartesian primitive x^l y^m z^n exp(-a r^2)."""
    from math import factorial

    def dfact(k):  # (2k-1)!!
        r = 1
        for i in range(2 * k - 1, 0, -2):
            r *= i
        return r

    return ((2 * a / np.pi) ** 0.75
            * np.sqrt((4 * a) ** (l + m + n)
                      / (dfact(l) * dfact(m) * dfact(n))))


class _AO:
    __slots__ = ("lmn", "center", "exps", "coefs")

    def __init__(self, lmn, center, exps, coefs):
        self.lmn = lmn
        self.center = np.asarray(center, float)
        self.exps = np.asarray(exps, float)
        self.coefs = np.asarray(coefs, float) * np.array(
            [_prim_norm(*lmn, a) for a in exps])


def build_aos(symbols, centers):
    """Expand (symbols, centers) into the cartesian AO list + charges."""
    aos, charges = [], []
    for sym, cen in zip(symbols, centers):
        z, shells = BASIS[sym]
        charges.append(float(z))
        for l, exps, coefs in shells:
            if l == 0:
                aos.append(_AO((0, 0, 0), cen, exps, coefs))
            else:
                for lmn in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
                    aos.append(_AO(lmn, cen, exps, coefs))
    return aos, np.asarray(charges)


def _overlap_prim(la, lb, a, b, ca, cb):
    """(S, E-tables, p, P) for one primitive pair; la/lb are lmn tuples."""
    p = a + b
    pcen = (a * ca + b * cb) / p
    es = [_e_table(la[d], lb[d], a, b, ca[d] - cb[d]) for d in range(3)]
    s = (np.pi / p) ** 1.5 * np.prod(
        [es[d][la[d], lb[d], 0] for d in range(3)])
    return s, es, p, pcen


def _kinetic_prim(la, lb, a, b, ca, cb):
    """Kinetic energy primitive via angular-momentum-shifted overlaps."""
    def ov(lb2):
        s, _, _, _ = _overlap_prim(la, lb2, a, b, ca, cb)
        return s

    lb = tuple(lb)
    t = b * (2 * sum(lb) + 3) * ov(lb)
    for d in range(3):
        up = list(lb); up[d] += 2
        t -= 2.0 * b * b * ov(tuple(up))
        if lb[d] >= 2:
            dn = list(lb); dn[d] -= 2
            t -= 0.5 * lb[d] * (lb[d] - 1) * ov(tuple(dn))
    return t


def _nuclear_prim(la, lb, a, b, ca, cb, centers, charges):
    _, es, p, pcen = _overlap_prim(la, lb, a, b, ca, cb)
    tm = [la[d] + lb[d] for d in range(3)]
    v = 0.0
    for cc, z in zip(centers, charges):
        r = _r_table(tm[0], tm[1], tm[2], p, pcen - cc)
        acc = 0.0
        for t in range(tm[0] + 1):
            et = es[0][la[0], lb[0], t]
            for u in range(tm[1] + 1):
                eu = es[1][la[1], lb[1], u]
                for vv in range(tm[2] + 1):
                    acc += et * eu * es[2][la[2], lb[2], vv] * r[t, u, vv]
        v -= z * 2.0 * np.pi / p * acc
    return v


def _eri_prim(la, lb, lc, ld, a, b, c, d, ca, cb, cc, cd):
    _, e1, p, pp = _overlap_prim(la, lb, a, b, ca, cb)
    _, e2, q, qq = _overlap_prim(lc, ld, c, d, cc, cd)
    alpha = p * q / (p + q)
    t1 = [la[k] + lb[k] for k in range(3)]
    t2 = [lc[k] + ld[k] for k in range(3)]
    r = _r_table(t1[0] + t2[0], t1[1] + t2[1], t1[2] + t2[2],
                 alpha, pp - qq)
    acc = 0.0
    for t in range(t1[0] + 1):
        for u in range(t1[1] + 1):
            for v in range(t1[2] + 1):
                e_ab = (e1[0][la[0], lb[0], t] * e1[1][la[1], lb[1], u]
                        * e1[2][la[2], lb[2], v])
                if e_ab == 0.0:
                    continue
                for tt in range(t2[0] + 1):
                    for uu in range(t2[1] + 1):
                        for vv in range(t2[2] + 1):
                            e_cd = (e2[0][lc[0], ld[0], tt]
                                    * e2[1][lc[1], ld[1], uu]
                                    * e2[2][lc[2], ld[2], vv])
                            if e_cd == 0.0:
                                continue
                            sign = -1.0 if (tt + uu + vv) % 2 else 1.0
                            acc += e_ab * e_cd * sign * r[t + tt, u + uu,
                                                          v + vv]
    return 2.0 * np.pi ** 2.5 / (p * q * np.sqrt(p + q)) * acc


def integrals(symbols, centers):
    """(S, T, V, ERI-chemist, E_nuc) in the (contraction-normalized)
    cartesian AO basis."""
    centers = np.atleast_2d(np.asarray(centers, float))
    aos, charges = build_aos(symbols, centers)
    n = len(aos)

    def contract2(fn):
        m = np.zeros((n, n))
        for i, A in enumerate(aos):
            for j, B in enumerate(aos[: i + 1]):
                s = 0.0
                for a, da in zip(A.exps, A.coefs):
                    for b, db in zip(B.exps, B.coefs):
                        s += da * db * fn(A.lmn, B.lmn, a, b,
                                          A.center, B.center)
                m[i, j] = m[j, i] = s
        return m

    s_ao = contract2(lambda la, lb, a, b, ca, cb:
                     _overlap_prim(la, lb, a, b, ca, cb)[0])
    # renormalize contractions (published STO-3G coefs are near- but not
    # exactly normalized in cartesian convention)
    scale = 1.0 / np.sqrt(np.diag(s_ao))
    for i, A in enumerate(aos):
        A.coefs = A.coefs * scale[i]
    s_ao = s_ao * np.outer(scale, scale)
    t_ao = contract2(_kinetic_prim)
    v_ao = contract2(lambda la, lb, a, b, ca, cb: _nuclear_prim(
        la, lb, a, b, ca, cb, centers, charges))

    eri = np.zeros((n, n, n, n))
    # unique (ij|kl) with 8-fold symmetry
    pairs = [(i, j) for i in range(n) for j in range(i + 1)]
    for pi, (i, j) in enumerate(pairs):
        A, B = aos[i], aos[j]
        for (k, l) in pairs[: pi + 1]:
            C, D = aos[k], aos[l]
            val = 0.0
            for a, da in zip(A.exps, A.coefs):
                for b, db in zip(B.exps, B.coefs):
                    for c, dc in zip(C.exps, C.coefs):
                        for d, dd in zip(D.exps, D.coefs):
                            val += da * db * dc * dd * _eri_prim(
                                A.lmn, B.lmn, C.lmn, D.lmn, a, b, c, d,
                                A.center, B.center, C.center, D.center)
            for (x, y) in ((i, j), (j, i)):
                for (z, w) in ((k, l), (l, k)):
                    eri[x, y, z, w] = eri[z, w, x, y] = val

    e_nuc = 0.0
    for i in range(len(centers)):
        for j in range(i):
            e_nuc += charges[i] * charges[j] / np.linalg.norm(
                centers[i] - centers[j])
    return s_ao, t_ao, v_ao, eri, e_nuc


def molecule(symbols, centers, n_frozen: int = 0):
    """(MolecularHamiltonian in canonical RHF MOs, core_energy).

    ``n_frozen`` doubly-occupied lowest MOs are folded into the core
    energy and an effective one-electron operator (the reference handles
    frozen cores the same way at parse time, io_utils.cpp:98-187 +
    sing_matr_el frozen sums, molecule.cpp:45-105)."""
    from fries_tpu import sto3g

    s, t, v, eri_chem, e_nuc = integrals(symbols, centers)
    n_elec = int(sum(BASIS[sym][0] for sym in symbols))
    c, _ = sto3g.rhf(s, t + v, eri_chem, n_elec)
    hmo = c.T @ (t + v) @ c
    eri = np.einsum("ijkl,ip,jq,kr,ls->pqrs", eri_chem, c, c, c, c,
                    optimize=True)
    core = e_nuc
    if n_frozen:
        f = n_frozen
        core += 2.0 * np.trace(hmo[:f, :f])
        core += (2.0 * np.einsum("iijj->", eri[:f, :f, :f, :f])
                 - np.einsum("ijji->", eri[:f, :f, :f, :f]))
        heff = (hmo + 2.0 * np.einsum("pqii->pq", eri[:, :, :f, :f])
                - np.einsum("piiq->pq", eri[:, :f, :f, :]))
        hmo = heff[f:, f:]
        eri = eri[f:, f:, f:, f:]
        n_elec -= 2 * f
    n_orb = hmo.shape[0]
    eri_phys = np.transpose(eri, (0, 2, 1, 3))  # (pq|rs) -> <pr|qs>
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(hmo),
        eris=jnp.asarray(eri_phys),
        symm=jnp.zeros(n_orb, jnp.int32),
        n_orb=n_orb,
        n_elec=n_elec,
    )
    return ham, core


# ---------------------------------------------------------------------------
# Vectorized McMurchie-Davidson engine for correlation-consistent bases
# (cc-pVDZ class: 9-primitive general contractions, d shells, spherical
# harmonics).  The scalar routines above are kept for the STO-3G path; the
# batched engine below vectorizes over primitive pairs/quartets with NumPy,
# which is what makes 9-primitive s contractions tractable (the scalar path
# would evaluate ~6561 Python-loop primitives per (ss|ss) quartet).
#
# The reference consumes PySCF-generated integrals (Input_Data/
# gen_ex_trials.py, io_utils.cpp:98-187); this engine replaces that external
# dependency.  Validated against the reference's own surviving PySCF outputs
# (hcore.txt / sys_params.txt hf_energy) in tests/test_ccpvdz.py.
# ---------------------------------------------------------------------------

# cartesian component orders per l (x-major, matching the w-factor and
# spherical-transform tables below)
def _cart_comps(l):
    return [(lx, ly, l - lx - ly)
            for lx in range(l, -1, -1) for ly in range(l - lx, -1, -1)]


_CART_COMPS = {l: _cart_comps(l) for l in range(5)}


def _dfact(k):
    """(2k-1)!!"""
    r = 1
    for i in range(2 * k - 1, 0, -2):
        r *= i
    return r


def _comp_w(l, lmn):
    """Norm ratio N(lmn)/N(l00): scales raw (l00-normalized) cartesian
    components to unit-normalized ones.  Exponent-independent."""
    from math import prod
    return np.sqrt(_dfact(l) / prod(_dfact(c) for c in lmn))


# Real solid harmonics as cartesian monomial polynomials, PySCF m-order
# (-l..l), each column up to overall scale (columns are renormalized
# numerically afterwards).  Standard tabulation (e.g. Helgaker/Jorgensen/
# Olsen table 6.3); the matrix entries below divide each monomial
# coefficient by the w-factor to express the harmonic over
# *unit-normalized* cartesian components.
_SOLID_MONOMIALS = {
    0: [{(0, 0, 0): 1.0}],
    1: [{(1, 0, 0): 1.0}, {(0, 1, 0): 1.0}, {(0, 0, 1): 1.0}],
    2: [
        {(1, 1, 0): 1.0},                                       # m=-2: xy
        {(0, 1, 1): 1.0},                                       # m=-1: yz
        {(0, 0, 2): 2.0, (2, 0, 0): -1.0, (0, 2, 0): -1.0},     # m=0
        {(1, 0, 1): 1.0},                                       # m=+1: xz
        {(2, 0, 0): 1.0, (0, 2, 0): -1.0},                      # m=+2
    ],
    3: [
        {(2, 1, 0): 3.0, (0, 3, 0): -1.0},                      # y(3x^2-y^2)
        {(1, 1, 1): 1.0},                                       # xyz
        {(0, 1, 2): 4.0, (2, 1, 0): -1.0, (0, 3, 0): -1.0},     # y(4z^2-x^2-y^2)
        {(0, 0, 3): 2.0, (2, 0, 1): -3.0, (0, 2, 1): -3.0},     # z(2z^2-3x^2-3y^2)
        {(1, 0, 2): 4.0, (3, 0, 0): -1.0, (1, 2, 0): -1.0},     # x(4z^2-x^2-y^2)
        {(2, 0, 1): 1.0, (0, 2, 1): -1.0},                      # z(x^2-y^2)
        {(3, 0, 0): 1.0, (1, 2, 0): -3.0},                      # x(x^2-3y^2)
    ],
    4: [
        {(3, 1, 0): 1.0, (1, 3, 0): -1.0},                      # xy(x^2-y^2)
        {(2, 1, 1): 3.0, (0, 3, 1): -1.0},                      # yz(3x^2-y^2)
        {(1, 1, 2): 6.0, (3, 1, 0): -1.0, (1, 3, 0): -1.0},     # xy(6z^2-x^2-y^2)
        {(0, 1, 3): 4.0, (2, 1, 1): -3.0, (0, 3, 1): -3.0},     # yz(4z^2-3x^2-3y^2)
        {(4, 0, 0): 3.0, (0, 4, 0): 3.0, (0, 0, 4): 8.0,        # 35z^4-30z^2r^2+3r^4
         (2, 2, 0): 6.0, (2, 0, 2): -24.0, (0, 2, 2): -24.0},
        {(1, 0, 3): 4.0, (3, 0, 1): -3.0, (1, 2, 1): -3.0},     # xz(4z^2-3x^2-3y^2)
        {(2, 0, 2): 6.0, (0, 2, 2): -6.0,                       # (x^2-y^2)(6z^2-x^2-y^2)
         (4, 0, 0): -1.0, (0, 4, 0): 1.0},
        {(3, 0, 1): 1.0, (1, 2, 1): -3.0},                      # xz(x^2-3y^2)
        {(4, 0, 0): 1.0, (0, 4, 0): 1.0, (2, 2, 0): -6.0},      # x^4-6x^2y^2+y^4
    ],
}


def _build_sph_coef(l):
    """(n_cart, 2l+1) transform over unit-normalized cartesian components:
    monomial coefficient / w(lmn) (cartesian normalization ratio)."""
    comps = _CART_COMPS[l]
    mat = np.zeros((len(comps), 2 * l + 1))
    for m_i, mono in enumerate(_SOLID_MONOMIALS[l]):
        for lmn, c in mono.items():
            mat[comps.index(lmn), m_i] = c / _comp_w(l, lmn)
    return mat


# real solid harmonics in terms of *unit-normalized* cartesian components,
# PySCF m-order (-l..l); columns renormalized numerically afterwards so only
# relative coefficients matter.
_SPH_COEF = {l: _build_sph_coef(l) for l in range(5)}


def _sph_parity(l):
    """Per-axis parity (mod 2) of each real solid harmonic (all monomials in
    one harmonic share parity), for point-group ops."""
    out = []
    for mono in _SOLID_MONOMIALS[l]:
        lmn = next(iter(mono))
        out.append(tuple(c % 2 for c in lmn))
    return out


_SPH_PARITY = {l: _sph_parity(l) for l in range(5)}


class Shell:
    """One contracted shell: all cartesian components share the radial part.

    ``coefs`` carry the (l,0,0)-cartesian primitive normalization."""

    __slots__ = ("l", "center", "exps", "coefs", "atom")

    def __init__(self, l, center, exps, coefs, atom):
        self.l = l
        self.center = np.asarray(center, float)
        self.exps = np.asarray(exps, float)
        lmn0 = (l, 0, 0)
        self.coefs = np.asarray(coefs, float) * np.array(
            [_prim_norm(*lmn0, a) for a in self.exps])
        self.atom = atom


def build_shells(symbols, centers, basis_name):
    """((shells, charges)) for a molecule in a correlation-consistent basis."""
    from fries_tpu import basis as basis_data

    centers = np.atleast_2d(np.asarray(centers, float))
    shells, charges = [], []
    for ai, (sym, cen) in enumerate(zip(symbols, centers)):
        z, shell_list = basis_data.get_shells(basis_name, sym)
        charges.append(float(z))
        for l, prims in shell_list:
            exps = [e for e, _ in prims]
            coefs = [c for _, c in prims]
            shells.append(Shell(l, cen, exps, coefs, ai))
    return shells, np.asarray(charges)


def _boys_vec(nmax, x):
    """Vectorized Boys functions: returns (nmax+1, *x.shape)."""
    x = np.asarray(x, float)
    small = x < 35.0
    xs = np.where(small, x, 1.0)
    s = np.full(xs.shape, 1.0 / (2 * nmax + 1))
    term = s.copy()
    for k in range(1, 220):
        term = term * (2.0 * xs) / (2 * nmax + 2 * k + 1)
        s = s + term
    ex = np.exp(-xs)
    fs = [None] * (nmax + 1)
    fs[nmax] = ex * s
    for n in range(nmax, 0, -1):
        fs[n - 1] = (2.0 * xs * fs[n] + ex) / (2 * n - 1)
    xl = np.where(small, 1.0, x)
    f0l = 0.5 * np.sqrt(np.pi / xl) * erf(np.sqrt(xl))
    exl = np.exp(-xl)
    fl = [f0l]
    for n in range(nmax):
        fl.append(((2 * n + 1) * fl[n] - exl) / (2.0 * xl))
    out = np.empty((nmax + 1,) + x.shape)
    for n in range(nmax + 1):
        out[n] = np.where(small, fs[n], fl[n])
    return out


class _PairData:
    """Primitive-pair tables for one shell pair (flattened over (i,j))."""

    __slots__ = ("p", "pcen", "coef", "efull", "la", "lb", "box")

    def __init__(self, sha, shb):
        la, lb = sha.l, shb.l
        a = np.repeat(sha.exps, len(shb.exps))
        b = np.tile(shb.exps, len(sha.exps))
        coef = np.repeat(sha.coefs, len(shb.exps)) * np.tile(
            shb.coefs, len(sha.exps))
        npair = len(a)
        p = a + b
        q = a * b / p
        pcen = (a[:, None] * sha.center + b[:, None] * shb.center) / p[:, None]
        ab = sha.center - shb.center
        # E tables per direction: (npair, la+1, lb+1, la+lb+1)
        es = []
        for d in range(3):
            e = np.zeros((npair, la + 1, lb + 1, la + lb + 2))
            e[:, 0, 0, 0] = np.exp(-q * ab[d] * ab[d])
            for i in range(1, la + 1):
                for t in range(i + 1):
                    e[:, i, 0, t] = (
                        (e[:, i - 1, 0, t - 1] / (2 * p) if t > 0 else 0.0)
                        - q * ab[d] / a * e[:, i - 1, 0, t]
                        + (t + 1) * e[:, i - 1, 0, t + 1]
                    )
            for j in range(1, lb + 1):
                for i in range(la + 1):
                    for t in range(i + j + 1):
                        e[:, i, j, t] = (
                            (e[:, i, j - 1, t - 1] / (2 * p) if t > 0 else 0.0)
                            + q * ab[d] / b * e[:, i, j - 1, t]
                            + (t + 1) * e[:, i, j - 1, t + 1]
                        )
            es.append(e)
        # combined (npair, nca, ncb, nhx, nhy, nhz), contraction coefs folded
        ca = _CART_COMPS[la]
        cb = _CART_COMPS[lb]
        nh = la + lb + 1
        efull = np.zeros((npair, len(ca), len(cb), nh, nh, nh))
        for ia, (ax, ay, az) in enumerate(ca):
            for ib, (bx, by, bz) in enumerate(cb):
                efull[:, ia, ib] = np.einsum(
                    "nt,nu,nv->ntuv",
                    es[0][:, ax, bx, : nh],
                    es[1][:, ay, by, : nh],
                    es[2][:, az, bz, : nh],
                )
        self.p = p
        self.pcen = pcen
        self.coef = coef
        self.efull = efull * coef[:, None, None, None, None, None]
        self.la, self.lb = la, lb
        self.box = nh  # hermite box edge (same per axis)


def _eri_quartet(pd1, pd2):
    """Contracted cartesian ERI block (nca, ncb, ncc, ncd) for one shell
    quartet from pair tables."""
    n1, n2 = len(pd1.p), len(pd2.p)
    ltot = pd1.la + pd1.lb + pd2.la + pd2.lb
    p1 = pd1.p[:, None]
    p2 = pd2.p[None, :]
    alpha = p1 * p2 / (p1 + p2)
    pq = pd1.pcen[:, None, :] - pd2.pcen[None, :, :]
    x = alpha * np.einsum("abd,abd->ab", pq, pq)
    f = _boys_vec(ltot, x)
    pref = 2.0 * np.pi ** 2.5 / (p1 * p2 * np.sqrt(p1 + p2))
    # R^n_000 with prefactor folded
    rn = np.array([(-2.0 * alpha) ** n * f[n] for n in range(ltot + 1)])
    rn = rn * pref[None]
    b1, b2 = pd1.box, pd2.box
    tmax = b1 + b2 - 2  # max per-axis hermite order
    r = np.zeros((ltot + 1, tmax + 1, tmax + 1, tmax + 1, n1, n2))
    r[:, 0, 0, 0] = rn
    for t in range(tmax):
        for n in range(ltot - t):
            r[n, t + 1, 0, 0] = (t * r[n + 1, t - 1, 0, 0] if t > 0 else 0.0
                                 ) + pq[..., 0] * r[n + 1, t, 0, 0]
    for u in range(tmax):
        for t in range(tmax + 1):
            for n in range(ltot - t - u):
                r[n, t, u + 1, 0] = (
                    u * r[n + 1, t, u - 1, 0] if u > 0 else 0.0
                ) + pq[..., 1] * r[n + 1, t, u, 0]
    for v in range(tmax):
        for u in range(tmax + 1):
            for t in range(tmax + 1):
                for n in range(ltot - t - u - v):
                    r[n, t, u, v + 1] = (
                        v * r[n + 1, t, u, v - 1] if v > 0 else 0.0
                    ) + pq[..., 2] * r[n + 1, t, u, v]
    r0 = r[0]  # (tmax+1, tmax+1, tmax+1, n1, n2)
    # step 1: contract pair-2 hermite components
    nca, ncb = pd1.efull.shape[1], pd1.efull.shape[2]
    ncc, ncd = pd2.efull.shape[1], pd2.efull.shape[2]
    k = np.zeros((n1, ncc, ncd, b1, b1, b1))
    for t2 in range(b2):
        for u2 in range(b2):
            for v2 in range(b2):
                e2 = pd2.efull[:, :, :, t2, u2, v2]
                if not e2.any():
                    continue
                sign = -1.0 if (t2 + u2 + v2) % 2 else 1.0
                rsl = r0[t2:t2 + b1, u2:u2 + b1, v2:v2 + b1]
                k += sign * np.einsum("qcd,tuvpq->pcdtuv", e2, rsl,
                                      optimize=True)
    # step 2: contract pair-1
    return np.einsum("pabtuv,pcdtuv->abcd", pd1.efull, k, optimize=True)


def eri_cart(shells):
    """Full cartesian contracted-ERI tensor (chemist (ij|kl)) over the raw
    (l00-normalized) cartesian AO components of ``shells``."""
    offs = []
    n = 0
    for sh in shells:
        offs.append(n)
        n += len(_CART_COMPS[sh.l])
    pairs = []
    pair_dat = {}
    for i in range(len(shells)):
        for j in range(i + 1):
            pairs.append((i, j))
            pair_dat[(i, j)] = _PairData(shells[i], shells[j])
    eri = np.zeros((n, n, n, n))
    for pi, (i, j) in enumerate(pairs):
        for (k, l) in pairs[: pi + 1]:
            blk = _eri_quartet(pair_dat[(i, j)], pair_dat[(k, l)])
            si, sj = offs[i], offs[j]
            sk, sl = offs[k], offs[l]
            ni, nj, nk, nl = blk.shape
            eri[si:si + ni, sj:sj + nj, sk:sk + nk, sl:sl + nl] = blk
            eri[sj:sj + nj, si:si + ni, sk:sk + nk, sl:sl + nl] = \
                blk.transpose(1, 0, 2, 3)
            eri[si:si + ni, sj:sj + nj, sl:sl + nl, sk:sk + nk] = \
                blk.transpose(0, 1, 3, 2)
            eri[sj:sj + nj, si:si + ni, sl:sl + nl, sk:sk + nk] = \
                blk.transpose(1, 0, 3, 2)
            eri[sk:sk + nk, sl:sl + nl, si:si + ni, sj:sj + nj] = \
                blk.transpose(2, 3, 0, 1)
            eri[sl:sl + nl, sk:sk + nk, si:si + ni, sj:sj + nj] = \
                blk.transpose(3, 2, 0, 1)
            eri[sk:sk + nk, sl:sl + nl, sj:sj + nj, si:si + ni] = \
                blk.transpose(2, 3, 1, 0)
            eri[sl:sl + nl, sk:sk + nk, sj:sj + nj, si:si + ni] = \
                blk.transpose(3, 2, 1, 0)
    return eri


def _shell_aos(shells):
    """Expand shells into per-cartesian-AO (_AO-like) scalar-path objects
    for the one-electron integrals, keeping raw l00 normalization."""
    aos, meta = [], []
    for si, sh in enumerate(shells):
        for lmn in _CART_COMPS[sh.l]:
            ao = _AO.__new__(_AO)
            ao.lmn = lmn
            ao.center = sh.center
            ao.exps = sh.exps
            ao.coefs = sh.coefs  # l00-normalized; fixed by w-scaling later
            aos.append(ao)
            meta.append((si, lmn))
    return aos, meta


def sph_transform(shells):
    """(ncart, nsph) block-diagonal cart->spherical matrix acting on
    *unit-normalized* cartesian components, plus per-sph-AO metadata
    (atom, l, m_index, parity)."""
    blocks, meta = [], []
    for sh in shells:
        blocks.append(_SPH_COEF[sh.l])
        for mi, par in enumerate(_SPH_PARITY[sh.l]):
            meta.append((sh.atom, sh.l, mi, par))
    ncart = sum(b.shape[0] for b in blocks)
    nsph = sum(b.shape[1] for b in blocks)
    m = np.zeros((ncart, nsph))
    r = c = 0
    for b in blocks:
        m[r:r + b.shape[0], c:c + b.shape[1]] = b
        r += b.shape[0]
        c += b.shape[1]
    return m, meta


def integrals_cc(symbols, centers, basis_name, spherical=True):
    """(S, T, V, ERI-chemist, E_nuc, ao_meta) in the normalized spherical
    (or cartesian) AO basis for a correlation-consistent basis set."""
    centers = np.atleast_2d(np.asarray(centers, float))
    shells, charges = build_shells(symbols, centers, basis_name)
    aos, cart_meta = _shell_aos(shells)
    n = len(aos)

    def contract2(fn):
        m = np.zeros((n, n))
        for i, A in enumerate(aos):
            for j, B in enumerate(aos[: i + 1]):
                s = 0.0
                for a, da in zip(A.exps, A.coefs):
                    for b, db in zip(B.exps, B.coefs):
                        s += da * db * fn(A.lmn, B.lmn, a, b,
                                          A.center, B.center)
                m[i, j] = m[j, i] = s
        return m

    s_ao = contract2(lambda la, lb, a, b, ca, cb:
                     _overlap_prim(la, lb, a, b, ca, cb)[0])
    t_ao = contract2(_kinetic_prim)
    v_ao = contract2(lambda la, lb, a, b, ca, cb: _nuclear_prim(
        la, lb, a, b, ca, cb, centers, charges))
    eri = eri_cart(shells)

    # raw l00-normalization -> unit-normalized cartesian components
    w = np.array([_comp_w(sh_l_from(meta), meta[1]) for meta in cart_meta])
    s_ao *= np.outer(w, w)
    t_ao *= np.outer(w, w)
    v_ao *= np.outer(w, w)
    eri *= w[:, None, None, None] * w[None, :, None, None] \
        * w[None, None, :, None] * w[None, None, None, :]

    if spherical:
        m, ao_meta = sph_transform(shells)
        s_ao = m.T @ s_ao @ m
        t_ao = m.T @ t_ao @ m
        v_ao = m.T @ v_ao @ m
        eri = np.einsum("ijkl,ip,jq,kr,ls->pqrs", eri, m, m, m, m,
                        optimize=True)
    else:
        ao_meta = [
            (shells[si].atom, shells[si].l, ci,
             tuple(c % 2 for c in lmn))
            for ci, (si, lmn) in enumerate(cart_meta)
        ]
    # exact contracted normalization (PySCF normalizes contractions too)
    scale = 1.0 / np.sqrt(np.diag(s_ao))
    s_ao = s_ao * np.outer(scale, scale)
    t_ao = t_ao * np.outer(scale, scale)
    v_ao = v_ao * np.outer(scale, scale)
    eri = eri * (scale[:, None, None, None] * scale[None, :, None, None]
                 * scale[None, None, :, None] * scale[None, None, None, :])

    e_nuc = 0.0
    for i in range(len(centers)):
        for j in range(i):
            e_nuc += charges[i] * charges[j] / np.linalg.norm(
                centers[i] - centers[j])
    return s_ao, t_ao, v_ao, eri, e_nuc, ao_meta


def sh_l_from(meta):
    """cart_meta entry -> its shell's l (helper for the w scaling)."""
    return sum(meta[1])


# Crawford programming-projects STO-3G water geometry (bohr):
# published E_SCF = -74.942079928192, E_nuc = 8.002367061811 Ha
WATER_GEOM = (
    ("O", "H", "H"),
    np.array([[0.0, 0.0, -0.143225816552],
              [0.0, 1.638036840407, 1.136548822547],
              [0.0, -1.638036840407, 1.136548822547]]),
)


def water(n_frozen: int = 0):
    """H2O/STO-3G at the Crawford geometry (7 orbitals, 10 electrons)."""
    return molecule(*WATER_GEOM, n_frozen=n_frozen)


def n2(r: float = 2.074, n_frozen: int = 0):
    """N2/STO-3G at bond length ``r`` bohr (10 orbitals, 14 electrons) —
    the reference's headline system family (N2_eqm/, Results.tex:64)."""
    return molecule(("N", "N"),
                    np.array([[0.0, 0.0, 0.0], [0.0, 0.0, r]]),
                    n_frozen=n_frozen)


def lih(r: float = 3.015, n_frozen: int = 0):
    """LiH/STO-3G at bond length ``r`` bohr (6 orbitals, 4 electrons)."""
    return molecule(("Li", "H"),
                    np.array([[0.0, 0.0, 0.0], [0.0, 0.0, r]]),
                    n_frozen=n_frozen)
