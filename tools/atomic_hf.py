"""Fast closed-shell atomic RHF over UNCONTRACTED same-center (s, p)
primitives, for basis-set (re-)derivation (tools/derive_ccpvqz.py).

Same-center McMurchie-Davidson collapses: PQ = 0 makes the R tensor
diagonal in parity, R_{TUV}(0) = (T-1)!!(U-1)!!(V-1)!! * rn[(T+U+V)/2]
with rn = pref * (-2 alpha)^n F_n(0) and F_n(0) = 1/(2n+1), so the full
primitive ERI tensor is a few einsums over the pair E-tables — no per-
quartet Python loop.  One-electron integrals use the standard same-center
Gaussian moment formulas.  Everything is validated against the generic
engine (gto.eri_cart / _overlap_prim / _kinetic_prim / _nuclear_prim) in
tests/test_atomic_hf.py.

Used to re-derive the Ne cc-pVQZ s/p exponents + contractions when the
reference's Neon_ccpvqz archive is unavailable: the s/p HF sets of the
cc-pVXZ family are defined as atomic-HF-energy-optimal (Dunning, JCP 90,
1007 (1989)), so optimizing log-exponents to the same stationary point
recovers the published basis up to optimizer tolerance (and the HF/CISD
energies to second order in any residual difference).
"""

from __future__ import annotations

import numpy as np

from fries_tpu import gto


def _dfact(n):
    r = 1
    for i in range(n, 0, -2):
        r *= i
    return r


def _mom1(n, p):
    """I(n, p) = int x^n e^{-p x^2} dx (0 for odd n)."""
    if n % 2:
        return 0.0
    return _dfact(n - 1) / (2.0 * p) ** (n // 2) * np.sqrt(np.pi / p)


def _overlap_cart(l1, l2, a, b):
    """(ncart1, ncart2) same-center overlap over raw cartesians; a, b may be
    arrays (broadcast)."""
    p = a + b
    c1, c2 = gto._CART_COMPS[l1], gto._CART_COMPS[l2]
    out = np.zeros((len(c1), len(c2)) + np.shape(p))
    for i, (i1, j1, k1) in enumerate(c1):
        for j, (i2, j2, k2) in enumerate(c2):
            if (i1 + i2) % 2 or (j1 + j2) % 2 or (k1 + k2) % 2:
                continue
            out[i, j] = (
                _dfact(i1 + i2 - 1) * _dfact(j1 + j2 - 1)
                * _dfact(k1 + k2 - 1)
                / (2.0 * p) ** ((i1 + i2 + j1 + j2 + k1 + k2) // 2)
                * (np.pi / p) ** 1.5
            )
    return out


def _kinetic_cart(l1, l2, a, b):
    """Same-center kinetic via T = b(2L2+3)S - 2b^2 S(+2) - .5 L2(L2-1)-ish
    angular-raised overlaps; implemented with the standard operator
    identity T_ab = b(2(i2+j2+k2)+3) S - 2b^2 [S_{i2+2}+S_{j2+2}+S_{k2+2}]
    - .5 [i2(i2-1) S_{i2-2} + j2(j2-1) S_{j2-2} + k2(k2-1) S_{k2-2}]."""
    c1, c2 = gto._CART_COMPS[l1], gto._CART_COMPS[l2]
    p = a + b

    def s_elem(lmn1, lmn2):
        n = [lmn1[d] + lmn2[d] for d in range(3)]
        if any(x % 2 for x in n):
            return 0.0
        tot = sum(n)
        return (_dfact(n[0] - 1) * _dfact(n[1] - 1) * _dfact(n[2] - 1)
                / (2.0 * p) ** (tot // 2) * (np.pi / p) ** 1.5)

    out = np.zeros((len(c1), len(c2)) + np.shape(p))
    for i, lmn1 in enumerate(c1):
        for j, lmn2 in enumerate(c2):
            i2, j2, k2 = lmn2
            t = b * (2 * (i2 + j2 + k2) + 3) * s_elem(lmn1, lmn2)
            for d in range(3):
                up = list(lmn2)
                up[d] += 2
                t = t - 2.0 * b * b * s_elem(lmn1, tuple(up))
                if lmn2[d] >= 2:
                    dn = list(lmn2)
                    dn[d] -= 2
                    t = t - 0.5 * lmn2[d] * (lmn2[d] - 1) * s_elem(
                        lmn1, tuple(dn))
            out[i, j] = t
    return out


def _nuclear_cart(l1, l2, a, b, z):
    """Same-center nuclear attraction (nucleus at the shared center):
    -Z * angular average * radial moment."""
    c1, c2 = gto._CART_COMPS[l1], gto._CART_COMPS[l2]
    p = a + b
    out = np.zeros((len(c1), len(c2)) + np.shape(p))
    from math import factorial
    for i, (i1, j1, k1) in enumerate(c1):
        for j, (i2, j2, k2) in enumerate(c2):
            I, J, K = i1 + i2, j1 + j2, k1 + k2
            if I % 2 or J % 2 or K % 2:
                continue
            L = I + J + K
            ang = (4.0 * np.pi * _dfact(I - 1) * _dfact(J - 1)
                   * _dfact(K - 1) / _dfact(L + 1))
            rad = factorial(L // 2) / (2.0 * p ** (L // 2 + 1))
            out[i, j] = -z * ang * rad
    return out


def _same_center_eri(shA, shB, shC, shD):
    """Primitive-resolved cartesian ERI block for four same-center shells:
    (na, nb, nc, nd, ncA, ncB, ncC, ncD)."""
    pd1 = gto._PairData(shA, shB)
    pd2 = gto._PairData(shC, shD)
    ltot = pd1.la + pd1.lb + pd2.la + pd2.lb
    p1 = pd1.p[:, None]
    p2 = pd2.p[None, :]
    alpha = p1 * p2 / (p1 + p2)
    pref = 2.0 * np.pi ** 2.5 / (p1 * p2 * np.sqrt(p1 + p2))
    rn = np.array([
        (-2.0 * alpha) ** n / (2 * n + 1) for n in range(ltot + 1)
    ]) * pref[None]
    b1, b2 = pd1.box, pd2.box
    tmax = b1 + b2 - 2
    # closed-form same-center R: nonzero only for all-even (T, U, V)
    r0 = np.zeros((tmax + 1, tmax + 1, tmax + 1) + rn.shape[1:])
    for T in range(0, tmax + 1, 2):
        for U in range(0, tmax + 1, 2):
            for V in range(0, tmax + 1, 2):
                if T + U + V > ltot:
                    continue
                r0[T, U, V] = (
                    _dfact(T - 1) * _dfact(U - 1) * _dfact(V - 1)
                    * rn[(T + U + V) // 2]
                )
    # contract pair-2 hermites (keep primitive axes p, q)
    ncc, ncd = pd2.efull.shape[1], pd2.efull.shape[2]
    k = None
    for t2 in range(b2):
        for u2 in range(b2):
            for v2 in range(b2):
                e2 = pd2.efull[:, :, :, t2, u2, v2]
                if not e2.any():
                    continue
                sign = -1.0 if (t2 + u2 + v2) % 2 else 1.0
                rsl = r0[t2:t2 + b1, u2:u2 + b1, v2:v2 + b1]
                term = sign * np.einsum("qcd,tuvpq->pqcdtuv", e2, rsl,
                                        optimize=True)
                k = term if k is None else k + term
    blk = np.einsum("pabtuv,pqcdtuv->pqabcd", pd1.efull, k, optimize=True)
    na, nb = len(shA.exps), len(shB.exps)
    nc, nd = len(shC.exps), len(shD.exps)
    ncA, ncB = blk.shape[2], blk.shape[3]
    blk = blk.reshape(na, nb, nc, nd, ncA, ncB, ncc, ncd)
    return blk


class AtomSPBasis:
    """Uncontracted same-center (s, p) primitive basis with fast integrals.

    AO order: [s_0..s_{ns-1}, p_0x, p_0y, p_0z, p_1x, ...] (normalized)."""

    def __init__(self, s_exps, p_exps, z):
        self.s = np.asarray(s_exps, float)
        self.p = np.asarray(p_exps, float)
        self.z = float(z)
        self.n = len(self.s) + 3 * len(self.p)

    def integrals(self):
        ns, npr = len(self.s), len(self.p)
        n = self.n
        zero3 = np.zeros(3)
        shS = gto.Shell(0, zero3, self.s, np.ones(ns), 0)
        shP = gto.Shell(1, zero3, self.p, np.ones(npr), 0)
        # prim-norm factors folded into Shell.coefs; recover per-primitive
        cs, cp = shS.coefs, shP.coefs

        s_mat = np.zeros((n, n))
        t_mat = np.zeros((n, n))
        v_mat = np.zeros((n, n))

        def fill2(fn, out):
            # ss block
            a = self.s[:, None]
            b = self.s[None, :]
            out[:ns, :ns] = fn(0, 0, a, b)[0, 0] * np.outer(cs, cs)
            # pp block (x,y,z interleaved)
            a = self.p[:, None]
            b = self.p[None, :]
            blk = fn(1, 1, a, b)  # (3, 3, np, np)
            w = np.outer(cp, cp)
            for ci in range(3):
                for cj in range(3):
                    out[ns + ci::3, ns + cj::3] = blk[ci, cj] * w
            # sp blocks vanish by parity at the same center
            return out

        fill2(_overlap_cart, s_mat)
        fill2(_kinetic_cart, t_mat)
        fill2(lambda l1, l2, a, b: _nuclear_cart(l1, l2, a, b, self.z),
              v_mat)

        eri = np.zeros((n, n, n, n))
        blocks = {}
        for lA, lB, lC, lD in [(0, 0, 0, 0), (0, 0, 1, 1), (1, 1, 0, 0),
                               (1, 1, 1, 1), (0, 1, 0, 1), (0, 1, 1, 0),
                               (1, 0, 0, 1), (1, 0, 1, 0), (0, 0, 0, 1),
                               (0, 0, 1, 0), (0, 1, 0, 0), (1, 0, 0, 0),
                               (1, 1, 1, 0), (1, 1, 0, 1), (1, 0, 1, 1),
                               (0, 1, 1, 1)]:
            sh = {0: shS, 1: shP}
            blk = _same_center_eri(sh[lA], sh[lB], sh[lC], sh[lD])
            blocks[(lA, lB, lC, lD)] = blk

        def rows(l):
            if l == 0:
                return [slice(0, ns)], [cs]
            return ([slice(ns + c, None, 3) for c in range(3)],
                    [cp, cp, cp])

        # primitive normalization is already folded into _PairData (via
        # Shell.coefs), so the blocks drop in directly
        for (lA, lB, lC, lD), blk in blocks.items():
            rA, _ = rows(lA)
            rB, _ = rows(lB)
            rC, _ = rows(lC)
            rD, _ = rows(lD)
            for ia, sa in enumerate(rA):
                for ib, sb in enumerate(rB):
                    for ic, sc in enumerate(rC):
                        for id_, sd in enumerate(rD):
                            eri[np.ix_(
                                np.arange(n)[sa], np.arange(n)[sb],
                                np.arange(n)[sc], np.arange(n)[sd])] = (
                                blk[:, :, :, :, ia, ib, ic, id_])
        # normalize AOs
        scale = 1.0 / np.sqrt(np.diag(s_mat))
        s_mat = s_mat * np.outer(scale, scale)
        t_mat = t_mat * np.outer(scale, scale)
        v_mat = v_mat * np.outer(scale, scale)
        eri = eri * (scale[:, None, None, None] * scale[None, :, None, None]
                     * scale[None, None, :, None]
                     * scale[None, None, None, :])
        return s_mat, t_mat, v_mat, eri


def rhf(s_mat, t_mat, v_mat, eri, n_elec, max_iter=300, tol=1e-12):
    """Damped closed-shell RHF; returns (e_tot, C, mo_energy)."""
    hcore = t_mat + v_mat
    nocc = n_elec // 2
    ev, U = np.linalg.eigh(s_mat)
    keep = ev > 1e-10 * ev.max()
    X = U[:, keep] @ np.diag(ev[keep] ** -0.5)
    f = hcore
    dm = None
    e_old = 0.0
    for it in range(max_iter):
        fo = X.T @ f @ X
        mo_e, C = np.linalg.eigh(fo)
        C = X @ C
        dm_new = 2.0 * C[:, :nocc] @ C[:, :nocc].T
        dm = dm_new if dm is None else 0.7 * dm_new + 0.3 * dm
        J = np.einsum("ijkl,kl->ij", eri, dm, optimize=True)
        K = np.einsum("ikjl,kl->ij", eri, dm, optimize=True)
        f = hcore + J - 0.5 * K
        e = 0.5 * np.sum(dm * (hcore + f))
        if abs(e - e_old) < tol and it > 5:
            break
        e_old = e
    return e, C, mo_e


def atom_energy(s_exps, p_exps, z=10, n_elec=10):
    basis = AtomSPBasis(s_exps, p_exps, z)
    s_mat, t_mat, v_mat, eri = basis.integrals()
    e, _, _ = rhf(s_mat, t_mat, v_mat, eri, n_elec)
    return e


class AtomBasisPrim:
    """Same-center basis where EVERY primitive is its own AO (uncontracted),
    arbitrary l per group: [(l, [exps...]), ...].  Spherical AOs, normalized.

    AO order: for each (l, exps) group, for each exponent, the 2l+1 real
    solid harmonics (PySCF m-order)."""

    def __init__(self, groups, z):
        self.groups = [(int(l), list(map(float, es))) for l, es in groups]
        self.z = float(z)
        self.n = sum((2 * l + 1) * len(es) for l, es in self.groups)

    def _shell_list(self):
        """One gto.Shell per primitive."""
        zero3 = np.zeros(3)
        out = []
        for l, es in self.groups:
            for e in es:
                out.append(gto.Shell(l, zero3, [e], [1.0], 0))
        return out

    def integrals(self):
        shells = self._shell_list()
        ns = len(shells)
        # spherical transform per shell
        tr = [gto._SPH_COEF[sh.l] for sh in shells]
        nsph_of = [t.shape[1] for t in tr]
        ncart_of = [t.shape[0] for t in tr]
        soffs = np.cumsum([0] + nsph_of)
        n = soffs[-1]

        # one-electron: same-center closed forms per shell pair
        s_m = np.zeros((n, n))
        t_m = np.zeros((n, n))
        v_m = np.zeros((n, n))
        for i, shA in enumerate(shells):
            wA = np.array([gto._comp_w(shA.l, lmn)
                           for lmn in gto._CART_COMPS[shA.l]])
            cA = shA.coefs[0]
            for j, shB in enumerate(shells):
                if j > i:
                    continue
                wB = np.array([gto._comp_w(shB.l, lmn)
                               for lmn in gto._CART_COMPS[shB.l]])
                cB = shB.coefs[0]
                a, b = shA.exps[0], shB.exps[0]
                blocks = {}
                blocks['s'] = _overlap_cart(shA.l, shB.l, a, b)
                blocks['t'] = _kinetic_cart(shA.l, shB.l, a, b)
                blocks['v'] = _nuclear_cart(shA.l, shB.l, a, b, self.z)
                for key, mat in (('s', s_m), ('t', t_m), ('v', v_m)):
                    blk = blocks[key] * cA * cB * np.outer(wA, wB)
                    sph = tr[i].T @ blk @ tr[j]
                    mat[soffs[i]:soffs[i+1], soffs[j]:soffs[j+1]] = sph
                    mat[soffs[j]:soffs[j+1], soffs[i]:soffs[i+1]] = sph.T

        # ERIs: merge shells by l into supershells (vectorized over
        # primitive quartets inside _same_center_eri)
        super_sh = []
        sph_rows = []   # per (l-group) list of AO row indices per (prim, m)
        zero3 = np.zeros(3)
        row = 0
        shell_cursor = 0
        for l, es in self.groups:
            super_sh.append(gto.Shell(l, zero3, es, np.ones(len(es)), 0))
            rows = np.arange(row, row + len(es) * (2 * l + 1)).reshape(
                len(es), 2 * l + 1)
            sph_rows.append(rows)
            row += len(es) * (2 * l + 1)
            shell_cursor += len(es)
        eri = np.zeros((n, n, n, n))
        ng = len(super_sh)
        for ia in range(ng):
            for ib in range(ng):
                for ic in range(ng):
                    for id_ in range(ng):
                        blk = _same_center_eri(
                            super_sh[ia], super_sh[ib],
                            super_sh[ic], super_sh[id_])
                        # blk: (na, nb, nc, nd, cA, cB, cC, cD) cartesians
                        ta = gto._SPH_COEF[super_sh[ia].l]
                        tb = gto._SPH_COEF[super_sh[ib].l]
                        tc = gto._SPH_COEF[super_sh[ic].l]
                        td = gto._SPH_COEF[super_sh[id_].l]
                        wa = np.array([gto._comp_w(super_sh[ia].l, c)
                                       for c in gto._CART_COMPS[super_sh[ia].l]])
                        wb = np.array([gto._comp_w(super_sh[ib].l, c)
                                       for c in gto._CART_COMPS[super_sh[ib].l]])
                        wc = np.array([gto._comp_w(super_sh[ic].l, c)
                                       for c in gto._CART_COMPS[super_sh[ic].l]])
                        wd = np.array([gto._comp_w(super_sh[id_].l, c)
                                       for c in gto._CART_COMPS[super_sh[id_].l]])
                        sph = np.einsum(
                            "pqrsabcd,am,bn,co,dk->pqrsmnok",
                            blk,
                            ta * wa[:, None], tb * wb[:, None],
                            tc * wc[:, None], td * wd[:, None],
                            optimize=True)
                        ra, rb = sph_rows[ia], sph_rows[ib]
                        rc, rd = sph_rows[ic], sph_rows[id_]
                        na, ma = ra.shape
                        nb_, mb = rb.shape
                        nc_, mc = rc.shape
                        nd_, md = rd.shape
                        eri[np.ix_(ra.reshape(-1), rb.reshape(-1),
                                   rc.reshape(-1), rd.reshape(-1))] = (
                            sph.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(
                                na * ma, nb_ * mb, nc_ * mc, nd_ * md))
        scale = 1.0 / np.sqrt(np.diag(s_m))
        s_m *= np.outer(scale, scale)
        t_m *= np.outer(scale, scale)
        v_m *= np.outer(scale, scale)
        eri = eri * (scale[:, None, None, None] * scale[None, :, None, None]
                     * scale[None, None, :, None]
                     * scale[None, None, None, :])
        return s_m, t_m, v_m, eri
