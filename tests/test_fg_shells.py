"""f/g-shell (l=3,4) integral machinery for the cc-pVQZ capability
(Results.tex:84-90 Ne/cc-pVQZ).  The McMurchie-Davidson engine in gto.py is
l-generic; these tests pin the new spherical-harmonic tables:

* within-shell spherical overlap == identity (exact cartesian normalization
  ratios + mutually orthogonal solid harmonics),
* rotational invariance of the 2-center spectrum (overlap, hcore, ERI) --
  any error in the l=3,4 transform columns breaks invariance.
"""

import numpy as np
import pytest

from fries_tpu import gto


def _overlap_sph(shells):
    aos, cart_meta = gto._shell_aos(shells)
    n = len(aos)
    m = np.zeros((n, n))
    for i, A in enumerate(aos):
        for j, B in enumerate(aos[: i + 1]):
            s = 0.0
            for a, da in zip(A.exps, A.coefs):
                for b, db in zip(B.exps, B.coefs):
                    s += da * db * gto._overlap_prim(
                        A.lmn, B.lmn, a, b, A.center, B.center)[0]
            m[i, j] = m[j, i] = s
    w = np.array([gto._comp_w(sum(lmn), lmn) for _, lmn in cart_meta])
    m = m * np.outer(w, w)
    t, _ = gto.sph_transform(shells)
    return t.T @ m @ t


@pytest.mark.parametrize("l", [3, 4])
def test_sph_shell_orthonormal(l):
    sh = [gto.Shell(l, np.zeros(3), [1.3, 0.4], [0.6, 0.5], 0)]
    so = _overlap_sph(sh)
    sc = 1.0 / np.sqrt(np.diag(so))
    so = so * np.outer(sc, sc)
    np.testing.assert_allclose(so, np.eye(2 * l + 1), atol=1e-12)


def _rot(axis, theta):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    a = np.cos(theta / 2)
    b, c, d = -axis * np.sin(theta / 2)
    return np.array([
        [a*a+b*b-c*c-d*d, 2*(b*c+a*d), 2*(b*d-a*c)],
        [2*(b*c-a*d), a*a+c*c-b*b-d*d, 2*(c*d+a*b)],
        [2*(b*d+a*c), 2*(c*d-a*b), a*a+d*d-b*b-c*c],
    ])


def _sorted_eigs(m):
    return np.sort(np.linalg.eigvalsh(m))


def test_fg_rotational_invariance():
    """Spectra of S, hcore and a fixed ERI contraction must be invariant
    under rigid rotation of a 2-center (f + g) system."""
    r = _rot([0.3, 1.1, -0.7], 0.9)
    c2 = np.array([0.8, -0.4, 0.5])

    def build(rot):
        sym = ("X", "Y")
        centers = np.stack([np.zeros(3), rot @ c2])
        shells = [
            gto.Shell(3, centers[0], [0.9], [1.0], 0),
            gto.Shell(4, centers[1], [1.1], [1.0], 1),
        ]
        aos, cart_meta = gto._shell_aos(shells)
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

        charges = np.array([2.0, 3.0])
        s_ao = contract2(lambda la, lb, a, b, ca, cb:
                         gto._overlap_prim(la, lb, a, b, ca, cb)[0])
        t_ao = contract2(gto._kinetic_prim)
        v_ao = contract2(lambda la, lb, a, b, ca, cb: gto._nuclear_prim(
            la, lb, a, b, ca, cb, centers, charges))
        eri = gto.eri_cart(shells)
        w = np.array([gto._comp_w(sum(lmn), lmn) for _, lmn in cart_meta])
        for m2 in (s_ao, t_ao, v_ao):
            m2 *= np.outer(w, w)
        eri = eri * (w[:, None, None, None] * w[None, :, None, None]
                     * w[None, None, :, None] * w[None, None, None, :])
        t, _ = gto.sph_transform(shells)
        s_s = t.T @ s_ao @ t
        h_s = t.T @ (t_ao + v_ao) @ t
        eri_s = np.einsum("ijkl,ip,jq,kr,ls->pqrs", eri, t, t, t, t,
                          optimize=True)
        sc = 1.0 / np.sqrt(np.diag(s_s))
        s_s *= np.outer(sc, sc)
        h_s *= np.outer(sc, sc)
        eri_s = eri_s * (sc[:, None, None, None] * sc[None, :, None, None]
                         * sc[None, None, :, None] * sc[None, None, None, :])
        return s_s, h_s, eri_s

    s0, h0, e0 = build(np.eye(3))
    s1, h1, e1 = build(r)
    np.testing.assert_allclose(_sorted_eigs(s0), _sorted_eigs(s1), atol=1e-10)
    np.testing.assert_allclose(_sorted_eigs(h0), _sorted_eigs(h1), atol=1e-9)
    # ERI invariants: full contraction with the (rotation-invariant) overlap
    np.testing.assert_allclose(
        np.einsum("ijkl,ij,kl->", e0, s0, s0),
        np.einsum("ijkl,ij,kl->", e1, s1, s1), rtol=1e-10)
    np.testing.assert_allclose(
        np.einsum("ijkl,ik,jl->", e0, s0, s0),
        np.einsum("ijkl,ik,jl->", e1, s1, s1), rtol=1e-10)
