"""Derive the Ne cc-pVQZ s/p contraction coefficients by the Dunning
construction: the contracted (1s, 2s, 2p) functions ARE the atomic-HF
orbitals of the UNCONTRACTED (12s, 6p) HF set (Dunning, JCP 90, 1007
(1989), sec. II; same derivation that reproduced the published cc-pVDZ
1s/2p rows to < 5e-7, fries_tpu/basis.py round-4 note).

Since the reference's Input_Data/Neon_ccpvqz.zip is not in the repo, the
exponents below are the standard published cc-pVQZ values and the
validation is the atomic RHF total energy against the literature value
E_HF(Ne, cc-pVQZ) = -128.543470 Ha; the contraction coefficients are then
re-derived variationally, which is insensitive (second order) to any
residual exponent uncertainty.

Prints the coefficient rows to paste into fries_tpu/basis.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import numpy as np

from fries_tpu import basis as basis_data
from fries_tpu import gto


def atomic_rhf_uncontracted(s_exps, p_exps, n_elec=10, z=10):
    """RHF of an atom in an uncontracted (s, p) primitive set; returns
    (e_tot, mo_coef_s (ns, ns), mo_energy, s_block_slice, p_slices)."""
    shells = []
    for e in s_exps:
        shells.append(gto.Shell(0, np.zeros(3), [e], [1.0], 0))
    for e in p_exps:
        shells.append(gto.Shell(1, np.zeros(3), [e], [1.0], 0))
    # one-electron + ERI over spherical AOs via the cc engine
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

    centers = np.zeros((1, 3))
    charges = np.asarray([float(z)])
    s_ao = contract2(lambda la, lb, a, b, ca, cb:
                     gto._overlap_prim(la, lb, a, b, ca, cb)[0])
    t_ao = contract2(gto._kinetic_prim)
    v_ao = contract2(lambda la, lb, a, b, ca, cb: gto._nuclear_prim(
        la, lb, a, b, ca, cb, centers, charges))
    eri = gto.eri_cart(shells)
    w = np.array([gto._comp_w(sum(lmn), lmn) for _, lmn in cart_meta])
    s_ao *= np.outer(w, w)
    t_ao *= np.outer(w, w)
    v_ao *= np.outer(w, w)
    eri = eri * (w[:, None, None, None] * w[None, :, None, None]
                 * w[None, None, :, None] * w[None, None, None, :])
    m, _ = gto.sph_transform(shells)
    s_ao = m.T @ s_ao @ m
    t_ao = m.T @ t_ao @ m
    v_ao = m.T @ v_ao @ m
    eri = np.einsum("ijkl,ip,jq,kr,ls->pqrs", eri, m, m, m, m,
                    optimize=True)
    scale = 1.0 / np.sqrt(np.diag(s_ao))
    s_ao *= np.outer(scale, scale)
    t_ao *= np.outer(scale, scale)
    v_ao *= np.outer(scale, scale)
    eri = eri * (scale[:, None, None, None] * scale[None, :, None, None]
                 * scale[None, None, :, None] * scale[None, None, None, :])

    hcore = t_ao + v_ao
    nocc = n_elec // 2
    # symmetric orthogonalization + simple damped SCF
    ev, U = np.linalg.eigh(s_ao)
    X = U @ np.diag(ev ** -0.5) @ U.T
    f = hcore
    dm = None
    e_old = 0.0
    for it in range(200):
        fo = X.T @ f @ X
        mo_e, C = np.linalg.eigh(fo)
        C = X @ C
        dm_new = 2.0 * C[:, :nocc] @ C[:, :nocc].T
        dm = dm_new if dm is None else 0.7 * dm_new + 0.3 * dm
        J = np.einsum("ijkl,kl->ij", eri, dm)
        K = np.einsum("ikjl,kl->ij", eri, dm)
        f = hcore + J - 0.5 * K
        e = 0.5 * np.sum(dm * (hcore + f))
        if abs(e - e_old) < 1e-12 and it > 5:
            break
        e_old = e
    return e, C, mo_e, scale


def main():
    s_all = list(basis_data._NE_QZ_S_EXP)
    p_all = list(basis_data._NE_QZ_P_EXP)
    print(f"# 12s: {s_all}\n# 6p: {p_all}")
    e, C, mo_e, scale = atomic_rhf_uncontracted(s_all, p_all)
    print(f"# uncontracted RHF e_tot = {e:.8f}  (literature cc-pVQZ "
          f"-128.543470; uncontracted should be slightly below)")
    ns = len(s_all)
    # s-block AOs come first (ordering of shells above); find 1s/2s MOs as
    # the two lowest MOs with s character
    s_rows = np.arange(ns)
    for name, mo in (("1s", 0), ("2s", 1)):
        # identify the mo-th s-type orbital by weight
        s_mos = [i for i in range(C.shape[1])
                 if np.abs(C[s_rows, i]).sum() > 1e-6]
        c = C[s_rows, s_mos[mo]]
        if c[np.abs(c).argmax()] < 0:
            c = -c
        print(f"# {name} contraction over 12s:")
        print("[" + ",\n ".join(f"{v:.7f}" for v in c) + "]")
    # 2p: lowest p MO; p AOs follow the s block, 3 components each - use
    # the x component rows (every 3rd)
    npr = len(p_all)
    px_rows = ns + 3 * np.arange(npr)
    p_mos = [i for i in range(C.shape[1])
             if np.abs(C[px_rows, i]).sum() > 1e-6]
    c = C[px_rows, p_mos[0]]
    if c[np.abs(c).argmax()] < 0:
        c = -c
    print("# 2p contraction over 6p:")
    print("[" + ",\n ".join(f"{v:.7f}" for v in c) + "]")


if __name__ == "__main__":
    main()
