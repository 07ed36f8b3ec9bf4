"""Minimal-basis (STO-3G, s-type) molecular integrals for hydrogen systems.

The reference validates against real-molecule integrals it does not ship
(Input_Data references eris.txt that is absent); this module makes the
framework self-sufficient for at least one *real* molecule: closed-form
contracted-Gaussian s-orbital integrals (overlap, kinetic, nuclear
attraction, ERIs - standard McMurchie-Davidson specialized to l=0, see e.g.
Szabo & Ostlund appendix A) for H_n geometries, assembled into a
:class:`fries_tpu.ops.molecule.MolecularHamiltonian` in a Löwdin-
orthogonalized basis (the FCI energy is invariant to the orthonormal-basis
choice, so no SCF is required for exactness).

Anchor: H2 at R = 1.4 bohr in STO-3G has the textbook FCI total energy
-1.13728 Ha (Szabo & Ostlund Table 3.15: E_HF = -1.11671, E_corr =
-0.02056); tests/test_sto3g.py checks our integrals reproduce it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.special import erf

from fries_tpu.ops import molecule as mol

# STO-3G hydrogen 1s: exponents (zeta=1.24 scaled) and contraction coeffs
_H_EXPS = np.array([3.42525091, 0.62391373, 0.16885540])
_H_COEFS = np.array([0.15432897, 0.53532814, 0.44463454])


def _f0(x):
    """Boys function F0(x) = (1/2) sqrt(pi/x) erf(sqrt(x)), F0(0) = 1."""
    x = np.asarray(x, float)
    small = x < 1e-12
    xs = np.where(small, 1.0, x)
    return np.where(small, 1.0, 0.5 * np.sqrt(np.pi / xs) * erf(np.sqrt(xs)))


def _prims(centers):
    """Flatten contracted s-AOs into primitive lists (alpha, center, coef
    including the primitive normalization (2a/pi)^(3/4))."""
    alphas, cents, coefs, ao = [], [], [], []
    for i, c in enumerate(np.asarray(centers, float)):
        for a, d in zip(_H_EXPS, _H_COEFS):
            alphas.append(a)
            cents.append(c)
            coefs.append(d * (2.0 * a / np.pi) ** 0.75)
            ao.append(i)
    return (np.asarray(alphas), np.asarray(cents), np.asarray(coefs),
            np.asarray(ao))


def integrals(centers, charges=None):
    """AO-basis (S, T, V, ERI-chemist) for s-type STO-3G functions at
    ``centers`` ((n, 3) bohr) with nuclear ``charges`` (default all 1)."""
    centers = np.atleast_2d(np.asarray(centers, float))
    n = len(centers)
    if charges is None:
        charges = np.ones(n)
    al, ce, co, ao = _prims(centers)
    npr = len(al)
    s_p = np.zeros((npr, npr))
    t_p = np.zeros((npr, npr))
    v_p = np.zeros((npr, npr))
    for i in range(npr):
        for j in range(npr):
            a, b = al[i], al[j]
            p = a + b
            ab2 = float(np.sum((ce[i] - ce[j]) ** 2))
            k = np.exp(-a * b / p * ab2)
            s_p[i, j] = (np.pi / p) ** 1.5 * k
            t_p[i, j] = a * b / p * (3.0 - 2.0 * a * b / p * ab2) * s_p[i, j]
            pc = (a * ce[i] + b * ce[j]) / p
            v = 0.0
            for cc, z in zip(centers, charges):
                pc2 = float(np.sum((pc - cc) ** 2))
                v -= z * 2.0 * np.pi / p * k * float(_f0(p * pc2))
            v_p[i, j] = v
    w = np.outer(co, co)
    s_ao = np.zeros((n, n))
    t_ao = np.zeros((n, n))
    v_ao = np.zeros((n, n))
    for i in range(npr):
        for j in range(npr):
            s_ao[ao[i], ao[j]] += w[i, j] * s_p[i, j]
            t_ao[ao[i], ao[j]] += w[i, j] * t_p[i, j]
            v_ao[ao[i], ao[j]] += w[i, j] * v_p[i, j]

    # (ij|kl) chemist ERIs over primitives, contracted
    eri_ao = np.zeros((n, n, n, n))
    for i in range(npr):
        for j in range(npr):
            a, b = al[i], al[j]
            p = a + b
            pcen = (a * ce[i] + b * ce[j]) / p
            kab = np.exp(-a * b / p * float(np.sum((ce[i] - ce[j]) ** 2)))
            for k in range(npr):
                for l in range(npr):
                    c, d = al[k], al[l]
                    q = c + d
                    qcen = (c * ce[k] + d * ce[l]) / q
                    kcd = np.exp(
                        -c * d / q * float(np.sum((ce[k] - ce[l]) ** 2))
                    )
                    pq2 = float(np.sum((pcen - qcen) ** 2))
                    val = (
                        2.0 * np.pi ** 2.5
                        / (p * q * np.sqrt(p + q))
                        * kab * kcd
                        * float(_f0(p * q / (p + q) * pq2))
                    )
                    eri_ao[ao[i], ao[j], ao[k], ao[l]] += (
                        co[i] * co[j] * co[k] * co[l] * val
                    )
    return s_ao, t_ao, v_ao, eri_ao


def nuclear_repulsion(centers, charges=None):
    centers = np.atleast_2d(np.asarray(centers, float))
    n = len(centers)
    if charges is None:
        charges = np.ones(n)
    e = 0.0
    for i in range(n):
        for j in range(i):
            e += charges[i] * charges[j] / np.linalg.norm(
                centers[i] - centers[j]
            )
    return e


def rhf(s, hcore_ao, eri_chem, n_elec, max_iter=300, tol=1e-10, damp=0.3):
    """Closed-shell restricted Hartree-Fock in the AO basis.

    Returns (C, e_hf_electronic): MO coefficients (AO x MO, occupied
    first) and the converged electronic HF energy.  Plain Roothaan
    iterations with density damping — adequate for the small s-orbital
    systems this module targets.  (The reference consumes HF-canonical
    integrals prepared externally, e.g. Input_Data sys_params.txt
    hf_energy + hcore/eris files; this makes the framework able to
    prepare its own.)
    """
    n_occ = n_elec // 2
    evals, evecs = np.linalg.eigh(s)
    x = evecs @ np.diag(evals ** -0.5) @ evecs.T
    c = None
    d = np.zeros_like(s)
    e_old = 0.0
    for it in range(max_iter):
        g = (np.einsum("ijkl,kl->ij", eri_chem, d, optimize=True)
             - 0.5 * np.einsum("ikjl,kl->ij", eri_chem, d, optimize=True))
        f = hcore_ao + g
        e_el = 0.5 * np.sum(d * (hcore_ao + f))
        fp = x.T @ f @ x
        _, cp = np.linalg.eigh(fp)
        c = x @ cp
        d_new = 2.0 * c[:, :n_occ] @ c[:, :n_occ].T
        d = d_new if it == 0 else (1.0 - damp) * d_new + damp * d
        if abs(e_el - e_old) < tol and it > 1:
            break
        e_old = e_el
    return c, e_el


def h_chain(bond_length: float, n_atoms: int = 2, basis: str = "lowdin"):
    """Linear H_n chain at uniform ``bond_length`` (bohr) ->
    (MolecularHamiltonian, core_energy).  ``basis="lowdin"`` uses
    symmetric-orthogonalized AOs (S^{-1/2}; no SCF, FCI energy identical);
    ``basis="rhf"`` uses canonical RHF molecular orbitals — the reference's
    production setting (its HF determinant is the FRI/FCIQMC starting and
    trial state, so a concentrated wavefunction needs HF-canonical
    orbitals).  eris stored physicist ``<pq|rs>``."""
    centers = np.zeros((n_atoms, 3))
    centers[:, 2] = bond_length * np.arange(n_atoms)
    s, t, v, eri_chem = integrals(centers)
    if basis == "rhf":
        x, _ = rhf(s, t + v, eri_chem, n_atoms)
    else:
        evals, evecs = np.linalg.eigh(s)
        x = evecs @ np.diag(evals ** -0.5) @ evecs.T  # Löwdin S^{-1/2}
    hcore = x.T @ (t + v) @ x
    eri = np.einsum("ijkl,ip,jq,kr,ls->pqrs", eri_chem, x, x, x, x,
                    optimize=True)
    eri_phys = np.transpose(eri, (0, 2, 1, 3))  # (pq|rs) -> <pr|qs>
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(hcore),
        eris=jnp.asarray(eri_phys),
        symm=jnp.zeros(n_atoms, jnp.int32),
        n_orb=n_atoms,
        n_elec=n_atoms,
    )
    return ham, nuclear_repulsion(centers)
