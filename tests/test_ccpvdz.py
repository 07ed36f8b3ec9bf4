"""Validation of the correlation-consistent integral pipeline against the
reference's own surviving PySCF outputs.

The reference ships PySCF-generated HF data for its headline systems
(Input_Data/{N2_ccpvdz,H2O_ccpvdz,Neon_augccpvdz}; the eris.txt blobs were
stripped from the clone but sys_params.txt hf_energy, the full MO-basis
hcore.txt, and symm.txt survive).  These tests rebuild each system from
nothing but the geometry with fries_tpu.{basis,gto,scf} and require:

* electronic HF energy matches sys_params.txt to ~1e-6 Ha,
* every entry of the 28x28 (24x24, 23x23) MO-basis hcore matches after
  degenerate-pair/phase alignment,
* PySCF-convention irrep labels reproduce symm.txt exactly.

Geometries recovered from the energies themselves (root-finding against
hf_energy + the hcore matrix): N2 at 2.068 a0 (Booth et al. 2009 FCIQMC
geometry; e_elec matches to 1.7e-7), H2O at R_OH = 1.84345 a0 /
theta = 110.6 deg (e_elec matches to 4e-11).
"""

import os
from pathlib import Path

import numpy as np
import pytest

from fries_tpu import scf

_REF = Path("/root/reference/Input_Data")

pytestmark = pytest.mark.skipif(
    not _REF.exists(), reason="reference Input_Data not available")


def _load_ref(dirname, tot_orb):
    d = _REF / dirname
    txt = (d / "sys_params.txt").read_text().split()
    hf_energy = float(txt[txt.index("hf_energy") + 1])
    symm = [int(x) for x in (d / "symm.txt").read_text().split()]
    h = np.genfromtxt(d / "hcore.txt", delimiter=",")
    h = h.reshape(-1)[: tot_orb * tot_orb].reshape(tot_orb, tot_orb)
    return hf_energy, symm, h


def _check(ham, info, dirname, tot_orb, e_tol=5e-7, h_tol=1e-6):
    hf_energy, ref_symm, href = _load_ref(dirname, tot_orb)
    assert abs(info["e_elec"] - hf_energy) < e_tol
    perm, phases, err = scf.match_reference(
        np.asarray(info["hcore_mo"]), href, np.asarray(info["mo_energy"]),
        info["irreps"], ref_irreps=ref_symm)
    assert err < h_tol
    assert [int(info["irreps"][p]) for p in perm] == ref_symm
    # after the degenerate-ordering convention fix, the permutation should be
    # the identity (PySCF ordering reproduced directly)
    assert list(perm) == list(range(tot_orb))


N2_R = 2.068


def n2_centers(r=N2_R):
    return np.array([[0.0, 0.0, -r / 2], [0.0, 0.0, r / 2]])


H2O_R = 1.84345
H2O_THETA = np.deg2rad(110.6)


def h2o_centers():
    """Olsen-geometry water in the yz plane (PySCF's C2v orientation for
    the reference data: the in-plane bonding MO is b2)."""
    y = H2O_R * np.sin(H2O_THETA / 2)
    z = H2O_R * np.cos(H2O_THETA / 2)
    return np.array([[0.0, 0.0, 0.0], [0.0, y, z], [0.0, -y, z]])


def test_n2_ccpvdz_matches_reference():
    ham, info = scf.build_molecule(("N", "N"), n2_centers(),
                                   basis="cc-pvdz", n_frozen=4)
    _check(ham, info, "N2_ccpvdz", 28)
    assert ham.n_orb == 26 and ham.n_elec == 10 and ham.n_frozen == 4


def test_h2o_ccpvdz_matches_reference():
    ham, info = scf.build_molecule(("O", "H", "H"), h2o_centers(),
                                   basis="cc-pvdz", n_frozen=0)
    _check(ham, info, "H2O_ccpvdz", 24)


def test_ne_augccpvdz_matches_reference():
    ham, info = scf.build_molecule(("Ne",), np.zeros((1, 3)),
                                   basis="aug-cc-pvdz", n_frozen=2)
    # slightly looser: the re-derived 2s contraction reproduces the published
    # digits to ~1e-7, which amplifies to ~1e-5 in a few hcore entries
    _check(ham, info, "Neon_augccpvdz", 23, e_tol=1e-7, h_tol=3e-5)


def test_n2_literature_rhf_total_energy():
    """Independent anchor: N2/cc-pVDZ RHF at r = 2.118 a0 is -108.949378 Ha
    (Chan & Head-Gordon DMRG benchmark geometry)."""
    ham, info = scf.build_molecule(("N", "N"), n2_centers(2.118),
                                   basis="cc-pvdz", n_frozen=4)
    assert abs(info["e_hf_total"] - (-108.949378)) < 2e-6
