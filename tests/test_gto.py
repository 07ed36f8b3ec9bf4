"""Real-molecule integrals beyond H chains: s/p-shell STO-3G
(fries_tpu/gto.py) anchored to the published Crawford-projects H2O numbers,
then driven through the full framework stack (RHF -> canonical-MO
Hamiltonian -> dense FCI -> frisys projected energy).

These are the reference's own molecule families (H2O: Results.tex:44-53;
N2: Results.tex:64-71) in a smaller basis, prepared entirely by this
framework with no external quantum-chemistry dependency.
"""

import numpy as np
import pytest

import dense_fci
from fries_tpu import gto, sto3g
from fries_tpu.drivers import frisys
from fries_tpu.ops import molecule as mol

E_H2O_SCF_LIT = -74.942079928192   # Crawford programming projects, STO-3G
E_NUC_H2O_LIT = 8.002367061811


@pytest.fixture(scope="module")
def water_integrals():
    return gto.integrals(*gto.WATER_GEOM)


def test_h2o_scf_matches_published(water_integrals):
    s, t, v, eri, e_nuc = water_integrals
    assert abs(e_nuc - E_NUC_H2O_LIT) < 1e-9
    _, e_el = sto3g.rhf(s, t + v, eri, 10)
    assert abs((e_el + e_nuc) - E_H2O_SCF_LIT) < 1e-9


def test_s_only_cross_check():
    """gto.integrals on an H chain agrees with the closed-form s-only
    module (to the contraction-renormalization level ~1e-8)."""
    cen = np.array([[0, 0, 0], [0, 0, 1.4], [0, 0, 2.8]], float)
    s1, t1, v1, e1 = sto3g.integrals(cen)
    s2, t2, v2, e2, _ = gto.integrals(("H", "H", "H"), cen)
    for a, b in ((s1, s2), (t1, t2), (v1, v2), (e1, e2)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-6


@pytest.fixture(scope="module")
def water_ham():
    return gto.water()


def test_h2o_hf_diag_equals_scf(water_ham, water_integrals):
    """Slater-Condon diagonal of the HF determinant in the canonical-MO
    basis == converged SCF electronic energy (validates the MO transform
    against the framework's own matrix elements)."""
    ham, core = water_ham
    s, t, v, eri, e_nuc = water_integrals
    _, e_el = sto3g.rhf(s, t + v, eri, 10)
    assert abs(float(mol.hf_reference(ham)[2]) - e_el) < 1e-8
    assert abs(core - e_nuc) < 1e-12


def test_h2o_frozen_core_fci(water_ham):
    """Frozen-core folding: FCI(frozen O-1s) within millihartrees of the
    all-electron FCI (the 1s core is inert), and both below E_SCF."""
    ham, core = water_ham
    H, _ = dense_fci.build_hamiltonian(
        np.asarray(ham.hcore), np.asarray(ham.eris), 7, 5, 5)
    e_all, _ = dense_fci.ground_state(H)
    e_fci = e_all + core

    ham_fz, core_fz = gto.water(n_frozen=1)
    assert ham_fz.n_orb == 6 and ham_fz.n_elec == 8
    Hf, _ = dense_fci.build_hamiltonian(
        np.asarray(ham_fz.hcore), np.asarray(ham_fz.eris), 6, 4, 4)
    e_f, _ = dense_fci.ground_state(Hf)
    e_fci_fz = e_f + core_fz

    assert e_fci < E_H2O_SCF_LIT            # correlation lowers the energy
    assert 0 < (e_fci_fz - e_fci) < 2e-3    # core correlation is tiny
    # frozen-core HF determinant reproduces the SCF energy exactly
    assert abs(float(mol.hf_reference(ham_fz)[2]) + core_fz
               - E_H2O_SCF_LIT) < 1e-8


def test_h2o_frisys_matches_dense_fci():
    """The flagship driver on real H2O/STO-3G (frozen O-1s core, as the
    reference freezes cores in production): projected energy matches this
    molecule's dense FCI within statistics.  The all-electron Hamiltonian's
    ~33 Ha diagonal range (O 1s) would need eps < 2/range for power-method
    stability; freezing the core keeps the test fast at eps=0.03."""
    ham, core = gto.water(n_frozen=1)
    H, _ = dense_fci.build_hamiltonian(
        np.asarray(ham.hcore), np.asarray(ham.eris), 6, 4, 4)
    e0, _ = dense_fci.ground_state(H)
    cfg = frisys.FrisysConfig(
        eps=0.03, vec_nonz=120, matr_samp=800, capacity=512,
        spawn_cap=3000, target_norm=250.0,
    )
    step, run_steps, state, aux = frisys.build(ham, cfg, seed=4)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 1500,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[500:]
    den = np.asarray(traj["proj_den"])[500:]
    e_est = float(aux["e_ref"]) + num.sum() / den.sum()
    blocks = np.array_split(num, 8)
    dblocks = np.array_split(den, 8)
    bm = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = bm.std() / np.sqrt(len(bm))
    assert np.isfinite(e_est) and np.isfinite(sigma)
    assert abs(e_est - e0) < max(5 * sigma, 0.005), (e_est, e0, sigma)


def test_lih_fci_below_scf():
    ham, core = gto.lih()
    s, t, v, eri, e_nuc = gto.integrals(
        ("Li", "H"), np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 3.015]]))
    _, e_el = sto3g.rhf(s, t + v, eri, 4)
    H, _ = dense_fci.build_hamiltonian(
        np.asarray(ham.hcore), np.asarray(ham.eris), 6, 2, 2)
    e0, _ = dense_fci.ground_state(H)
    assert abs(float(mol.hf_reference(ham)[2]) - e_el) < 1e-8
    assert -0.05 < (e0 - e_el) < 0.0   # modest correlation energy


def test_n2_frisys_compressed():
    """Compressed frisys on real N2/STO-3G (frozen 1s cores): 8 orbitals /
    10 electrons, FCI dim 3136, budgets well below the space — the
    reference's headline molecule family (N2_eqm/, Results.tex:64) run end
    to end on integrals this framework computed itself.  Measured
    (2026-08-19): E_HF -107.495842, E_FCI -107.652426."""
    ham, core = gto.n2(n_frozen=2)
    assert ham.n_orb == 8 and ham.n_elec == 10
    H, basis = dense_fci.build_hamiltonian(
        np.asarray(ham.hcore), np.asarray(ham.eris), 8, 5, 5)
    assert len(basis) == 3136
    e0, _ = dense_fci.ground_state(H)
    e_hf = float(mol.hf_reference(ham)[2])
    assert abs((e_hf + core) - (-107.495842)) < 1e-5
    assert -0.17 < (e0 - e_hf) < -0.14      # measured corr -0.156584

    cfg = frisys.FrisysConfig(
        eps=0.03, vec_nonz=700, matr_samp=4000, capacity=4096,
        spawn_cap=12000, target_norm=1200.0, init_thresh=1.0,
    )
    step, run_steps, state, aux = frisys.build(ham, cfg, seed=21)
    state, traj = run_steps(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 2000,
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    num = np.asarray(traj["proj_num"])[600:]
    den = np.asarray(traj["proj_den"])[600:]
    e_est = float(aux["e_ref"]) + num.sum() / den.sum()
    blocks = np.array_split(num, 10)
    dblocks = np.array_split(den, 10)
    bm = np.array([b.sum() / d.sum() for b, d in zip(blocks, dblocks)])
    sigma = bm.std() / np.sqrt(len(bm))
    assert np.isfinite(e_est) and np.isfinite(sigma)
    assert abs(e_est - e0) < max(5 * sigma, 0.004), (e_est, e0, sigma)
    nn = np.asarray(traj["nnonz"])[-100:]
    assert nn.max() <= cfg.vec_nonz * 1.2 + 64   # genuinely compressed
