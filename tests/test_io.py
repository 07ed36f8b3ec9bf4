"""I/O round-trip tests: FCIDUMP write/parse, HF-dir parse, vector files,
Dice reader, Hubbard params."""

import numpy as np
import jax.numpy as jnp

import dense_fci
from fries_tpu import io, synth
from fries_tpu.ops import molecule as mol


def test_fcidump_roundtrip(tmp_path):
    ham = synth.make_system(6, 4, symm=np.array([0, 1, 2, 3, 0, 1], np.int32),
                            seed=5)
    path = tmp_path / "FCIDUMP"
    io.write_fcidump(ham, path, point_group="D2h", core_energy=-7.5)
    ham2, core = io.parse_fcidump(path, point_group="D2h")
    assert core == -7.5
    assert ham2.n_orb == ham.n_orb and ham2.n_elec == ham.n_elec
    np.testing.assert_array_equal(np.asarray(ham2.symm), np.asarray(ham.symm))
    np.testing.assert_allclose(np.asarray(ham2.hcore), np.asarray(ham.hcore),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(ham2.eris), np.asarray(ham.eris),
                               atol=1e-14)


def test_vec_txt_roundtrip(tmp_path):
    keys = np.asarray([[0x1F00001F, 0], [0x2F00002F, 0]], np.uint32)
    vals = np.asarray([0.5, -1.25])
    io.save_vec_txt(str(tmp_path / "v_"), keys, vals, 64)
    k2, v2 = io.load_vec_txt(str(tmp_path / "v_"), 64)
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_allclose(v2, vals)


def test_dice_reader(tmp_path):
    text = (
        "State :   0\n"
        "0  0.9746  2 2 0 0 0\n"
        "1  -0.100  2 a b 0 0\n"
        "2  0.0000001  2 0 2 0 0\n"
        "State :   1\n"
        "0  0.8  a b 2 0 0\n"
    )
    p = tmp_path / "dice.out"
    p.write_text(text)
    keys, vals = io.load_vec_dice(p, 5, 10, state=0)
    assert len(vals) == 2  # tiny third amplitude dropped
    # first det: orbitals 0,1 doubly occupied -> bits 0,1,5,6
    mask = 0
    for w in range(keys.shape[1]):
        mask |= int(keys[0, w]) << (32 * w)
    assert mask == (0b11 | (0b11 << 5))
    # second det: orb0 doubly, orb1 alpha, orb2 beta
    mask = 0
    for w in range(keys.shape[1]):
        mask |= int(keys[1, w]) << (32 * w)
    assert mask == (0b1 | (0b10) | (1 << 5) | (1 << 7))
    keys1, vals1 = io.load_vec_dice(p, 5, 10, state=1)
    assert len(vals1) == 1 and vals1[0] == 0.8


def test_hf_dir_and_hh_params(tmp_path):
    # build a small HF-directory in the reference format
    n = 4
    rng = np.random.default_rng(0)
    h, eris = dense_fci.random_integrals(rng, n)
    np.savetxt(tmp_path / "hcore.txt", h, delimiter=",")
    with open(tmp_path / "eris.txt", "w") as f:
        for block in eris.reshape(n * n, n * n):
            f.write(",".join(repr(float(x)) for x in block) + "\n")
    (tmp_path / "symm.txt").write_text("0,\n1,\n0,\n1,\n")
    (tmp_path / "sys_params.txt").write_text(
        "n_elec\n4\nn_frozen\n0\nn_orb\n4\neps\n0.001\nhf_energy\n-3.25\n"
    )
    ham, params = io.parse_hf_input(tmp_path)
    assert params["hf_energy"] == -3.25
    np.testing.assert_allclose(np.asarray(ham.hcore), h)
    np.testing.assert_allclose(np.asarray(ham.eris), eris)
    np.testing.assert_array_equal(np.asarray(ham.symm), [0, 1, 0, 1])

    (tmp_path / "hh.txt").write_text(
        "n_elec\n6\nlat_len\n6\nn_dim\n1\neps\n0.001\nU\n2\nomega\n0\ng\n0\n"
        "hf_energy\n-3.9879\n"
    )
    p = io.parse_hh_input(tmp_path / "hh.txt")
    assert p["n_elec"] == 6 and p["u"] == 2.0 and p["gs_energy"] == -3.9879


def test_load_last_line(tmp_path):
    (tmp_path / "S.txt").write_text("0.0\n-0.1\n-0.25\n")
    out = io.load_last_line(tmp_path / "S.txt")
    np.testing.assert_allclose(out, [-0.25])


def test_fcidump_frozen_core_roundtrip(tmp_path):
    """A frozen-core Hamiltonian written to FCIDUMP (downfolded active
    space) must reproduce the same spectrum as the original: HF diagonal
    (minus the frozen/core constant) and the full dense FCI spectrum."""
    rng = np.random.default_rng(3)
    tot = 7
    h = rng.standard_normal((tot, tot)) * 0.3
    h = (h + h.T) / 2 - np.diag(np.arange(tot, dtype=float))
    eri_chem = rng.standard_normal((tot,) * 4) * 0.05
    eri_chem = (eri_chem + eri_chem.transpose(1, 0, 2, 3)) / 2
    eri_chem = (eri_chem + eri_chem.transpose(0, 1, 3, 2)) / 2
    eri_chem = (eri_chem + eri_chem.transpose(2, 3, 0, 1)) / 2
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(h),
        eris=jnp.asarray(eri_chem.transpose(0, 2, 1, 3)),
        symm=jnp.zeros(5, jnp.int32), n_orb=5, n_elec=4, n_frozen=4,
    )
    path = tmp_path / "FCIDUMP"
    io.write_fcidump(ham, path, core_energy=1.25)
    ham2, core2 = io.parse_fcidump(path)
    assert ham2.n_orb == 5 and ham2.n_frozen == 0

    occ = mol.hf_reference(ham)[1][None]
    occ2 = mol.hf_reference(ham2)[1][None]
    e1 = float(mol.diag_matrel(ham, occ)[0])
    e2 = float(mol.diag_matrel(ham2, occ2)[0])
    np.testing.assert_allclose(e1 + 1.25, e2 + core2, atol=1e-10)

    h_full, _ = dense_fci.build_hamiltonian(
        np.asarray(ham2.hcore), np.asarray(ham2.eris), 5, 2, 2)
    e_fci2 = dense_fci.ground_state(h_full)[0] + core2
    # frozen-core reference spectrum: freeze by explicit downfold here too,
    # but through the independent dense-FCI path on the original integrals
    f = 2
    eri_c = eri_chem
    core_ref = 1.25 + 2.0 * np.trace(h[:f, :f]) + (
        2.0 * np.einsum("iijj->", eri_c[:f, :f, :f, :f])
        - np.einsum("ijji->", eri_c[:f, :f, :f, :f]))
    heff = (h + 2.0 * np.einsum("pqii->pq", eri_c[:, :, :f, :f])
            - np.einsum("piiq->pq", eri_c[:, :f, :f, :]))[f:, f:]
    h_ref, _ = dense_fci.build_hamiltonian(
        heff, eri_c[f:, f:, f:, f:].transpose(0, 2, 1, 3), 5, 2, 2)
    e_ref = dense_fci.ground_state(h_ref)[0] + core_ref
    np.testing.assert_allclose(e_fci2, e_ref, atol=1e-9)


def test_write_hf_dir_roundtrip(tmp_path):
    ham = synth.make_system(5, 4, seed=9)
    ham = mol.MolecularHamiltonian(
        hcore=ham.hcore, eris=ham.eris, symm=ham.symm[1:], n_orb=4,
        n_elec=2, n_frozen=2)
    io.write_hf_dir(ham, tmp_path / "hf", eps=0.001, hf_energy=-12.5)
    ham2, params = io.parse_hf_input(tmp_path / "hf")
    assert params["hf_energy"] == -12.5 and params["eps"] == 0.001
    assert ham2.n_orb == ham.n_orb and ham2.n_elec == ham.n_elec
    assert ham2.n_frozen == ham.n_frozen
    np.testing.assert_allclose(np.asarray(ham2.hcore),
                               np.asarray(ham.hcore), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ham2.eris),
                               np.asarray(ham.eris), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(ham2.symm),
                                  np.asarray(ham.symm))
