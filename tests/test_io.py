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
