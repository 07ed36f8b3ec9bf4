"""Native C++ I/O layer (fries_tpu/native) vs the pure-Python readers.

The native library is the analogue of the reference's C++ ingest
(io_utils.cpp:241-318 FCIDUMP records, :410-482 vector files); these tests
pin bit-identical agreement between the two paths on generated files.
"""

import numpy as np
import pytest

from fries_tpu import io as fio
from fries_tpu import native, synth


@pytest.fixture(scope="module")
def nlib():
    l = native.lib()
    if l is None:
        pytest.skip("native library unavailable (no g++?)")
    return l


def test_fcidump_native_matches_python(tmp_path, nlib):
    ham = synth.make_system(
        6, 4, symm=np.array([0, 1, 2, 3, 0, 1], np.int32), seed=3
    )
    path = tmp_path / "FCIDUMP"
    fio.write_fcidump(ham, path, point_group="d2", core_energy=-7.25)

    ham_n, core_n = fio.parse_fcidump(path, "d2", native=True)
    ham_p, core_p = fio.parse_fcidump(path, "d2", native=False)

    assert core_n == core_p
    np.testing.assert_array_equal(np.asarray(ham_n.hcore), np.asarray(ham_p.hcore))
    np.testing.assert_array_equal(np.asarray(ham_n.eris), np.asarray(ham_p.eris))
    np.testing.assert_array_equal(np.asarray(ham_n.symm), np.asarray(ham_p.symm))
    assert ham_n.n_orb == ham_p.n_orb and ham_n.n_elec == ham_p.n_elec


def test_fcidump_native_skips_malformed_lines(tmp_path, nlib):
    path = tmp_path / "FCIDUMP"
    path.write_text(
        "&FCI NORB=2, NELEC=2, MS2=0,\n ORBSYM=1,1\n&END\n"
        "  0.5 1 1 1 1\n"
        "this line is not a record\n"
        "  0.25 1 2 1 2\n"
        "  1.0 1 1 0 0\n"
        "  0.125 1 1 1 1 7\n"      # six fields: skipped
        "  -3.5 0 0 0 0\n"
    )
    ham_n, core_n = fio.parse_fcidump(path, "c1", native=True)
    ham_p, core_p = fio.parse_fcidump(path, "c1", native=False)
    assert core_n == core_p == -3.5
    np.testing.assert_array_equal(np.asarray(ham_n.hcore), np.asarray(ham_p.hcore))
    np.testing.assert_array_equal(np.asarray(ham_n.eris), np.asarray(ham_p.eris))
    assert float(np.asarray(ham_n.hcore)[0, 0]) == 1.0
    assert float(np.asarray(ham_n.eris)[0, 0, 0, 0]) == 0.5


def test_vector_files_native_matches_python(tmp_path, nlib):
    rng = np.random.default_rng(11)
    n_bits = 20
    masks = rng.integers(0, 1 << n_bits, size=37, dtype=np.uint64)
    vals = rng.standard_normal(37)
    prefix = tmp_path / "vec"
    keys = np.zeros((37, 1), np.uint32)
    keys[:, 0] = masks.astype(np.uint32)
    fio.save_vec_txt(prefix, keys, vals, n_bits)

    k_n, v_n = fio.load_vec_txt(prefix, n_bits)
    import os

    os.environ["FRIES_NATIVE"] = "0"
    native.lib.cache_clear()
    try:
        k_p, v_p = fio.load_vec_txt(prefix, n_bits)
    finally:
        del os.environ["FRIES_NATIVE"]
        native.lib.cache_clear()
    np.testing.assert_array_equal(k_n, k_p)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_array_equal(v_n, vals)


def test_load_rdm_native(tmp_path, nlib):
    path = tmp_path / "rdm.txt"
    data = np.linspace(-2.0, 2.0, 101)
    path.write_text(" ".join(repr(float(x)) for x in data))
    np.testing.assert_array_equal(fio.load_rdm(path), data)
