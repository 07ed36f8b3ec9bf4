"""Input/output: FCIDUMP and HF-directory integral parsers, Hubbard params,
trial-vector readers (text + Dice/SHCI), and FCIDUMP writing.

Re-implements FRIES/io_utils.{hpp,cpp} in numpy:

* ``parse_hf_input`` (io_utils.cpp:98-187): sys_params.txt + symm.txt +
  hcore.txt + eris.txt (dense n^4 CSV) directories.
* ``parse_fcidump`` (io_utils.cpp:241-318): NORB/NELEC/MS2/ORBSYM header and
  chemist-notation integral records; MOLPRO -> XOR-group irrep conversion for
  D2h/C2v/C2h/D2/Cs/C2/Ci/C1 (``convert_symm``, io_utils.cpp:189-239).
* ``parse_hh_input`` (io_utils.cpp:320-408): Hubbard-Holstein parameters.
* ``load_vec_txt`` / ``read_dets`` (io_utils.cpp:410-482, 565-586) and the
  Dice/SHCI determinant-string reader (``load_vec_dice``, io_utils.cpp:
  485-562).
* ``write_fcidump``: inverse of the parser (used to generate inputs for the
  C++ baseline and to export synthetic systems).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from fries_tpu import dets
from fries_tpu.ops import molecule as mol

# MOLPRO irrep label (1-based) -> XOR-group label, per point group
# (reference convert_symm, io_utils.cpp:189-239)
_SYMM_MAPS = {
    "d2h": [0, 7, 6, 1, 5, 2, 3, 4],
    "c2v": [0, 2, 3, 1],
    "c2h": [0, 2, 3, 1],
    "d2": [0, 3, 2, 1],
    "cs": [0, 1],
    "c2": [0, 1],
    "ci": [0, 1],
    "c1": [0],
}


def convert_symm(labels: np.ndarray, point_group: str) -> np.ndarray:
    pg = point_group.lower()
    if pg not in _SYMM_MAPS:
        raise ValueError(f"point group {point_group} not recognized")
    mapping = _SYMM_MAPS[pg]
    labels = np.asarray(labels, np.int64)
    if labels.min() < 1 or labels.max() > len(mapping):
        raise ValueError(
            f"irrep label out of range 1..{len(mapping)} for {point_group}"
        )
    return np.asarray([mapping[l - 1] for l in labels], np.int32)


def invert_symm(labels: np.ndarray, point_group: str) -> np.ndarray:
    """XOR-group labels -> MOLPRO 1-based labels (for FCIDUMP writing)."""
    mapping = _SYMM_MAPS[point_group.lower()]
    inv = {v: i + 1 for i, v in enumerate(mapping)}
    return np.asarray([inv[int(l)] for l in labels], np.int64)


def parse_fcidump(path, point_group: str = "C1", native: bool | None = None):
    """Parse an FCIDUMP file into (MolecularHamiltonian, core_energy).

    Integral records are chemist-notation (ij|kl); the dense physicist tensor
    is filled over all 8 symmetry images.  The record body is parsed by the
    native C++ reader (fries_tpu.native, the analogue of the reference's C++
    ingest in io_utils.cpp:241-318) when available; ``native=False`` forces
    the pure-Python loop, ``native=True`` requires the library.
    """
    raw = Path(path).read_bytes()
    header_end = raw.find(b"&END")
    if header_end < 0:
        header_end = raw.find(b"/")
    header = raw[:header_end].decode()
    body_off = raw.find(b"\n", header_end) + 1

    def field(name):
        m = re.search(name + r"\s*=\s*([0-9]+)", header)
        return int(m.group(1)) if m else None

    n_orb = field("NORB")
    n_elec = field("NELEC")
    ms2 = field("MS2")
    if ms2 not in (None, 0):
        raise ValueError("MS2 != 0 not supported (reference io_utils.cpp:259)")
    m = re.search(r"ORBSYM\s*=\s*([0-9,\s]+)", header)
    orbsym = np.asarray(
        [int(x) for x in m.group(1).replace("\n", " ").split(",") if x.strip()],
        np.int64,
    )
    if len(orbsym) != n_orb:
        raise ValueError("ORBSYM length does not match NORB")
    symm = convert_symm(orbsym, point_group)

    parsed = None
    if native is not False:
        from fries_tpu import native as _native

        parsed = _native.parse_fcidump_body(path, body_off, n_orb)
        if native is True and parsed is None:
            raise RuntimeError("native FCIDUMP parser unavailable")
    if parsed is not None:
        hcore, eris_chem, core_energy = parsed
    else:
        hcore, eris_chem, core_energy = _parse_fcidump_body_py(
            raw[body_off:].decode(), n_orb
        )
    eris_phys = np.transpose(eris_chem, (0, 2, 1, 3))
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(hcore),
        eris=jnp.asarray(eris_phys),
        symm=jnp.asarray(symm),
        n_orb=n_orb,
        n_elec=n_elec,
    )
    return ham, core_energy


def _parse_fcidump_body_py(body: str, n_orb: int):
    """Pure-Python FCIDUMP record loop (fallback for fries_tpu.native)."""
    hcore = np.zeros((n_orb, n_orb))
    eris_chem = np.zeros((n_orb,) * 4)
    core_energy = 0.0
    for line in body.splitlines():
        parts = line.split()
        if len(parts) != 5:
            continue
        val = float(parts[0])
        i, j, k, l = (int(x) for x in parts[1:])
        if i == j == k == l == 0:
            core_energy = val
        elif k == 0 and l == 0:
            if j == 0:
                continue  # orbital energies, ignored (io_utils.cpp:307-309)
            hcore[i - 1, j - 1] = hcore[j - 1, i - 1] = val
        else:
            i -= 1
            j -= 1
            k -= 1
            l -= 1
            for a, b in ((i, j), (j, i)):
                for c, d in ((k, l), (l, k)):
                    eris_chem[a, b, c, d] = eris_chem[c, d, a, b] = val
    return hcore, eris_chem, core_energy


def write_fcidump(ham: mol.MolecularHamiltonian, path, point_group: str = "C1",
                  core_energy: float = 0.0, threshold: float = 0.0):
    """Write the unique chemist-notation integrals of a Hamiltonian.

    A frozen core is downfolded into the active space before writing: the
    frozen orbitals' Coulomb/exchange field becomes an effective
    one-electron operator and their energy joins the core constant —
    exactly the frozen sums the reference's matrix elements apply on the
    fly (sing_matr_el/diag_matrel, molecule.cpp:45-105, 935-1029), so
    re-reading the file reproduces the same active-space spectrum with
    n_frozen = 0."""
    n = ham.tot_orb
    h = np.asarray(ham.hcore)
    eris_phys = np.asarray(ham.eris)
    eris_chem = np.transpose(eris_phys, (0, 2, 1, 3))
    if ham.n_frozen:
        f = ham.n_frozen // 2
        core_energy = core_energy + 2.0 * np.trace(h[:f, :f]) + (
            2.0 * np.einsum("iijj->", eris_chem[:f, :f, :f, :f])
            - np.einsum("ijji->", eris_chem[:f, :f, :f, :f]))
        h = (h + 2.0 * np.einsum("pqii->pq", eris_chem[:, :, :f, :f])
             - np.einsum("piiq->pq", eris_chem[:, :f, :f, :]))[f:, f:]
        eris_chem = eris_chem[f:, f:, f:, f:]
        n = ham.n_orb
    orbsym = invert_symm(np.asarray(ham.symm), point_group)
    with open(path, "w") as f:
        f.write(
            f"&FCI NORB={n},NELEC={ham.n_elec},MS2=0,\n"
            "ORBSYM=" + ",".join(str(int(s)) for s in orbsym) + ",\n"
            "ISYM=1,\n&END\n"
        )
        pair = lambda a, b: (max(a, b) * (max(a, b) + 1)) // 2 + min(a, b)
        for i in range(n):
            for j in range(i + 1):
                p1 = pair(i, j)
                for k in range(n):
                    for l in range(k + 1):
                        p2 = pair(k, l)
                        if p2 > p1:
                            continue
                        v = eris_chem[i, j, k, l]
                        if abs(v) > threshold:
                            f.write(f"{v:.16e} {i+1} {j+1} {k+1} {l+1}\n")
        for i in range(n):
            for j in range(i + 1):
                if abs(h[i, j]) > threshold:
                    f.write(f"{h[i, j]:.16e} {i+1} {j+1} 0 0\n")
        f.write(f"{core_energy:.16e} 0 0 0 0\n")


# ---------------------------------------------------------------------------
# HF-directory input (reference parse_hf_input, io_utils.cpp:98-187)
# ---------------------------------------------------------------------------

def _read_keyed_params(path, keys):
    lines = [l.strip() for l in Path(path).read_text().splitlines() if l.strip()]
    out = {}
    for i in range(0, len(lines) - 1, 2):
        out[lines[i]] = lines[i + 1]
    missing = [k for k in keys if k not in out]
    if missing:
        raise ValueError(f"missing parameters {missing} in {path}")
    return out


def parse_hf_input(hf_dir):
    """Parse a sys_params.txt + symm.txt + hcore.txt + eris.txt directory.

    Returns (MolecularHamiltonian, dict of scalar params).  eris.txt holds
    the dense n^4 physicist-notation CSV of the reference format.
    """
    hf_dir = Path(hf_dir)
    p = _read_keyed_params(
        hf_dir / "sys_params.txt", ["n_elec", "n_frozen", "n_orb", "eps", "hf_energy"]
    )
    n_elec = int(p["n_elec"])
    n_frz = int(p["n_frozen"])
    n_orb = int(p["n_orb"])
    tot_orb = n_orb + n_frz // 2
    # the reference format writes trailing commas ("0,\n"); parse tokenwise
    symm = np.asarray(
        [int(t) for t in (hf_dir / "symm.txt").read_text().replace(",", " ").split()],
        np.int64,
    )
    hcore = np.genfromtxt(hf_dir / "hcore.txt", delimiter=",")
    hcore = hcore.reshape(-1)[: tot_orb * tot_orb].reshape(tot_orb, tot_orb)
    eris = np.genfromtxt(hf_dir / "eris.txt", delimiter=",").reshape(-1)
    eris = eris[: tot_orb**4].reshape(tot_orb, tot_orb, tot_orb, tot_orb)
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(hcore),
        eris=jnp.asarray(eris),
        symm=jnp.asarray(symm[n_frz // 2 :].astype(np.int32)),
        n_orb=n_orb - 0,
        n_elec=n_elec - n_frz,
        n_frozen=n_frz,
    )
    params = {
        "eps": float(p["eps"]),
        "hf_energy": float(p["hf_energy"]),
        "n_frozen": n_frz,
    }
    return ham, params


def write_hf_dir(ham: mol.MolecularHamiltonian, hf_dir, eps: float,
                 hf_energy: float):
    """Write a reference-format HF input directory (the inverse of
    parse_hf_input / the PySCF step in Input_Data/gen_ex_trials.py):
    sys_params.txt + symm.txt + hcore.txt + eris.txt (physicist-notation
    n^4 CSV, frozen orbitals included).  ``hf_energy`` is the electronic
    HF energy, as in the reference's sys_params files."""
    hf_dir = Path(hf_dir)
    hf_dir.mkdir(parents=True, exist_ok=True)
    tot = ham.tot_orb
    n_frz = ham.n_frozen
    (hf_dir / "sys_params.txt").write_text(
        f"n_elec\n{ham.n_elec + n_frz}\nn_frozen\n{n_frz}\n"
        f"n_orb\n{ham.n_orb}\neps\n{eps}\nhf_energy\n{hf_energy:.10f}\n")
    # symm.txt must cover all tot_orb orbitals (parse reads tot then skips
    # the frozen prefix); frozen orbitals get irrep 0
    symm_full = np.zeros(tot, np.int64)
    symm_full[n_frz // 2:] = np.asarray(ham.symm)
    np.savetxt(hf_dir / "symm.txt", symm_full, fmt="%d")
    np.savetxt(hf_dir / "hcore.txt", np.asarray(ham.hcore), delimiter=",")
    eris = np.asarray(ham.eris).reshape(tot * tot, tot * tot)
    np.savetxt(hf_dir / "eris.txt", eris, delimiter=",")


def parse_hh_input(path):
    """Parse a Hubbard-Holstein parameter file (io_utils.cpp:320-408).

    The shift-origin key is ``gs_energy`` (the bundled example file spells it
    ``hf_energy``; both are accepted).
    """
    p = _read_keyed_params(
        path, ["n_elec", "lat_len", "n_dim", "eps", "U", "omega", "g"]
    )
    return {
        "n_elec": int(p["n_elec"]),
        "lat_len": int(p["lat_len"]),
        "n_dim": int(p["n_dim"]),
        "eps": float(p["eps"]),
        "u": float(p["U"]),
        "omega": float(p["omega"]),
        "g": float(p["g"]),
        "gs_energy": float(p.get("gs_energy", p.get("hf_energy", 0.0))),
    }


# ---------------------------------------------------------------------------
# vector readers (io_utils.cpp:410-586)
# ---------------------------------------------------------------------------

def read_dets(path, n_bits):
    """Determinants stored as decimal <=64-bit integers, one per line.

    Bulk-parsed by the native reader when available and the masks fit one
    u64 (fries_tpu.native.parse_u64); Python big-int loop otherwise."""
    n_words = dets.n_words(n_bits)
    if n_bits <= 64:
        from fries_tpu import native as _native

        masks64 = _native.parse_u64(path)
        if masks64 is not None:
            out = np.zeros((len(masks64), n_words), np.uint32)
            for w in range(n_words):
                out[:, w] = (masks64 >> np.uint64(32 * w)).astype(
                    np.uint64
                ).astype(np.uint32)
            return out
    masks = [int(l) for l in Path(path).read_text().split()]
    out = np.zeros((len(masks), n_words), np.uint32)
    for i, m in enumerate(masks):
        for w in range(n_words):
            out[i, w] = (m >> (32 * w)) & 0xFFFFFFFF
    return out


def _read_floats(path):
    """All whitespace-separated floats in a file (native bulk reader with a
    Python fallback)."""
    from fries_tpu import native as _native

    vals = _native.parse_doubles(path)
    if vals is not None:
        return vals
    return np.asarray([float(x) for x in Path(path).read_text().split()])


def load_vec_txt(prefix, n_bits):
    """Load <prefix>dets + <prefix>vals text files -> (keys (N, W), vals)."""
    keys = read_dets(str(prefix) + "dets", n_bits)
    vals = _read_floats(str(prefix) + "vals")
    n = min(len(keys), len(vals))
    return keys[:n], vals[:n]


def save_vec_txt(prefix, keys, vals, n_bits):
    keys = np.asarray(keys)
    with open(str(prefix) + "dets", "w") as f:
        for row in keys:
            mask = 0
            for w in range(keys.shape[1]):
                mask |= int(row[w]) << (32 * w)
            f.write(f"{mask}\n")
    with open(str(prefix) + "vals", "w") as f:
        for v in np.asarray(vals):
            f.write(f"{float(v)!r}\n")


def load_vec_dice(path, n_orb, n_bits, state: int = 0):
    """Read one state's determinants from a Dice/SHCI output file.

    Orbital strings use '2' (doubly occupied), 'a'/'b' (alpha/beta), '0'
    (empty), as in the reference reader (io_utils.cpp:485-562).
    """
    lines = Path(path).read_text().splitlines()
    state_rows = [i for i, l in enumerate(lines) if l.startswith("State :")]
    if state >= len(state_rows):
        raise ValueError(f"state {state} not found in {path}")
    start = state_rows[state] + 1
    end = state_rows[state + 1] if state + 1 < len(state_rows) else len(lines)
    keys, vals = [], []
    n_words = dets.n_words(n_bits)
    for line in lines[start:end]:
        parts = line.split()
        if len(parts) < 3:
            continue
        try:
            val = float(parts[1])
        except ValueError:
            continue
        if abs(val) < 1e-6:
            continue
        mask = 0
        orb = 0
        for token in parts[2:]:
            for ch in token:
                if ch == "2":
                    mask |= (1 << orb) | (1 << (orb + n_orb))
                elif ch == "a":
                    mask |= 1 << orb
                elif ch == "b":
                    mask |= 1 << (orb + n_orb)
                elif ch != "0":
                    continue
                orb += 1
        row = np.zeros(n_words, np.uint32)
        for w in range(n_words):
            row[w] = (mask >> (32 * w)) & 0xFFFFFFFF
        keys.append(row)
        vals.append(val)
    return np.asarray(keys, np.uint32), np.asarray(vals)


def load_rdm(path):
    """Whitespace-separated numeric file -> flat float array
    (reference load_rdm, io_utils.cpp:621-633)."""
    return _read_floats(path)


def load_last_line(path):
    """Last line of a CSV stream as floats (shift-resume helper,
    reference load_last_line, io_utils.cpp:636-663)."""
    lines = [l for l in Path(path).read_text().splitlines() if l.strip()]
    if not lines:
        return np.zeros(0)
    return np.asarray([float(x) for x in lines[-1].split(",")])


_NPY_HEADER_LEN = 128  # fixed so the shape can be rewritten in place


def _npy_write_header(f, dtype, shape):
    magic = b"\x93NUMPY\x01\x00"
    hdr = ("{'descr': '%s', 'fortran_order': False, 'shape': %s, }"
           % (np.lib.format.dtype_to_descr(dtype), repr(tuple(shape))))
    pad = _NPY_HEADER_LEN - len(magic) - 2 - len(hdr) - 1
    if pad < 0:
        raise ValueError("npy header too long")
    f.write(magic)
    f.write(np.uint16(_NPY_HEADER_LEN - len(magic) - 2).tobytes())
    f.write((hdr + " " * pad + "\n").encode("latin1"))


def npy_append(path, arr):
    """Append ``arr`` as one record along a leading axis of the .npy file at
    ``path``, creating it with shape (1,) + arr.shape.  Matches the
    reference's cnpy append mode for the subspace h_mat/d_mat trajectories
    (subsp_mol.cpp:454-457); the result loads with ``np.load``."""
    import os

    arr = np.ascontiguousarray(arr)
    if not os.path.exists(path):
        with open(path, "wb") as f:
            _npy_write_header(f, arr.dtype, (1,) + arr.shape)
            f.write(arr.tobytes())
        return
    with open(path, "r+b") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        if fortran or dtype != arr.dtype or tuple(shape[1:]) != arr.shape:
            raise ValueError(
                f"npy_append: existing {path} has shape {shape} dtype {dtype},"
                f" incompatible with record {arr.shape} {arr.dtype}"
            )
        f.seek(0)
        _npy_write_header(f, arr.dtype, (shape[0] + 1,) + arr.shape)
        f.seek(0, 2)
        f.write(arr.tobytes())
