"""Native (C++) runtime components, loaded via ctypes.

The reference implements its I/O layer in C++ (io_utils.cpp); fries_tpu does
the same for the host-side hot paths — FCIDUMP record-body parsing and bulk
numeric-table reads — while keeping pure-Python fallbacks so the package
works without a toolchain.  The shared library is compiled on first use with
``g++ -O3`` and cached next to the source, keyed by a source hash.

Set ``FRIES_NATIVE=0`` to force the Python fallbacks.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("fries_io.cpp")
_F64P = ctypes.POINTER(ctypes.c_double)
_U64P = ctypes.POINTER(ctypes.c_ulonglong)


@lru_cache(maxsize=1)
def lib():
    """The loaded shared library, or None when native I/O is unavailable
    (no compiler, compile failure, or FRIES_NATIVE=0)."""
    if os.environ.get("FRIES_NATIVE", "1") == "0":
        return None
    try:
        tag = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
        so = _SRC.parent / f"_fries_io_{tag}.so"
        if not so.exists():
            tmp = so.with_suffix(f".tmp{os.getpid()}.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)
        l = ctypes.CDLL(str(so))
        l.fries_parse_fcidump_body.restype = ctypes.c_long
        l.fries_parse_fcidump_body.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            _F64P, _F64P, _F64P,
        ]
        l.fries_parse_doubles.restype = ctypes.c_long
        l.fries_parse_doubles.argtypes = [ctypes.c_char_p, _F64P, ctypes.c_long]
        l.fries_parse_u64.restype = ctypes.c_long
        l.fries_parse_u64.argtypes = [ctypes.c_char_p, _U64P, ctypes.c_long]
        return l
    except Exception:
        return None


def parse_fcidump_body(path, offset: int, n_orb: int):
    """Native FCIDUMP record parse -> (hcore (n,n), eris_chem (n,n,n,n),
    core_energy) or None when the native library is unavailable/failed."""
    l = lib()
    if l is None:
        return None
    hcore = np.zeros((n_orb, n_orb), np.float64)
    eris = np.zeros((n_orb,) * 4, np.float64)
    core = ctypes.c_double(0.0)
    nrec = l.fries_parse_fcidump_body(
        os.fsencode(str(path)), offset, n_orb,
        hcore.ctypes.data_as(_F64P), eris.ctypes.data_as(_F64P),
        ctypes.byref(core),
    )
    if nrec < 0:
        return None
    return hcore, eris, float(core.value)


def parse_doubles(path):
    """All whitespace-separated floats in the file, or None."""
    l = lib()
    if l is None:
        return None
    size = os.path.getsize(path)
    out = np.empty(size // 2 + 1, np.float64)
    cnt = l.fries_parse_doubles(
        os.fsencode(str(path)), out.ctypes.data_as(_F64P), out.shape[0]
    )
    if cnt < 0:
        return None
    return out[:cnt].copy()


def parse_u64(path):
    """All whitespace-separated decimal uint64 tokens, or None."""
    l = lib()
    if l is None:
        return None
    size = os.path.getsize(path)
    out = np.empty(size // 2 + 1, np.uint64)
    cnt = l.fries_parse_u64(
        os.fsencode(str(path)), out.ctypes.data_as(_U64P), out.shape[0]
    )
    if cnt < 0:
        return None
    return out[:cnt].copy()
