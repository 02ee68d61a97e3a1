"""ctypes loader for the C++ PAF/FASTA fast parsers (telomeri_tpu/native/*.cpp).

The native library is optional: `parse_paf_columns` returns None when it is unavailable and
callers fall back to the pure-Python parser (same semantics, tested for parity in
tests/test_native.py). Build with `python -m telomeri_tpu.native.build`.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libtelomeri_native.so")
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tel_parse_paf.restype = ctypes.c_void_p
        lib.tel_parse_paf.argtypes = [ctypes.c_char_p]
        lib.tel_paf_nrows.restype = ctypes.c_int64
        lib.tel_paf_nrows.argtypes = [ctypes.c_void_p]
        lib.tel_paf_error.restype = ctypes.c_char_p
        lib.tel_paf_error.argtypes = [ctypes.c_void_p]
        lib.tel_paf_fill.restype = None
        lib.tel_paf_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),  # ints (n, 9) row-major
            ctypes.POINTER(ctypes.c_int64),  # qname offsets (n+1)
            ctypes.POINTER(ctypes.c_int64),  # tname offsets (n+1)
        ]
        lib.tel_paf_names_bytes.restype = ctypes.c_int64
        lib.tel_paf_names_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tel_paf_copy_names.restype = None
        lib.tel_paf_copy_names.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.POINTER(ctypes.c_char)]
        lib.tel_paf_free.restype = None
        lib.tel_paf_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def parse_paf_columns(path: str):
    """Parse a PAF file natively. Returns (qnames, tnames, ints[n,9]) or None if unavailable.

    ints columns: qlen qs qe strand tlen ts te nmatch blocklen (int64), matching
    telomeri_tpu.io.paf._parse_columns_py.
    """
    lib = _load()
    if lib is None:
        return None
    h = lib.tel_parse_paf(path.encode())
    if not h:
        raise OSError(f"native PAF parser: cannot open {path}")
    try:
        err = lib.tel_paf_error(h)
        if err:
            raise ValueError(err.decode())
        n = lib.tel_paf_nrows(h)
        ints = np.empty((n, 9), dtype=np.int64)
        qoff = np.empty(n + 1, dtype=np.int64)
        toff = np.empty(n + 1, dtype=np.int64)
        lib.tel_paf_fill(
            h,
            ints.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            qoff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            toff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        names = []
        for which, off in ((0, qoff), (1, toff)):
            nbytes = lib.tel_paf_names_bytes(h, which)
            buf = ctypes.create_string_buffer(max(int(nbytes), 1))
            lib.tel_paf_copy_names(h, which, buf)
            blob = buf.raw[:nbytes]
            names.append(np.array(
                [blob[off[i]:off[i + 1]].decode() for i in range(n)], dtype=object))
        return names[0], names[1], ints
    finally:
        lib.tel_paf_free(h)
