"""Native (C++) runtime components, bound via ctypes.

The reference's runtime is all C++; here the JAX/XLA/Pallas side owns compute while
I/O-heavy host paths run native: the Matrix-Market parser (mmio_native.cpp — the
analog of /root/reference/src/util.cpp:30-66 and the vendored mmio.c).  The shared
library is compiled on demand with g++ and cached next to the sources; every entry
point has a pure-Python fallback, so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mmio_native.cpp")
_LIB = os.path.join(_DIR, "_mmio.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


class _MtxResult(ctypes.Structure):
    _fields_ = [
        ("n_row", ctypes.c_int64),
        ("n_col", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("rows", ctypes.POINTER(ctypes.c_int64)),
        ("cols", ctypes.POINTER(ctypes.c_int64)),
        ("vals", ctypes.POINTER(ctypes.c_double)),
        ("err", ctypes.c_char * 256),
    ]


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o",
           _LIB + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.spmv_load_mtx.restype = ctypes.POINTER(_MtxResult)
        lib.spmv_load_mtx.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.spmv_free_result.restype = None
        lib.spmv_free_result.argtypes = [ctypes.POINTER(_MtxResult)]
        _lib = lib
        return _lib


def load_mtx(path: str, *, index_bits: int = 32, sum_duplicates: bool = False):
    """Parse path with the native library; None if the library is unavailable."""
    from ..types import COOMatrix, INDEX_DTYPES

    lib = get_lib()
    if lib is None:
        return None
    res = lib.spmv_load_mtx(os.fsencode(path), 1 if sum_duplicates else 0)
    if not res:
        return None
    try:
        r = res.contents
        err = bytes(r.err).split(b"\0", 1)[0]
        if err:
            from ..mmio import MatrixMarketError

            raise MatrixMarketError(f"{path}: {err.decode()}")
        n = int(r.nnz)
        rows = np.ctypeslib.as_array(r.rows, shape=(n,)).copy() if n else \
            np.zeros(0, np.int64)
        cols = np.ctypeslib.as_array(r.cols, shape=(n,)).copy() if n else \
            np.zeros(0, np.int64)
        vals = np.ctypeslib.as_array(r.vals, shape=(n,)).copy() if n else \
            np.zeros(0, np.float64)
        idx_t = INDEX_DTYPES[index_bits]
        return COOMatrix(
            n_row=int(r.n_row), n_col=int(r.n_col),
            row=rows.astype(idx_t), col=cols.astype(idx_t), val=vals,
        )
    finally:
        lib.spmv_free_result(res)


def available() -> bool:
    return get_lib() is not None
