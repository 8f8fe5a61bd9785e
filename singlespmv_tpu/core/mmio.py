"""Matrix-Market I/O.

A full MM reader (banner parsing, ``pattern``/``integer``/``real``/``complex`` fields,
``symmetric``/``skew-symmetric``/``hermitian`` expansion, ``%`` comments, 1-based
indices) — exceeding the reference's minimal reader (/root/reference/src/util.cpp:30-66,
which only skips ``%`` lines) and matching the vendored CSR5 driver's semantics
(/root/reference/opt/Benchmark_SpMV_using_CSR5/CSR5_avx2/main.cpp:133-288: symmetric
expansion skips the diagonal duplicate; pattern values default to 1.0).

Bannerless files (like /root/reference/matrix/test/3x3.mtx) are accepted: general real
coordinate is assumed.

A native C++ fast path lives in ``singlespmv_tpu.core.native``; this module is the
pure-Python reference implementation and fallback.
"""
from __future__ import annotations

import io
import os
from typing import Optional

import numpy as np

from .types import COOMatrix


class MatrixMarketError(ValueError):
    pass


def _parse_banner(line: str):
    toks = line.strip().lower().split()
    # %%MatrixMarket matrix coordinate real general
    if len(toks) < 5 or toks[0] != "%%matrixmarket":
        raise MatrixMarketError(f"bad MatrixMarket banner: {line!r}")
    _, obj, fmt, field, symmetry = toks[:5]
    if obj != "matrix":
        raise MatrixMarketError(f"unsupported object {obj!r}")
    if fmt not in ("coordinate", "array"):
        raise MatrixMarketError(f"unsupported format {fmt!r}")
    if field not in ("real", "integer", "pattern", "complex", "double"):
        raise MatrixMarketError(f"unsupported field {field!r}")
    if symmetry not in ("general", "symmetric", "skew-symmetric", "hermitian"):
        raise MatrixMarketError(f"unsupported symmetry {symmetry!r}")
    return fmt, field, symmetry


def read_matrix_market(path_or_file, *, index_bits: int = 32,
                       sum_duplicates: bool = False) -> COOMatrix:
    """Read a Matrix-Market file into a row-major-sorted COOMatrix."""
    if hasattr(path_or_file, "read"):
        text = path_or_file.read()
        if isinstance(text, bytes):
            text = text.decode()
    else:
        with open(path_or_file, "r") as f:
            text = f.read()

    lines = text.splitlines()
    i = 0
    fmt, field, symmetry = "coordinate", "real", "general"
    if lines and lines[0].startswith("%%"):
        fmt, field, symmetry = _parse_banner(lines[0])
        i = 1
    # skip comments / blank lines
    while i < len(lines) and (not lines[i].strip() or lines[i].lstrip().startswith("%")):
        i += 1
    if i >= len(lines):
        raise MatrixMarketError("missing size line")
    size_toks = lines[i].split()
    i += 1

    if fmt == "array":
        if len(size_toks) != 2:
            raise MatrixMarketError(f"bad array size line: {size_toks}")
        n_row, n_col = int(size_toks[0]), int(size_toks[1])
        vals = []
        for ln in lines[i:]:
            s = ln.strip()
            if not s or s.startswith("%"):
                continue
            vals.extend(float(t) for t in s.split())
        dense = np.array(vals, dtype=np.float64)
        if symmetry == "general":
            if dense.size != n_row * n_col:
                raise MatrixMarketError("array entry count mismatch")
            dense = dense.reshape((n_col, n_row)).T  # column-major per MM spec
        else:
            # lower triangle, column-major
            full = np.zeros((n_row, n_col), dtype=np.float64)
            k = 0
            for c in range(n_col):
                for r in range(c, n_row):
                    full[r, c] = dense[k]
                    k += 1
            sign = -1.0 if symmetry == "skew-symmetric" else 1.0
            full = full + sign * np.triu(full.T, 1)
            dense = full
        rr, cc = np.nonzero(dense)
        return COOMatrix.from_triplets(n_row, n_col, rr, cc, dense[rr, cc],
                                       index_bits=index_bits)

    if len(size_toks) != 3:
        raise MatrixMarketError(f"bad coordinate size line: {size_toks}")
    n_row, n_col, n_ent = int(size_toks[0]), int(size_toks[1]), int(size_toks[2])

    body = "\n".join(
        ln for ln in lines[i:] if ln.strip() and not ln.lstrip().startswith("%")
    )
    if field == "pattern":
        dat = np.loadtxt(io.StringIO(body), dtype=np.int64, ndmin=2)
        if dat.size == 0:
            dat = dat.reshape(0, 2)
        rows, cols = dat[:, 0], dat[:, 1]
        vals = np.ones(rows.shape[0], dtype=np.float64)
    elif field == "complex":
        dat = np.loadtxt(io.StringIO(body), dtype=np.float64, ndmin=2)
        if dat.size == 0:
            dat = dat.reshape(0, 4)
        rows = dat[:, 0].astype(np.int64)
        cols = dat[:, 1].astype(np.int64)
        vals = dat[:, 2]  # real part only, like CSR5's reader ignores imag
    else:
        dat = np.loadtxt(io.StringIO(body), dtype=np.float64, ndmin=2)
        if dat.size == 0:
            dat = dat.reshape(0, 3)
        if dat.shape[1] < 3:
            # pattern-style body despite 'real' field (be liberal in what we accept)
            rows = dat[:, 0].astype(np.int64)
            cols = dat[:, 1].astype(np.int64)
            vals = np.ones(rows.shape[0], dtype=np.float64)
        else:
            rows = dat[:, 0].astype(np.int64)
            cols = dat[:, 1].astype(np.int64)
            vals = dat[:, 2]
    if rows.shape[0] < n_ent:
        raise MatrixMarketError(
            f"entry count mismatch: header says {n_ent}, body has {rows.shape[0]}"
        )
    if rows.shape[0] > n_ent:
        # Read exactly the declared count, like the reference's fscanf loop
        # (src/util.cpp:44-49) — its own 10x10.mtx has one extra triplet.
        rows, cols, vals = rows[:n_ent], cols[:n_ent], vals[:n_ent]
    rows = rows - 1  # 1-based → 0-based
    cols = cols - 1

    if symmetry in ("symmetric", "hermitian", "skew-symmetric"):
        off = rows != cols  # diagonal entries are not duplicated
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        rows, cols, vals = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
            np.concatenate([vals, sign * vals[off]]),
        )

    if rows.size:
        if rows.min(initial=0) < 0 or rows.max(initial=0) >= n_row:
            raise MatrixMarketError("row index out of range")
        if cols.min(initial=0) < 0 or cols.max(initial=0) >= n_col:
            raise MatrixMarketError("col index out of range")
    return COOMatrix.from_triplets(
        n_row, n_col, rows, cols, vals,
        index_bits=index_bits, sum_duplicates=sum_duplicates,
    )


def write_matrix_market(path, coo: COOMatrix, *, comment: Optional[str] = None):
    """Write a COOMatrix as general real coordinate Matrix-Market."""
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if comment:
            for ln in comment.splitlines():
                f.write(f"% {ln}\n")
        f.write(f"{coo.n_row} {coo.n_col} {coo.nnz}\n")
        for r, c, v in zip(coo.row, coo.col, coo.val):
            f.write(f"{int(r) + 1} {int(c) + 1} {float(v)!r}\n")


def load_matrix(path, *, index_bits: int = 32, sum_duplicates: bool = False,
                use_native: bool = True) -> COOMatrix:
    """Load a .mtx file, preferring the native C++ parser when available."""
    if use_native:
        try:
            from . import native

            coo = native.load_mtx(os.fspath(path), index_bits=index_bits,
                                  sum_duplicates=sum_duplicates)
            if coo is not None:
                return coo
        except MatrixMarketError:
            raise  # real parse error — don't mask it by re-parsing
        except Exception:
            pass  # native lib unavailable: fall back to the Python reader
    return read_matrix_market(path, index_bits=index_bits,
                              sum_duplicates=sum_duplicates)
