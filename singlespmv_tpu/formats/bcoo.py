"""jax.experimental.sparse baseline ("vendor" path #2 — the cuSPARSE analog).

Reference: /root/reference/src/opt_cusparse.cpp calls ``cusparseDcsrmv`` (:81) as the
GPU vendor baseline.  The TPU ecosystem's equivalent library path is
``jax.experimental.sparse.BCOO`` — XLA's own sparse support — benchmarked through the
same harness for cross-implementation checking (SURVEY §4.4).
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..core.types import COOMatrix
from .base import pytree_dataclass


@pytree_dataclass(meta=("n_row", "n_col", "nnz"))
class BCOOState:
    n_row: int
    n_col: int
    nnz: int
    mat: object  # sparse.BCOO


def convert(coo: COOMatrix, cfg: Config) -> BCOOState:
    from jax.experimental import sparse

    import jax.numpy as jnp

    nnz = max(coo.nnz, 1)
    indices = np.zeros((nnz, 2), dtype=cfg.index_dtype)
    data = np.zeros((nnz,), dtype=cfg.np_dtype)
    indices[: coo.nnz, 0] = coo.row
    indices[: coo.nnz, 1] = coo.col
    data[: coo.nnz] = coo.val.astype(cfg.np_dtype)
    mat = sparse.BCOO(
        (jnp.asarray(data), jnp.asarray(indices)),
        shape=(coo.n_row, coo.n_col),
        indices_sorted=True, unique_indices=False,
    )
    return BCOOState(n_row=coo.n_row, n_col=coo.n_col, nnz=coo.nnz, mat=mat)


def spmv(state: BCOOState, x):
    return state.mat @ x


def to_coo(state: BCOOState) -> COOMatrix:
    """Inverse conversion."""
    idx = np.asarray(state.mat.indices)[: state.nnz]
    val = np.asarray(state.mat.data)[: state.nnz]
    return COOMatrix.from_triplets(state.n_row, state.n_col, idx[:, 0],
                                   idx[:, 1], val, sort=True)
