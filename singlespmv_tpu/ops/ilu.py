"""ILU(0) / IC(0) incomplete factorizations (north-star factorization path).

No reference analog (the reference is SpMV-only).  The factorization runs on the
host (it is a one-time symbolic+numeric pass over the sparsity pattern, like the
reference's OptimizeProblem conversions); the resulting triangular factors are
applied on device through the level-scheduled SpTRSV plans (ops.sptrsv) — the
classic preconditioner pipeline M⁻¹ = U⁻¹ L⁻¹ for the iterative solvers in
ops.solvers.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config
from ..core.types import COOMatrix
from .sptrsv import TriSolveplan, analyze, solve


def ilu0(coo: COOMatrix) -> tuple:
    """Incomplete LU with zero fill-in on A's pattern.

    Returns (L, U) as COOMatrix (L unit-diagonal, stored with its 1.0 diagonal;
    U upper including diagonal).  IKJ formulation over CSR rows.
    """
    n = coo.n_row
    assert coo.n_row == coo.n_col, "ILU(0) needs a square matrix"
    rp = coo.row_ptr()
    cols = coo.col.astype(np.int64)
    vals = coo.val.astype(np.float64).copy()

    # column position lookup per row for O(1) pattern hits
    colpos = {}
    for r in range(n):
        for p in range(rp[r], rp[r + 1]):
            colpos[(r, cols[p])] = p

    for i in range(n):
        for p in range(rp[i], rp[i + 1]):
            k = cols[p]
            if k >= i:
                break
            dk = colpos.get((k, k))
            if dk is None or vals[dk] == 0:
                raise ValueError(f"ILU(0): zero pivot at row {k}")
            vals[p] /= vals[dk]                      # L[i,k]
            lik = vals[p]
            for q in range(rp[k], rp[k + 1]):
                j = cols[q]
                if j <= k:
                    continue
                pij = colpos.get((i, j))
                if pij is not None:
                    vals[pij] -= lik * vals[q]

    lower = cols < coo.row
    upper = ~lower
    lr = np.concatenate([coo.row[lower], np.arange(n)])
    lc = np.concatenate([cols[lower], np.arange(n)])
    lv = np.concatenate([vals[lower], np.ones(n)])
    L = COOMatrix.from_triplets(n, n, lr, lc, lv, sort=True)
    U = COOMatrix.from_triplets(n, n, coo.row[upper], cols[upper], vals[upper],
                                sort=True)
    return L, U


@dataclasses.dataclass(frozen=True)
class ILUPreconditioner:
    """Device-applicable M⁻¹ v = U⁻¹ (L⁻¹ v) via level-scheduled solves."""
    l_plan: TriSolveplan
    u_plan: TriSolveplan

    def __call__(self, v):
        return solve(self.u_plan, solve(self.l_plan, v))


def ilu0_preconditioner(coo: COOMatrix, cfg: Config = None) -> ILUPreconditioner:
    L, U = ilu0(coo)
    return ILUPreconditioner(
        l_plan=analyze(L, cfg, lower=True),
        u_plan=analyze(U, cfg, lower=False),
    )
