"""ILU(0) factorization + CG/BiCGStab solver tests."""
import numpy as np
import pytest

from singlespmv_tpu.config import Config
from singlespmv_tpu.core.types import COOMatrix
from singlespmv_tpu.ops.ilu import ilu0, ilu0_preconditioner
from singlespmv_tpu.ops.solvers import bicgstab, cg

F64 = Config(format="csr", dtype="float64", verify=False)


def spd_laplacian(n):
    """1-D Laplacian (tridiagonal SPD)."""
    i = np.arange(n)
    rows = np.concatenate([i, i[1:], i[:-1]])
    cols = np.concatenate([i, i[1:] - 1, i[:-1] + 1])
    vals = np.concatenate([np.full(n, 2.0), np.full(n - 1, -1.0),
                           np.full(n - 1, -1.0)])
    return COOMatrix.from_triplets(n, n, rows, cols, vals)


def general_matrix(n, seed=0):
    rng = np.random.default_rng(seed)
    dense = np.eye(n) * n + rng.uniform(-1, 1, (n, n)) * (rng.uniform(
        size=(n, n)) < 0.15)
    r, c = np.nonzero(dense)
    return COOMatrix.from_triplets(n, n, r, c, dense[r, c])


class TestILU0:
    def test_exact_on_tridiagonal(self):
        # Tridiagonal: ILU(0) == exact LU (no fill-in exists).
        a = spd_laplacian(32)
        L, U = ilu0(a)
        np.testing.assert_allclose(L.to_dense() @ U.to_dense(), a.to_dense(),
                                   rtol=1e-12, atol=1e-12)

    def test_pattern_preserved(self):
        a = general_matrix(48, seed=1)
        L, U = ilu0(a)
        pat = a.to_dense() != 0
        lu_pat = (L.to_dense() != 0) | (U.to_dense() != 0)
        off_diag = ~np.eye(48, dtype=bool)
        assert not np.any(lu_pat & off_diag & ~pat)  # zero fill-in

    def test_preconditioner_applies(self):
        a = spd_laplacian(64)
        M = ilu0_preconditioner(a, F64)
        v = np.ones(64)
        out = np.asarray(M(v))
        # tridiagonal: M == A⁻¹ exactly
        np.testing.assert_allclose(a.to_dense() @ out, v, rtol=1e-10)


class TestSolvers:
    def test_cg_laplacian(self):
        a = spd_laplacian(128)
        b = np.sin(np.arange(128) / 7.0)
        res = cg(a, b, cfg=F64, tol=1e-10, maxiter=500)
        assert res.converged
        np.testing.assert_allclose(a.to_dense() @ res.x, b, atol=1e-8)

    def test_cg_preconditioned_faster(self):
        a = spd_laplacian(256)
        b = np.ones(256)
        plain = cg(a, b, cfg=F64, tol=1e-8, maxiter=1000)
        M = ilu0_preconditioner(a, F64)
        pre = cg(a, b, cfg=F64, tol=1e-8, maxiter=1000, M=M)
        assert pre.converged
        assert pre.iterations < plain.iterations

    def test_bicgstab_general(self):
        a = general_matrix(96, seed=2)
        b = np.cos(np.arange(96) / 5.0)
        res = bicgstab(a, b, cfg=F64, tol=1e-9, maxiter=500)
        assert res.converged
        np.testing.assert_allclose(a.to_dense() @ res.x, b, atol=1e-6)

    def test_solver_with_auto_format(self):
        a = spd_laplacian(200)
        b = np.ones(200)
        cfg = Config(format="auto", dtype="float64", verify=False,
                     segment_width=128)
        res = cg(a, b, cfg=cfg, tol=1e-8, maxiter=800)
        assert res.converged
