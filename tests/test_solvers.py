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


def test_sptrsv_missing_diagonal_rejected():
    """A triangular input with no stored diagonal for some row must error,
    not silently assume a unit diagonal."""
    import pytest

    from singlespmv_tpu.core.types import COOMatrix
    from singlespmv_tpu.ops.sptrsv import analyze

    # 3x3 lower triangular, row 1 has only an off-diagonal entry
    coo = COOMatrix.from_triplets(
        3, 3, [0, 1, 2], [0, 0, 2], [2.0, 1.0, 3.0], sort=True)
    with pytest.raises(ValueError, match="no stored diagonal"):
        analyze(coo, lower=True)


class TestIC0:
    def _spd(self, n=60, seed=9):
        rng = np.random.default_rng(seed)
        from singlespmv_tpu.core.types import COOMatrix

        # SPD: A = B·Bᵀ + n·I on a sparse pattern
        d = np.abs(rng.standard_normal(n)) + n
        k = 4
        rows = np.repeat(np.arange(n), k)
        cols = rng.integers(0, n, n * k)
        vals = rng.standard_normal(n * k) * 0.3
        dense = np.zeros((n, n))
        dense[rows, cols] += vals
        dense = dense @ dense.T + np.diag(d)
        # sparsify: keep diagonal + largest entries
        keep = np.abs(dense) > 0.05
        np.fill_diagonal(keep, True)
        dense = dense * keep
        rr, cc = np.nonzero(keep)
        return COOMatrix.from_triplets(n, n, rr, cc, dense[rr, cc]), dense

    def test_ic0_factor_matches_pattern(self):
        from singlespmv_tpu.ops.ilu import ic0

        coo, dense = self._spd()
        L = ic0(coo)
        Ld = L.to_dense()
        # L·Lᵀ must match A exactly on the lower pattern of A
        prod = Ld @ Ld.T
        mask = (dense != 0) & (np.tri(dense.shape[0], dtype=bool))
        np.testing.assert_allclose(prod[mask], dense[mask], rtol=1e-8,
                                   atol=1e-10)

    def test_ic0_preconditioned_cg_converges_faster(self):
        from singlespmv_tpu.ops.ilu import ic0_preconditioner
        from singlespmv_tpu.ops.solvers import cg

        coo, dense = self._spd(n=80)
        b = np.random.default_rng(1).standard_normal(80)
        M = ic0_preconditioner(coo, F64)
        res = cg(coo, b, cfg=F64, M=M, tol=1e-10, maxiter=200)
        assert res.converged
        r = dense @ np.asarray(res.x) - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8

    def test_ic0_rejects_non_spd(self):
        import pytest

        from singlespmv_tpu.core.types import COOMatrix
        from singlespmv_tpu.ops.ilu import ic0

        coo = COOMatrix.from_triplets(
            2, 2, [0, 1, 1], [0, 0, 1], [1.0, 4.0, 1.0], sort=True)
        with pytest.raises(ValueError, match="non-positive pivot"):
            ic0(coo)

    def test_native_matches_numpy_fallback(self):
        from singlespmv_tpu.core import native
        from singlespmv_tpu.ops import ilu as ilu_mod

        coo, _ = self._spd(n=50, seed=3)
        if native.get_factor_lib() is None:
            import pytest

            pytest.skip("native factor library unavailable")
        rp, cols, vals = ilu_mod._csr(coo)
        v_native = vals.copy()
        assert native.ilu0_csr(rp, cols, v_native) == 0
        v_np = ilu_mod._ilu0_numpy(coo.n_row, rp, cols, vals.copy())
        np.testing.assert_allclose(v_native, v_np, rtol=1e-12)
