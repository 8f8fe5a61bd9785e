"""ELLG (row-positional windows + group-select gather) — correctness + plan.

The light-local-row path for the natural-suite circuit/econ/mesh classes
(see formats/ellg.py).  Pins: oracle parity incl. the rest-engine composition,
round-trip, window planning, and the auto planner's class behavior.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from singlespmv_tpu.config import Config
from singlespmv_tpu.core import verify_result
from singlespmv_tpu.core.types import COOMatrix
from singlespmv_tpu.core.rng import create_random_vector
from singlespmv_tpu.data.generators import generate, powerlaw
from singlespmv_tpu.formats import convert, spmv_fn, to_coo
from singlespmv_tpu.formats import ellg as ellg_mod


def _local(n=3000, per_row=5, width=60, seed=0):
    """Light local rows — the class ellg exists for."""
    rng = np.random.default_rng(seed)
    r = np.repeat(np.arange(n), per_row)
    c = np.clip(r + rng.integers(-width, width + 1, r.size), 0, n - 1)
    v = rng.uniform(-1, 1, r.size)
    return COOMatrix.from_triplets(n, n, r, c, v, sort=True,
                                   sum_duplicates=True)


CASES = [
    ("local", lambda: _local()),
    ("band", lambda: generate("band", 700, 9, seed=1)),
    ("local+tail", lambda: _mixed_tail()),
    ("powerlaw", lambda: powerlaw(2000, 24000, seed=3)),
    ("empty-rows", lambda: _with_empty_rows()),
]


def _mixed_tail(seed=4):
    """Local body + a few heavy rows (the rest-engine composition)."""
    rng = np.random.default_rng(seed)
    base = _local(2000, 4, 40, seed=seed)
    heavy_rows = rng.choice(2000, 6, replace=False)
    hr = np.repeat(heavy_rows, 700)
    hc = rng.integers(0, 2000, hr.size)
    rows = np.concatenate([base.row, hr])
    cols = np.concatenate([base.col, hc])
    vals = np.concatenate([base.val, rng.uniform(-1, 1, hr.size)])
    return COOMatrix.from_triplets(2000, 2000, rows, cols, vals, sort=True,
                                   sum_duplicates=True)


def _with_empty_rows(seed=5):
    rng = np.random.default_rng(seed)
    n = 600
    r = rng.integers(0, n // 2, 1500) * 2      # odd rows all empty
    c = np.clip(r + rng.integers(-30, 31, r.size), 0, n - 1)
    return COOMatrix.from_triplets(n, n, r, c, rng.uniform(size=r.size),
                                   sort=True, sum_duplicates=True)


class TestELLG:
    @pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
    def test_spmv_and_roundtrip(self, name, make):
        coo = make()
        cfg = Config(format="ellg", dtype="float32")
        st = convert(coo, cfg)
        x = create_random_vector(coo.n_col).astype(np.float32)
        fn = jax.jit(spmv_fn(cfg))
        y = np.asarray(fn(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float32)
        assert ok, f"{name}: {det}"
        y2 = np.asarray(fn(st, x))
        assert (y == y2).all()
        back = to_coo(st, cfg)
        np.testing.assert_allclose(back.to_dense(), coo.to_dense(),
                                   rtol=1e-6, atol=1e-7)

    def test_local_rows_stay_in_main(self):
        """Pure local light rows must not spill: pad stays near t/avg_deg and
        the rest engine is unused."""
        coo = _local(4000, 6, 50, seed=7)
        st = convert(coo, Config(format="ellg", dtype="float32"))
        assert st.rest_nnz == 0
        assert st.n_slots <= 2.5 * coo.nnz

    def test_heavy_rows_route_to_rest(self):
        coo = _mixed_tail()
        st = convert(coo, Config(format="ellg", dtype="float32"))
        assert st.rest_fmt in ("bkt_g", "csr")
        assert st.rest_nnz >= 6 * (700 - 128) * 0.5   # heavy tails spilled

    def test_auto_withholds_ellg(self):
        from singlespmv_tpu.formats.auto import estimate_costs

        # ellg is deliberately NOT an auto candidate since r2: measured suite
        # picks were dominated by slab on every overlap (see auto.py note);
        # it stays available as an explicit format
        coo = _local(50000, 3, 120, seed=8)
        costs = estimate_costs(coo, Config(dtype="float32"))
        assert "ellg" not in costs
        assert "slab" in costs

    def test_spmm_matches_columnwise(self):
        coo = _local(800, 4, 30, seed=9)
        cfg = Config(format="ellg", dtype="float32")
        st = convert(coo, cfg)
        X = np.random.default_rng(10).uniform(
            size=(coo.n_col, 3)).astype(np.float32)
        Y = np.asarray(jax.jit(ellg_mod.spmm)(st, X))
        for b in range(3):
            ok, det = verify_result(coo, X[:, b], Y[:, b], dtype=np.float32)
            assert ok, det
