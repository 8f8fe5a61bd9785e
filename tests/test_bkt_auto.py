"""Tests for the bkt two-phase bucketed format and the auto planner."""
import numpy as np
import pytest

from singlespmv_tpu import formats
from singlespmv_tpu.config import Config
from singlespmv_tpu.core.oracle import verify_result
from singlespmv_tpu.core.rng import create_random_vector
from singlespmv_tpu.core.types import COOMatrix
from singlespmv_tpu.data.fixtures import fixture_10x10
from singlespmv_tpu.data.generators import generate, powerlaw

F64 = Config(dtype="float64")


def _rect(seed=7):
    rng = np.random.default_rng(seed)
    return COOMatrix.from_triplets(
        90, 300, rng.integers(0, 90, 2000), rng.integers(0, 300, 2000),
        rng.uniform(-1, 1, 2000), sum_duplicates=True)


BKT_CASES = [
    ("10x10", fixture_10x10),
    ("band", lambda: generate("band", 200, 6, seed=1)),
    ("powerlaw", lambda: powerlaw(300, 4000, seed=3)),
    ("powerlaw-skew", lambda: powerlaw(2000, 60000, seed=5)),
    ("unbal", lambda: generate("unbalance", 150, seed=4)),
    ("rect", _rect),
]


class TestBKT:
    @pytest.mark.parametrize("name,make", BKT_CASES,
                             ids=[c[0] for c in BKT_CASES])
    def test_spmv_and_roundtrip(self, name, make):
        coo = make()
        cfg = F64.replace(format="bkt")
        st = formats.convert(coo, cfg)
        x = create_random_vector(coo.n_col)
        import jax

        y = np.asarray(jax.jit(formats.spmv_fn(cfg))(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float64)
        assert ok, det
        back = formats.to_coo(st, cfg)
        np.testing.assert_allclose(back.to_dense(), coo.to_dense())

    def test_ghosts_engage_on_thin_overflow(self):
        # Uniform random: ~10% of buckets exceed the 90th-percentile depth cap
        # by a little — the thin tail spills into ghost columns (appended
        # col-blocks with duplicated x rows), not a deeper global S.
        rng = np.random.default_rng(21)
        # bucket fill ~ Poisson(110): S lands at 128 and the ~4% tail spills
        n, nnz = 4096, 112640
        coo = COOMatrix.from_triplets(
            n, n, rng.integers(0, n, nnz), rng.integers(0, n, nnz),
            rng.uniform(-1, 1, nnz), sum_duplicates=True)
        cfg = F64.replace(format="bkt", bkt_balance=False)
        st = formats.convert(coo, cfg)
        assert st.g_tot > st.cb                     # ghost groups allocated
        assert st.n_slots <= 4.0 * coo.nnz + (1 << 16)
        # verify the ghost path end-to-end + round-trip
        import jax

        x = create_random_vector(coo.n_col)
        y = np.asarray(jax.jit(formats.spmv_fn(cfg))(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float64)
        assert ok, det
        back = formats.to_coo(st, cfg)
        np.testing.assert_allclose(back.to_dense(), coo.to_dense())

    def test_skew_stays_bounded(self):
        # Concentrated skew without balance: convert picks the cheaper of
        # ghost columns vs a deeper global S and stays under PAD_LIMIT.
        from singlespmv_tpu.formats import bkt as bkt_mod

        coo = powerlaw(2000, 60000, seed=5)
        cfg = F64.replace(format="bkt", bkt_balance=False)
        st = formats.convert(coo, cfg)
        assert st.n_slots <= bkt_mod.PAD_LIMIT * coo.nnz + (1 << 16)
        import jax

        x = create_random_vector(coo.n_col)
        y = np.asarray(jax.jit(formats.spmv_fn(cfg))(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float64)
        assert ok, det

    def test_balance_reduces_slots(self):
        coo = powerlaw(2000, 60000, seed=5)
        st_bal = formats.convert(coo, F64.replace(format="bkt"))
        st_raw = formats.convert(
            coo, F64.replace(format="bkt", bkt_balance=False))
        assert st_bal.n_slots < st_raw.n_slots
        assert st_bal.balanced

    def test_hyper_sparse_refused(self):
        rng = np.random.default_rng(0)
        n = 1 << 15
        coo = COOMatrix.from_triplets(
            n, n, rng.integers(0, n, 3000), rng.integers(0, n, 3000),
            rng.uniform(size=3000), sum_duplicates=True)
        with pytest.raises(ValueError, match="PAD_LIMIT"):
            formats.convert(coo, F64.replace(format="bkt"))


class TestAuto:
    @pytest.mark.parametrize("name,make,expect", [
        # r4: at dtype=float64 the df64 slab kernel legitimately beats
        # XLA-emulated dia (the auto costs carry a measured ~20x f64
        # emulation penalty on the non-df64 formats)
        ("band", lambda: generate("band", 2048, 16, seed=1),
         # r5: xch joined the df64-native set — its band peel carries the
         # diagonals as compensated (hi, lo) planes, beating the 20x
         # emulated-f64 dia under dtype=float64
         {"dia", "slab", "slab2", "xch"}),
        ("dense", lambda: generate("dense", 256, seed=2), {"dense", "bsr"}),
        ("powerlaw", lambda: powerlaw(4096, 4096 * 24, seed=3),
         {"bkt", "bkt_g", "bsr", "dense", "slab", "slab2"}),
    ], ids=["band", "dense", "powerlaw"])
    def test_choice_and_correctness(self, name, make, expect):
        import jax

        coo = make()
        cfg = F64.replace(format="auto")
        st = formats.convert(coo, cfg)
        assert st.chosen in expect, st.chosen
        x = create_random_vector(coo.n_col)
        y = np.asarray(jax.jit(formats.spmv_fn(cfg))(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float64)
        assert ok, det
        fields = formats.report_fields(st, cfg)
        assert fields["ChosenFormat"] == st.chosen.upper()

    def test_through_benchmark_driver(self):
        from singlespmv_tpu.harness.driver import run_benchmark

        res = run_benchmark(powerlaw(512, 8000, seed=6),
                            F64.replace(format="auto"), quick=True,
                            log=lambda m: None)
        assert res.verify_ok
        assert "ChosenFormat" in res.report


def test_k_cap_respill():
    """Adversarial same-lane structure (every row ≡ 0 mod 128, no balance)
    over-chains the collision table — with moderate density convert must
    respill the deep chains into ghost groups, keep K bounded, and stay
    correct end-to-end."""
    import jax

    from singlespmv_tpu.formats import bkt as bkt_mod

    rng = np.random.default_rng(6)
    n = 64 * 128
    nnz = 400000
    rows = rng.integers(0, n // 128, nnz) * 128   # all lo=0: max collisions
    cols = rng.integers(0, n, nnz)
    coo = COOMatrix.from_triplets(n, n, rows, cols, rng.uniform(-1, 1, nnz),
                                  sum_duplicates=True)
    cfg = F64.replace(format="bkt", bkt_balance=False)
    st = formats.convert(coo, cfg)
    assert st.k <= bkt_mod.K_MAX
    x = create_random_vector(coo.n_col)
    y = np.asarray(jax.jit(formats.spmv_fn(cfg))(st, x))
    ok, det = verify_result(coo, x, y, dtype=np.float64)
    assert ok, det


BKT_G_CASES = [
    # grouped mode needs G >= 8 (wide enough matrices); cover the suite's
    # hyper-sparse profile (many rows, few nnz/row), plain power-law, banded
    # locality, and a rectangular case.
    ("powerlaw", lambda: powerlaw(4096, 40000, seed=11)),
    ("hyper", lambda: powerlaw(9000, 26000, seed=12)),
    ("band", lambda: generate("band", 4096, 6, seed=13)),
    ("rect", lambda: _rect_wide()),
]


def _rect_wide(seed=14):
    rng = np.random.default_rng(seed)
    return COOMatrix.from_triplets(
        3000, 4096, rng.integers(0, 3000, 50000),
        rng.integers(0, 4096, 50000), rng.uniform(-1, 1, 50000),
        sum_duplicates=True)


class TestBKTGrouped:
    """Dedicated coverage of the grouped (bkt_row_group=1024) mode — the
    format the auto planner picks for the hyper-sparse suite class."""

    @pytest.mark.parametrize("name,make", BKT_G_CASES,
                             ids=[c[0] for c in BKT_G_CASES])
    def test_spmv_and_roundtrip(self, name, make):
        import jax

        coo = make()
        cfg = F64.replace(format="bkt", bkt_row_group=1024)
        st = formats.convert(coo, cfg)
        assert st.row_group == 1024
        x = create_random_vector(coo.n_col)
        y = np.asarray(jax.jit(formats.spmv_fn(cfg))(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float64)
        assert ok, det
        back = formats.to_coo(st, cfg)
        np.testing.assert_allclose(back.to_dense(), coo.to_dense())

    def test_deep_bucket_spill(self):
        """A hot column block must stay correct through whichever spill plan
        convert picks (ghost columns or deeper S) — e2e + round-trip."""
        import jax

        rng = np.random.default_rng(15)
        n = 4096
        nnz = 40000
        rows = rng.integers(0, n, nnz)
        # 60% of entries in one 128-col block -> its buckets blow past S
        hot = rng.uniform(size=nnz) < 0.6
        cols = np.where(hot, rng.integers(0, 128, nnz),
                        rng.integers(0, n, nnz))
        coo = COOMatrix.from_triplets(n, n, rows, cols,
                                      rng.uniform(-1, 1, nnz),
                                      sum_duplicates=True)
        cfg = F64.replace(format="bkt", bkt_row_group=1024,
                          bkt_balance=False)
        st = formats.convert(coo, cfg)
        x = create_random_vector(coo.n_col)
        y = np.asarray(jax.jit(formats.spmv_fn(cfg))(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float64)
        assert ok, det
        back = formats.to_coo(st, cfg)
        np.testing.assert_allclose(back.to_dense(), coo.to_dense())


class TestPlannerClasses:
    """Planner regression per structural class (VERDICT #10): the chosen
    format must be the one measured fastest for that class (PERFORMANCE.md),
    and the gather-bound fallbacks must always be offered so auto never
    fails — including on f64 where the Pallas formats refuse."""

    CASES = [
        ("band", lambda: generate("band", 1024, 8, seed=31), {"dia", "hyb"}),
        ("block-fem", lambda: _block_fem_small(), {"bsr", "bkt", "bkt_g",
                                                   "dense", "hyb", "slab"}),
        ("scattered", lambda: powerlaw(4096, 40000, seed=33),
         {"bkt_g", "bkt", "css", "slab"}),
        ("web", lambda: powerlaw(8192, 40000, seed=34),
         {"bkt_g", "css", "bkt", "slab"}),
    ]

    @pytest.mark.parametrize("name,make,expect", CASES,
                             ids=[c[0] for c in CASES])
    def test_class_choice(self, name, make, expect):
        from singlespmv_tpu.formats.auto import estimate_costs

        coo = make()
        cfg = Config(dtype="float32")
        costs = estimate_costs(coo, cfg)
        assert {"csr", "ss"} <= set(costs)        # fallbacks always offered
        chosen = min(costs, key=costs.get)
        assert chosen in expect, (chosen, costs)

    def test_f64_auto_end_to_end(self):
        """On f64 the Pallas formats refuse; auto must fall through to an
        XLA-capable format and still verify."""
        import jax

        coo = powerlaw(2048, 20000, seed=35)
        cfg = Config(format="auto", dtype="float64")
        st = formats.convert(coo, cfg)
        x = create_random_vector(coo.n_col)
        y = np.asarray(jax.jit(formats.spmv_fn(cfg))(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float64)
        assert ok, det


def _block_fem_small():
    from singlespmv_tpu.data.structgen import _assemble, _block_band, _diag

    rng = np.random.default_rng(32)
    n, nnz = 4096, 160000
    parts = [_diag(n), _block_band(rng, n, 8, nnz - n, 8)]
    return _assemble(rng, n, n, nnz, parts)
