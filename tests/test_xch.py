"""XCH engine: correctness on every structural class, chunking, round-trip.

The engine exists for the hyper-sparse giant class (VERDICT r3 item 1);
these tests shrink each giant structure to test scale and check against the
dense oracle, plus the slab-style invariants (chunked == single-call,
to_coo round trip, empty rows, repeat-call purity).
"""
import numpy as np
import pytest

import jax

from singlespmv_tpu.config import Config
from singlespmv_tpu.core.oracle import verify_result
from singlespmv_tpu.core.types import COOMatrix
from singlespmv_tpu.formats import convert, spmv_fn, to_coo
from singlespmv_tpu.formats import xch as xch_mod

F32 = Config(format="xch", dtype="float32")


def _mix(n, nnz, seed, local_frac=0.4, diag=True, hub_cols=0, dense_rows=0):
    """Small-scale circuit/web-style mix: diag + local + scatter + hubs."""
    rng = np.random.default_rng(seed)
    parts = []
    if diag:
        r = np.arange(n)
        parts.append((r, r))
    rest = max(nnz - (n if diag else 0), 0)
    loc = int(rest * local_frac)
    r = rng.integers(0, n, loc)
    c = np.clip(r + rng.laplace(0, max(n // 100, 2), loc).astype(np.int64),
                0, n - 1)
    parts.append((r, c))
    sc = rest - loc
    r = rng.integers(0, n, sc)
    if hub_cols:
        hubs = rng.choice(n, hub_cols, replace=False)
        c = np.where(rng.random(sc) < 0.5, hubs[rng.integers(0, hub_cols, sc)],
                     rng.integers(0, n, sc))
    else:
        c = rng.integers(0, n, sc)
    parts.append((r, c))
    if dense_rows:
        dr = rng.choice(n, dense_rows, replace=False)
        per = max(n // 3, 8)
        r = np.repeat(dr, per)
        c = rng.integers(0, n, r.size)
        parts.append((r, c))
    rows = np.concatenate([p[0] for p in parts])
    cols = np.concatenate([p[1] for p in parts])
    key = np.unique(rows * n + cols)
    rows, cols = key // n, key % n
    vals = rng.uniform(0.1, 1.0, rows.size)
    return COOMatrix.from_triplets(n, n, rows, cols, vals, sort=True)


MATRICES = [
    ("circuit-mix", lambda: _mix(5000, 25000, 0)),
    ("web-hubs", lambda: _mix(4096, 16384, 1, local_frac=0.0, hub_cols=40)),
    ("dense-rows", lambda: _mix(3000, 20000, 2, dense_rows=4)),
    ("pure-scatter", lambda: _mix(2500, 12000, 3, local_frac=0.0,
                                  diag=False)),
    ("banded", lambda: _mix(2048, 14000, 4, local_frac=0.95)),
    ("tall", lambda: _mix(9000, 18000, 5)),
]


def _check(coo, cfg=F32, seed=7):
    x = np.random.default_rng(seed).uniform(size=coo.n_col).astype(np.float32)
    st = convert(coo, cfg)
    y = np.asarray(jax.jit(spmv_fn(cfg))(st, x))
    ok, det = verify_result(coo, x, y, dtype=np.float32)
    assert ok, det
    return st, x, y


@pytest.mark.parametrize("label,make", MATRICES)
def test_xch_oracle(label, make):
    coo = make()
    st, x, y = _check(coo)
    # repeat-call purity (the reference's verify-twice, main.cpp:40-56)
    y2 = np.asarray(jax.jit(spmv_fn(F32))(st, x))
    np.testing.assert_array_equal(y, y2)


@pytest.mark.parametrize("label,make", MATRICES[:3])
def test_xch_to_coo_roundtrip(label, make):
    coo = make()
    st, _, _ = _check(coo)
    back = to_coo(st, F32)
    np.testing.assert_allclose(back.to_dense(),
                               coo.to_dense().astype(np.float32), rtol=1e-6)


def test_xch_empty_rows_and_cols():
    # rows 7..9 empty; some columns never referenced
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 7, 50)
    cols = rng.integers(0, 10, 50)
    coo = COOMatrix.from_triplets(10, 10, rows, cols,
                                  rng.uniform(1, 2, 50), sort=True)
    st, x, y = _check(coo)
    assert np.all(y[np.setdiff1d(np.arange(10), np.unique(rows))] == 0)


def test_xch_empty_matrix():
    coo = COOMatrix.from_triplets(8, 8, [], [], [], sort=True)
    st = convert(coo, F32)
    y = np.asarray(jax.jit(spmv_fn(F32))(st, np.ones(8, np.float32)))
    assert np.all(y == 0)


def test_xch_rectangular():
    rng = np.random.default_rng(2)
    coo = COOMatrix.from_triplets(
        600, 3000, rng.integers(0, 600, 4000), rng.integers(0, 3000, 4000),
        rng.uniform(1, 2, 4000), sort=True)
    _check(coo)


def test_xch_chunked_stream(monkeypatch):
    """Pass-2 streams longer than the step cap split into several
    pallas_calls whose concatenated outputs equal the single-call result."""
    coo = _mix(60000, 150000, 0)
    x = np.random.default_rng(3).uniform(size=coo.n_col).astype(np.float32)
    y_single = np.asarray(jax.jit(spmv_fn(F32))(convert(coo, F32), x))
    monkeypatch.setattr(xch_mod, "CHUNK_ROWS", 8 * 64)  # ≤8 steps per call
    st = convert(coo, F32)
    assert len(st.gids2) > 1
    y_chunked = np.asarray(jax.jit(spmv_fn(F32))(st, x))
    np.testing.assert_allclose(y_single, y_chunked, rtol=2e-6, atol=1e-7)


def test_xch_fill_factor():
    """The engine's reason to exist: pad stays near 1 on scattered giants
    (slab pads 6-16x there).  slots1+slots2 over 2*nnz <= 1.6 on the
    hyper-sparse mix."""
    coo = _mix(80000, 500000, 9, local_frac=0.2)
    st = convert(coo, F32)
    pad = (st.n_slots1 + st.n_slots2) / (2 * coo.nnz)
    assert pad <= 1.6, pad


def test_xch_estimate_fields():
    coo = _mix(5000, 25000, 0)
    est = xch_mod.estimate(coo, F32)
    assert est["feasible"] and est["est_s"] > 0
    assert est["route_v"] == 4
    assert 1 <= est["kblk"] <= 32
    assert 8 <= est["p_oh"] <= 64
    assert est["k_slots"] >= 16 * 128


def test_xch_v3_v4_agree():
    """The v3 σ-plane engine and the v4 blk-routed engine must both verify
    and agree to f32 tolerance on the same matrix."""
    coo = _mix(5000, 25000, 0)
    x = np.random.default_rng(5).uniform(size=coo.n_col).astype(np.float32)
    ys = []
    for plan in (xch_mod.estimate_v3(coo, F32) | {"route_v": 3},
                 xch_mod.estimate(coo, F32)):
        st = xch_mod.convert(coo, F32, plan=plan)
        y = np.asarray(jax.jit(xch_mod.spmv)(st, x))
        ok, det = verify_result(coo, x, y, dtype=np.float32)
        assert ok, f"route_v={plan.get('route_v')}: {det}"
        ys.append(y)
    # different summation orders: f32 round-off only
    np.testing.assert_allclose(ys[0], ys[1], rtol=1e-4, atol=1e-5)


def test_xch_long_row_split():
    """Rows ≥ LONG_DEG split into the nested compact exchange; the merged
    result must verify and the split must actually engage."""
    rng = np.random.default_rng(11)
    n = 20000
    rows = rng.integers(0, n, 60000)
    # 8 hub rows with ~2000 entries each (≥ LONG_DEG)
    hub = np.repeat(rng.choice(n, 8, replace=False), 2000)
    rows = np.concatenate([rows, hub])
    cols = rng.integers(0, n, len(rows))
    coo = COOMatrix.from_triplets(n, n, rows, cols,
                                  rng.uniform(1, 2, len(rows)), sort=True)
    st = convert(coo, F32)
    assert st.long_n >= 8 and st.long is not None
    x = np.random.default_rng(3).uniform(size=n).astype(np.float32)
    y = np.asarray(jax.jit(spmv_fn(F32))(st, x))
    ok, det = verify_result(coo, x, y, dtype=np.float32)
    assert ok, det
    rt = xch_mod.to_coo(st)
    dedup = coo  # from_triplets already sums duplicates
    assert rt.nnz == dedup.nnz
    np.testing.assert_array_equal(rt.row, dedup.row)
    np.testing.assert_array_equal(rt.col, dedup.col)


def test_xch_spmm_panel():
    """v4 panel SpMM (index streams shared across columns) must match the
    vmap'd spmv column-by-column result."""
    coo = _mix(20000, 160000, 0)
    st = convert(coo, F32)
    assert isinstance(st, xch_mod.Xch4State)
    rng = np.random.default_rng(4)
    X = rng.uniform(-1, 1, (coo.n_col, 8)).astype(np.float32)
    Y = np.asarray(jax.jit(xch_mod.spmm)(st, jax.numpy.asarray(X)))
    for b in (0, 3, 7):
        y = np.asarray(jax.jit(xch_mod.spmv)(st, jax.numpy.asarray(X[:, b])))
        np.testing.assert_allclose(Y[:, b], y, rtol=2e-5, atol=1e-6)
    # oracle check on one column
    yref = np.zeros(coo.n_row)
    np.add.at(yref, coo.row, coo.val * X[coo.col, 0].astype(np.float64))
    ok, det = verify_result(coo, X[:, 0], Y[:, 0], dtype=np.float32)
    assert ok, det


def test_xch_estimate_positive_on_dense_row_matrices():
    """r5 regression: the long-row branch once subtracted the FULL-matrix
    long mass from the peel-reduced nnz, producing a NEGATIVE estimate on
    dense-row matrices (RM07R read −2.7 ms and auto flipped away from the
    measured-faster hyb)."""
    rng = np.random.default_rng(3)
    n = 30000
    # block-dense rows (deg ~120, all >= LONG_DEG) + a strong diagonal band
    rows = np.repeat(np.arange(0, n, 4), 120)
    cols = (rows + rng.integers(-60, 60, rows.size)) % n
    d = np.arange(n)
    rows = np.concatenate([rows, d, d[:-1]])
    cols = np.concatenate([cols, d, d[:-1] + 1])
    coo = COOMatrix.from_triplets(n, n, rows, cols,
                                  rng.uniform(1, 2, rows.size),
                                  sum_duplicates=True)
    est = xch_mod.estimate_v4(coo, Config(format="xch", dtype="float32"))
    assert est["feasible"] and est["est_s"] > 0, est


def test_xch_df64_full_semantics():
    """dtype=float64 runs the compensated (2×f32) v4 kernels — verify at
    df64 precision (~1e-13 rel), not the f32 bar, across peel/long/plain
    paths."""
    from singlespmv_tpu.data.generators import generate, powerlaw

    F64 = Config(format="xch", dtype="float64")
    for coo in (powerlaw(4096, 40000, seed=2),
                generate("band", 2048, 9, seed=1)):
        st = xch_mod.convert(coo, F64)
        assert st.val1_lo is not None or st.n_slots1 == 0
        x = np.random.default_rng(3).uniform(-1, 1, coo.n_col)
        y = np.asarray(jax.jit(xch_mod.spmv)(st, jax.numpy.asarray(x)))
        assert y.dtype == np.float64
        yref = np.zeros(coo.n_row)
        np.add.at(yref, coo.row, coo.val * x[coo.col])
        rel = np.abs(y - yref).max() / max(np.abs(yref).max(), 1e-300)
        assert rel < 1e-11, rel
        # roundtrip keeps full f64 values (hi + lo reassembled)
        rt = xch_mod.to_coo(st)
        assert rt.nnz == coo.nnz
        np.testing.assert_array_equal(rt.row, coo.row)
        np.testing.assert_array_equal(rt.col, coo.col)
        np.testing.assert_allclose(rt.val, coo.val, rtol=1e-13)
