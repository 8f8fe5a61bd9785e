"""SLAB (fused windowed stream-row format) — correctness, packing, planning.

The slab kernel fuses gather/multiply/run-reduce/route in one Pallas pass
(ops/pallas/slab.py); these tests pin oracle parity across the structure
classes it must own (band, powerlaw, hyper-sparse, block FEM), round-trip,
pad accounting, and the (m, T) planner behavior.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from singlespmv_tpu.config import Config
from singlespmv_tpu.core import verify_result
from singlespmv_tpu.core.types import COOMatrix
from singlespmv_tpu.data.generators import generate, powerlaw
from singlespmv_tpu.formats import convert, spmv_fn, to_coo
from singlespmv_tpu.formats import slab as slab_mod

F32 = Config(format="slab", dtype="float32")


def _hyper(n=5000, nnz=15000, seed=5):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.uniform(0.1, 1.0, nnz)
    return COOMatrix.from_triplets(n, n, r, c, v, sort=True,
                                   sum_duplicates=True)


MATRICES = [
    ("band", lambda: generate("band", 2048, 8, seed=1)),
    ("powerlaw", lambda: powerlaw(2048, 2048 * 8, seed=2)),
    ("hyper-sparse", lambda: _hyper()),
    ("random-small", lambda: generate("random", 512, 4, seed=3)),
    ("tall", lambda: powerlaw(3000, 9000, seed=7)),
]


@pytest.mark.parametrize("label,make", MATRICES)
def test_slab_spmv_vs_oracle(label, make):
    coo = make()
    st = convert(coo, F32)
    x = np.random.default_rng(3).uniform(size=coo.n_col).astype(np.float32)
    fn = jax.jit(spmv_fn(F32))
    y = np.asarray(fn(st, x))
    ok, det = verify_result(coo, x, y, dtype=np.float32)
    assert ok, f"{label}: {det}"
    y2 = np.asarray(fn(st, x))
    assert (y == y2).all()


@pytest.mark.parametrize("label,make", MATRICES[:3])
def test_slab_round_trip(label, make):
    coo = make()
    st = convert(coo, F32)
    back = to_coo(st, F32)
    np.testing.assert_allclose(back.to_dense(),
                               coo.to_dense().astype(np.float32),
                               rtol=1e-6, atol=1e-7)


def test_slab_pad_accounting():
    coo = generate("band", 2048, 8, seed=1)
    st = convert(coo, F32)
    assert st.n_slots >= coo.nnz
    assert st.n_slots <= slab_mod.PAD_LIMIT * coo.nnz + (1 << 16)
    # stream rows are grouped: uids non-decreasing, one block per unit
    uids = np.asarray(st.uids)
    assert (np.diff(uids) >= 0).all()
    assert len(np.asarray(st.unit_ids)) == st.n_units


def test_slab_estimate_matches_convert():
    coo = powerlaw(4096, 4096 * 6, seed=9)
    plan = slab_mod.estimate(coo, F32)
    assert plan["feasible"]
    st = convert(coo, F32)
    assert st.m == plan["m"] and st.t_step == plan["t"]
    assert st.n_slots == plan["slots"]


def test_slab_empty_and_single():
    empty = COOMatrix.from_triplets(64, 64, [], [], [], sort=True)
    st = convert(empty, F32)
    y = np.asarray(spmv_fn(F32)(st, np.zeros(64, np.float32)))
    assert (y == 0).all()

    single = COOMatrix.from_triplets(10, 10, [3], [7], [2.5], sort=True)
    st = convert(single, F32)
    x = np.arange(10, dtype=np.float32)
    y = np.asarray(spmv_fn(F32)(st, x))
    exp = np.zeros(10, np.float32)
    exp[3] = 2.5 * 7
    np.testing.assert_allclose(y, exp, rtol=1e-6)


def test_slab_blk_mode():
    """The blk route (single idx plane + MXU one-hot) must verify end-to-end
    when the planner picks it; force it by monkey-patching the candidate
    sets so only blk plans are offered."""
    coo = powerlaw(4096, 4096 * 10, seed=21)
    orig_span, orig_blk = slab_mod.SPAN_CANDS, slab_mod.BLK_PLANES
    try:
        slab_mod.SPAN_CANDS = ()
        st = convert(coo, F32)
    finally:
        slab_mod.SPAN_CANDS = orig_span
        slab_mod.BLK_PLANES = orig_blk
    assert st.mode == "blk" and st.sig is not None
    x = np.random.default_rng(3).uniform(size=coo.n_col).astype(np.float32)
    y = np.asarray(jax.jit(spmv_fn(F32))(st, x))
    ok, det = verify_result(coo, x, y, dtype=np.float32)
    assert ok, det
    back = to_coo(st, F32)
    np.testing.assert_allclose(back.to_dense(),
                               coo.to_dense().astype(np.float32),
                               rtol=1e-6, atol=1e-7)


def test_slab_f64_interpret():
    # f64 runs through interpret mode off-TPU (on TPU spmv raises, like bkt)
    coo = generate("band", 256, 4, seed=0)
    cfg = Config(format="slab", dtype="float64")
    st = convert(coo, cfg)
    x = np.random.default_rng(3).uniform(size=coo.n_col)
    y = np.asarray(spmv_fn(cfg)(st, x))
    ok, det = verify_result(coo, x, y, dtype=np.float64)
    assert ok, det


@pytest.mark.parametrize("label,make", MATRICES[:3])
def test_slab_chunked_stream(label, make, monkeypatch):
    """Giant-matrix path: streams longer than CHUNK_ROWS split into several
    pallas_calls whose concatenated outputs must equal the single-call result
    (the win prefetch otherwise overflows the 1 MB SMEM — r3 ML_Geer)."""
    from singlespmv_tpu.formats import slab as slab_mod

    coo = make()
    x = np.random.default_rng(3).uniform(size=coo.n_col).astype(np.float32)
    fn = jax.jit(spmv_fn(F32))
    y_single = np.asarray(fn(convert(coo, F32), x))
    monkeypatch.setattr(slab_mod, "CHUNK_ROWS", 64)
    st = convert(coo, F32)
    if len(st.uids) == 1:      # stream fits one chunk even at 64 rows
        monkeypatch.setattr(slab_mod, "CHUNK_ROWS", st.t_step)
        st = convert(coo, F32)
    if len(st.uids) == 1:
        pytest.skip(f"{label}: stream is a single step — cannot chunk")
    assert sum(st.chunk_nu) == st.n_units
    y_chunked = np.asarray(jax.jit(spmv_fn(F32))(st, x))
    np.testing.assert_array_equal(y_single, y_chunked)
    ok, det = verify_result(coo, x, y_chunked, dtype=np.float32)
    assert ok, f"{label}: {det}"
    # round trip must also survive chunking
    back = to_coo(st, F32)
    np.testing.assert_allclose(back.to_dense(),
                               coo.to_dense().astype(np.float32), rtol=1e-6)


@pytest.mark.parametrize("kblk", [2, 4])
@pytest.mark.parametrize("label,make", MATRICES[:3])
def test_slab_blk_k_modes(label, make, kblk):
    """blk-k: stream rows spanning k aligned 128-row blocks (the r3 fill
    unlock) must agree with the oracle for every plan the walker can emit."""
    from singlespmv_tpu.formats import slab as slab_mod

    coo = make()
    rows0 = coo.row.astype(np.int64)
    cols0 = coo.col.astype(np.int64)
    shift = 7 + kblk.bit_length() - 1
    scope0 = rows0 >> shift
    cmult = int(cols0.max()) + 1
    from singlespmv_tpu.core import hostmem as hm
    o0 = hm.argsort_keys(scope0 * cmult + cols0)
    cols_s, scope_s = cols0[o0], scope0[o0]
    sb = np.flatnonzero(np.concatenate([[True], scope_s[1:] != scope_s[:-1]]))
    sizes, bases, urows = slab_mod._walk(cols_s, np.append(sb, len(cols_s)), 4)
    plan = {"feasible": True, "est_s": 0.0, "m": 4, "t": 32, "planes": 8,
            "mode": "blk", "kblk": kblk, "order": o0, "sizes": sizes,
            "bases": bases, "urows": urows,
            "unit_ids": scope_s[sb].astype(np.int32),
            "slots": int(sum(sizes)) * 128,
            "hub_cols": None, "cols_eff": None, "hub_off": 0}
    st = slab_mod.convert(coo, F32, plan=plan)
    x = np.random.default_rng(3).uniform(size=coo.n_col).astype(np.float32)
    y = np.asarray(jax.jit(spmv_fn(F32))(st, x))
    ok, det = verify_result(coo, x, y, dtype=np.float32)
    assert ok, f"{label} kblk={kblk}: {det}"
    back = to_coo(st, F32)
    np.testing.assert_allclose(back.to_dense(),
                               coo.to_dense().astype(np.float32), rtol=1e-6)


@pytest.mark.parametrize("planes", [8, 16])
def test_slab_spmm_panel_matches_vmap(planes):
    """Unit-mode SpMM panel kernel (streams read once for all B columns)
    must equal the per-column vmap bitwise."""
    from singlespmv_tpu.core import hostmem as hm
    from singlespmv_tpu.data.generators import powerlaw

    coo = powerlaw(3000, 40000, seed=2)
    rows0 = coo.row.astype(np.int64)
    cols0 = coo.col.astype(np.int64)
    plan = slab_mod._estimate_cols(
        rows0, cols0, coo.nnz,
        fixed={"mode": "unit", "kblk": 1, "m": 4, "t": 32, "planes": planes})
    assert plan["feasible"]
    plan.update(hub_cols=None, cols_eff=None, hub_off=0)
    st = slab_mod.convert(coo, F32, plan=plan)
    assert st.mode == "unit" and st.planes == planes
    X = np.random.default_rng(0).uniform(size=(coo.n_col, 8)).astype(
        np.float32)
    Y = np.asarray(jax.jit(slab_mod.spmm)(st, X))
    Yv = np.asarray(jax.vmap(slab_mod.spmv, in_axes=(None, 1),
                             out_axes=1)(st, X))
    np.testing.assert_array_equal(Y, Yv)
    ref = coo.to_dense().astype(np.float64) @ X.astype(np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-5)


def _dense(coo):
    d = np.zeros((coo.n_row, coo.n_col))
    np.add.at(d, (np.asarray(coo.row), np.asarray(coo.col)), np.asarray(coo.val))
    return d


def test_slab_df64_semantics():
    """dtype=float64 runs the df64 (2xf32) unit kernel with true f64
    precision — errors orders below the 1e-6 verify bar (r4; the r3 df64
    path existed only in css)."""
    rng = np.random.default_rng(7)
    nnz = 20000
    coo = COOMatrix.from_triplets(
        2000, 1500, rng.integers(0, 2000, nnz), rng.integers(0, 1500, nnz),
        rng.uniform(-1, 2, nnz), sort=True)
    cfg = F32.replace(dtype="float64")
    st = convert(coo, cfg)
    assert st.val_lo is not None and st.mode == "unit"
    x = rng.uniform(-1, 1, coo.n_col)
    y = np.asarray(jax.jit(spmv_fn(cfg))(st, jnp.asarray(x)))
    ref = _dense(coo) @ x
    err = np.abs(y - ref)
    rel = err / np.maximum(np.abs(ref), 1e-30)
    assert (np.minimum(err, rel) < 1e-9).all(), (err.max(), rel.max())
