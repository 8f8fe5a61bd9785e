"""Converted-state cache (checkpoint/resume analog) tests."""
import numpy as np

import jax

from singlespmv_tpu import formats
from singlespmv_tpu.config import Config
from singlespmv_tpu.core.oracle import verify_result
from singlespmv_tpu.core.rng import create_random_vector
from singlespmv_tpu.data.generators import generate, powerlaw
from singlespmv_tpu.formats.cache import convert_cached, load_state, save_state

F64 = Config(dtype="float64", segment_width=128)


def _check(coo, cfg, state):
    x = create_random_vector(coo.n_col)
    y = np.asarray(jax.jit(formats.spmv_fn(cfg))(state, x))
    ok, det = verify_result(coo, x, y, dtype=np.float64)
    assert ok, det


def test_roundtrip_simple(tmp_path):
    coo = generate("band", 96, 5, seed=1)
    cfg = F64.replace(format="csr")
    st = formats.convert(coo, cfg)
    p = str(tmp_path / "s")
    save_state(p, st, coo, cfg)
    st2 = load_state(p, coo, cfg)
    assert st2 is not None and st2.nnz == st.nnz
    _check(coo, cfg, st2)


def test_roundtrip_nested_bkt(tmp_path):
    coo = powerlaw(2000, 60000, seed=5)     # spills (ghost columns or deep S)
    cfg = F64.replace(format="bkt", bkt_balance=False)
    st = formats.convert(coo, cfg)
    p = str(tmp_path / "bkt")
    save_state(p, st, coo, cfg)
    st2 = load_state(p, coo, cfg)
    assert st2.n_ghost == st.n_ghost and st2.n_slots == st.n_slots
    _check(coo, cfg, st2)


def test_roundtrip_auto_wrapper(tmp_path):
    coo = generate("band", 512, 8, seed=2)
    cfg = F64.replace(format="auto")
    st = formats.convert(coo, cfg)
    p = str(tmp_path / "auto")
    save_state(p, st, coo, cfg)
    st2 = load_state(p, coo, cfg)
    assert st2.chosen == st.chosen
    _check(coo, cfg, st2)


def test_fingerprint_mismatch_rejected(tmp_path):
    coo = generate("band", 96, 5, seed=1)
    cfg = F64.replace(format="csr")
    p = str(tmp_path / "s")
    save_state(p, formats.convert(coo, cfg), coo, cfg)
    other = generate("band", 96, 5, seed=2)
    assert load_state(p, other, cfg) is None              # different values/nnz
    assert load_state(p, coo, cfg.replace(format="ss")) is None


def test_convert_cached(tmp_path):
    coo = generate("unbalance", 64, seed=3)
    cfg = F64.replace(format="ss")
    st1 = convert_cached(coo, cfg, str(tmp_path), "m1")
    st2 = convert_cached(coo, cfg, str(tmp_path), "m1")   # from disk
    np.testing.assert_array_equal(np.asarray(st1.col), np.asarray(st2.col))
    _check(coo, cfg, st2)
