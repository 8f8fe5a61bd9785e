"""Calibration-loop plumbing: chip constants file round trip + planner pickup."""
import json
import os

import numpy as np

from singlespmv_tpu.core import chipconst


def test_defaults_complete():
    vals = chipconst.load()
    assert set(chipconst.DEFAULTS) <= set(vals)
    assert all(v > 0 for v in vals.values())


def test_save_load_roundtrip(tmp_path, monkeypatch):
    p = str(tmp_path / "cc.json")
    monkeypatch.setenv("SPMV_CHIP_CONSTANTS", p)
    chipconst._cache = None
    try:
        chipconst.save({"hbm_bps": 123e9, "unknown_key": 1.0}, p)
        vals = chipconst.load()
        assert vals["hbm_bps"] == 123e9
        assert "unknown_key" not in vals
        with open(p) as f:
            assert json.load(f) == {"hbm_bps": 123e9}
        # bad values rejected, defaults kept
        with open(p, "w") as f:
            json.dump({"hbm_bps": -5, "sel_slot_s": "x"}, f)
        chipconst._cache = None
        vals = chipconst.load()
        assert vals["hbm_bps"] == chipconst.DEFAULTS["hbm_bps"]
    finally:
        chipconst._cache = None


def test_planner_formula_uses_constants(tmp_path, monkeypatch):
    """slab/xch/auto read the calibrated constants (module import snapshot;
    fresh processes pick up a new calibration file)."""
    from singlespmv_tpu.formats import auto, slab, xch

    assert slab.STEP_FIXED_S == chipconst.get("step_fixed_s")
    assert xch.HBM_BPS == chipconst.get("hbm_bps")
    assert auto.SCATTER_RATE == chipconst.get("scatter_rate")
