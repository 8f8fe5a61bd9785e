"""Scaling-harness tests on the 8-virtual-device CPU mesh."""
from singlespmv_tpu.config import Config
from singlespmv_tpu.data.generators import powerlaw
from singlespmv_tpu.parallel.bench import (mesh_sizes, report, strong_scaling,
                                           weak_scaling)


CFG = Config(format="ss", dtype="float64", segment_width=128)


def test_mesh_sizes():
    assert mesh_sizes(8) == [1, 2, 4, 8]
    assert mesh_sizes(1) == [1]


def test_weak_scaling_runs():
    pts = weak_scaling(lambda n: powerlaw(64 * n, 900 * n, seed=n),
                       CFG, loop=2, limit=4)
    assert [p.n_devices for p in pts] == [1, 2, 4]
    assert pts[0].efficiency == 1.0
    assert all(p.nnz_per_s > 0 for p in pts)
    txt = report(pts)
    assert "eff%" in txt and len(txt.splitlines()) == 4


def test_strong_scaling_runs():
    pts = strong_scaling(powerlaw(256, 4000, seed=3), CFG, loop=2, limit=2)
    assert [p.n_devices for p in pts] == [1, 2]
    assert pts[0].efficiency == 1.0
