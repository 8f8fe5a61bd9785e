"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (multi-chip sharding tests) —
the TPU chip is reserved for benchmarking.  Must be set before jax imports.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the harness env pins JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from singlespmv_tpu.config import Config  # noqa: E402
from singlespmv_tpu.data import fixtures as fx  # noqa: E402
from singlespmv_tpu.data.generators import generate, powerlaw  # noqa: E402


def all_test_matrices():
    """(name, COOMatrix) pairs covering every format's pathological cases."""
    mats = [(n, f()) for n, f in fx.ALL_FIXTURES.items()]
    mats += [
        ("band-64", generate("band", 64, 5, seed=1)),
        ("band-art-128", generate("band", 128, artificial=True, seed=2)),
        ("dense-32", generate("dense", 32, seed=3)),
        ("unbalance-64", generate("unbalance", 64, seed=4)),
        ("unbalance-art-64", generate("unbalance", 64, artificial=True, seed=4)),
        ("random_unbalance-32", generate("random_unbalance", 32, seed=5)),
        ("random-128", generate("random", 128, 900, seed=6)),
        ("powerlaw-256", powerlaw(256, 4000, seed=8)),
    ]
    return mats


@pytest.fixture(scope="session")
def matrices():
    return all_test_matrices()


@pytest.fixture(scope="session")
def f64_cfg():
    return Config(dtype="float64")


def rand_x(n, seed=3):
    return np.random.default_rng(seed).uniform(-1.0, 1.0, size=n)
