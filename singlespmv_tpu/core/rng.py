"""Deterministic input generation.

The reference seeds ``srand(3)`` (/root/reference/src/main.cpp:18) and fills x with
``rand()/RAND_MAX``-style uniforms (/root/reference/src/util.cpp:92-102) so every run
is reproducible.  We use a fixed-seed PCG64 for the same property.
"""
from __future__ import annotations

import numpy as np

DEFAULT_SEED = 3  # mirrors srand(3)


def create_random_vector(n: int, *, seed: int = DEFAULT_SEED, dtype=np.float64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, size=n).astype(dtype)


def create_random_matrix(n: int, k: int, *, seed: int = DEFAULT_SEED, dtype=np.float64) -> np.ndarray:
    """Dense panel for SpMM inputs."""
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, size=(n, k)).astype(dtype)
