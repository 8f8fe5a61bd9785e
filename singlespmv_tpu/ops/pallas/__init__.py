"""Pallas TPU kernels.

``supports(dtype)``: Mosaic compiles f32/bf16 vector kernels; f64 is emulated at
the XLA level only.  On non-TPU backends kernels run in interpret mode, where any
dtype works — formats use this predicate to pick the Pallas ("optimized") or XLA
("simple") engine.
"""
from __future__ import annotations

import jax
import numpy as np


def supports(dtype) -> bool:
    if jax.default_backend() != "tpu":
        return True  # interpret mode
    return np.dtype(dtype) in (np.dtype("float32"), np.dtype("bfloat16"))
