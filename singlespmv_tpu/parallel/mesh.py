"""Mesh construction helpers."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def device_count() -> int:
    import jax

    return len(jax.devices())


def make_mesh(shape: Optional[Sequence[Tuple[str, int]]] = None):
    """Build a Mesh from (axis, size) pairs; default = 1-D "row" mesh of all devices.

    On a real pod slice the device order respects ICI topology via
    ``mesh_utils.create_device_mesh``; on the CPU backend (virtual devices) plain
    reshape is fine.
    """
    import jax
    from jax.sharding import Mesh

    if shape is None:
        shape = (("row", len(jax.devices())),)
    names = tuple(n for n, _ in shape)
    sizes = tuple(int(s) for _, s in shape)
    n = int(np.prod(sizes))
    devs = jax.devices()[:n]
    if n > len(devs):
        raise ValueError(f"mesh needs {n} devices, have {len(devs)}")
    try:
        from jax.experimental import mesh_utils

        if jax.default_backend() == "tpu":
            arr = mesh_utils.create_device_mesh(sizes, devices=devs)
        else:
            arr = np.array(devs).reshape(sizes)
    except Exception:
        arr = np.array(devs).reshape(sizes)
    return Mesh(arr, names)
