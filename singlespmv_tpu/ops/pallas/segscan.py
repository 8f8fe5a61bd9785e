"""Pallas TPU kernel: intra-segment segmented inclusive scan.

The "OPTIMIZED" Sum1 engine for the SS/CSS/CSR5 formats — the TPU analog of the
reference's log-tree segment sum (/root/reference/src/opt_ss.cpp:242-260) and CSR5's
in-register ``hscan_avx`` partial scans
(/root/reference/opt/Benchmark_SpMV_using_CSR5/CSR5_avx2/detail/avx2/utils_avx2.h).

Algorithm: Hillis–Steele segmented scan over each W-wide stream segment, log₂(W)
steps entirely in VMEM/VPU registers.  Flags ride as int32 (Mosaic has no
uint8→float casts; comparisons give native vector masks):

    v ← where(f > 0, v, v + shift_right(v, d, fill=0))
    f ← max(f, shift_right(f, d, fill=1))

The shifts are static-width concatenations, which Mosaic lowers to lane shifts
(d < 128) and sublane/lane relayouts (d ≥ 128).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import cdiv

DEFAULT_BLOCK_ROWS = 8


def _segscan_kernel(v_ref, f_ref, out_ref):
    v = v_ref[:]
    f = f_ref[:]  # int32: 1 at run heads
    w = v.shape[-1]
    d = 1
    while d < w:
        vz = jnp.concatenate([jnp.zeros_like(v[:, :d]), v[:, :-d]], axis=1)
        fz = jnp.concatenate([jnp.ones_like(f[:, :d]), f[:, :-d]], axis=1)
        v = jnp.where(f > 0, v, v + vz)
        f = jnp.maximum(f, fz)
        d *= 2
    out_ref[:] = v


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("block_rows",))
def segmented_scan_tiles(products: jax.Array, heads: jax.Array,
                         *, block_rows: int = DEFAULT_BLOCK_ROWS) -> jax.Array:
    """Segmented inclusive sum-scan along axis=-1 of an (H, W) stream.

    heads: bool (H, W), True at the first element of each row-run.
    Each stream row scans independently (cross-row carries are handled by the
    formats' combine stage).
    """
    h, w = products.shape
    g = min(block_rows, h)
    grid = (cdiv(h, g),)
    heads_i32 = heads.astype(jnp.int32)
    return pl.pallas_call(
        _segscan_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), products.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(products, heads_i32)
