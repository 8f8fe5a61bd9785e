"""Fused block-gathered SpMV stream kernel (Mul + Sum1 in one VMEM pass).

The TPU re-design of the reference's cache-blocked CSS hot loop
(/root/reference/src/opt_css.cpp:226-303): XLA's general gather runs at ~0.14
G elements/s on TPU (scalar-bound), ~300× off bandwidth — so the gather must become
a *lane-wise* ``take_along_axis``, which Mosaic lowers to the hardware's 128-lane
dynamic-gather (measured ~11 G elements/s).  That requires every kernel tile to
read from a single 128-column block of x:

- convert orders the nnz stream by (col // 128, row, col) and pads each column
  block's sub-stream to a whole number of (8·W)-element tiles — the CSS blocking
  discipline with N_BLOCK = ceil(n_col/128);
- the kernel holds x as a (B, 128) VMEM table; per tile it slices the tile's block
  row (scalar-prefetched block id, one per tile), gathers the whole (8·W/128, 128)
  tile with lane indices (col − 128·block) in ONE take_along_axis, multiplies by
  val, and runs the Hillis–Steele segmented scan in registers (the reference's
  per-block log-tree, opt_css.cpp:248-265).

Mosaic constraints honored: all intermediates 2-D; (8, W) ↔ (8W/128, 128) relayouts
only (full-minor shape casts are supported; 1-D↔2-D of long rows is not).

Output is the scanned product stream; run-end extraction + the cross-row combine
stay in XLA (formats.ss.reduce).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import cdiv

BLOCK_ROWS = 8
LANES = 128


def _kernel(bids_ref, col_ref, val_ref, heads_ref, x_ref, out_ref):
    tile = pl.program_id(0)
    w = col_ref.shape[1]
    g = BLOCK_ROWS * w // LANES

    bid = bids_ref[tile]                                  # one block per tile
    xrow = x_ref[pl.ds(bid, 1), :]                        # (1, 128)
    xb = jnp.broadcast_to(xrow, (g, LANES))
    lanes = (col_ref[:] - bid * LANES).reshape(g, LANES)
    gathered = jnp.take_along_axis(xb, lanes, axis=1)     # (g, 128)
    v = (val_ref[:].reshape(g, LANES) * gathered).reshape(BLOCK_ROWS, w)

    # Segmented inclusive scan (Hillis–Steele), log2(W) lane-shift steps.
    f = heads_ref[:]
    d = 1
    while d < w:
        vz = jnp.concatenate([jnp.zeros_like(v[:, :d]), v[:, :-d]], axis=1)
        fz = jnp.concatenate([jnp.ones_like(f[:, :d]), f[:, :-d]], axis=1)
        v = jnp.where(f > 0, v, v + vz)
        f = jnp.maximum(f, fz)
        d *= 2
    out_ref[:] = v


def _df_kernel(bids_ref, col_ref, valh_ref, vall_ref, heads_ref,
               xh_ref, xl_ref, outh_ref, outl_ref):
    """df64 (2×f32) variant: double-float product + compensated segmented scan.

    Same tile structure as _kernel; values ride as (hi, lo) planes.  Product =
    Dekker two-product + cross terms; scan steps use the sloppy df-add (lo
    absorbs hi-sum errors, renormalised once at the end) — see ops/df64.py.
    """
    from ...ops import df64 as df

    tile = pl.program_id(0)
    w = col_ref.shape[1]
    g = BLOCK_ROWS * w // LANES

    bid = bids_ref[tile]
    lanes = (col_ref[:] - bid * LANES).reshape(g, LANES)
    xbh = jnp.broadcast_to(xh_ref[pl.ds(bid, 1), :], (g, LANES))
    xbl = jnp.broadcast_to(xl_ref[pl.ds(bid, 1), :], (g, LANES))
    gh = jnp.take_along_axis(xbh, lanes, axis=1)
    gl = jnp.take_along_axis(xbl, lanes, axis=1)
    vh, vl = df.df_mul(valh_ref[:].reshape(g, LANES),
                       vall_ref[:].reshape(g, LANES), gh, gl)
    vh = vh.reshape(BLOCK_ROWS, w)
    vl = vl.reshape(BLOCK_ROWS, w)

    f = heads_ref[:]
    d = 1
    while d < w:
        vhz = jnp.concatenate([jnp.zeros_like(vh[:, :d]), vh[:, :-d]], axis=1)
        vlz = jnp.concatenate([jnp.zeros_like(vl[:, :d]), vl[:, :-d]], axis=1)
        fz = jnp.concatenate([jnp.ones_like(f[:, :d]), f[:, :-d]], axis=1)
        sh, sl = df.df_add_sloppy(vh, vl, vhz, vlz)
        keep = f > 0
        vh = jnp.where(keep, vh, sh)
        vl = jnp.where(keep, vl, sl)
        f = jnp.maximum(f, fz)
        d *= 2
    vh, vl = df.df_renorm(vh, vl)
    outh_ref[:] = vh
    outl_ref[:] = vl


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def block_gather_scan(tile_block_ids: jax.Array, col: jax.Array, val: jax.Array,
                      heads: jax.Array, x_table: jax.Array) -> jax.Array:
    """Scanned products of a block-ordered stream.

    tile_block_ids: (H/8,) int32 — 128-column x block per (8, W) tile.
    col:            (H, W) int32 global columns (within the tile's block).
    val:            (H, W) values.
    heads:          (H, W) int32, 1 at run starts.
    x_table:        (B, 128) — x padded and reshaped to 128-lane rows.
    """
    h, w = col.shape
    grid = (cdiv(h, BLOCK_ROWS),)
    spec = lambda: pl.BlockSpec((BLOCK_ROWS, w), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    # scoped x64-off: under global x64 (f64 harness runs) jnp index ops in
    # the kernel trace pick int64, which Mosaic cannot lower; every operand
    # here is 32-bit
    with jax.enable_x64(False):
        return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec(), spec(), spec(),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=spec(),
        ),
        interpret=_use_interpret(),
    )(tile_block_ids, col, val, heads, x_table)


@jax.jit
def block_gather_scan_df(tile_block_ids, col, val_hi, val_lo, heads,
                         x_hi, x_lo):
    """df64 scanned products: (hi, lo) f32 planes with ~2⁻⁴⁸ rel precision.

    Arguments mirror block_gather_scan; values and the x table arrive as
    double-float (hi, lo) f32 pairs (ops.df64.df_from_f64 / df_split_device).
    Returns (scanned_hi, scanned_lo).
    """
    h, w = col.shape
    grid = (cdiv(h, BLOCK_ROWS),)
    spec = lambda: pl.BlockSpec((BLOCK_ROWS, w), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((h, w), jnp.float32)
    # scoped x64-off: under global x64 (f64 harness runs) jnp index ops in
    # the kernel trace pick int64, which Mosaic cannot lower; every operand
    # here is 32-bit
    with jax.enable_x64(False):
        return pl.pallas_call(
        _df_kernel,
        out_shape=(shape, shape),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec(), spec(), spec(), spec(),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(spec(), spec()),
        ),
        interpret=_use_interpret(),
    )(tile_block_ids, col, val_hi, val_lo, heads, x_hi, x_lo)
