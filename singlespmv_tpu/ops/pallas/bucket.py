"""Two-phase bucketed SpMV kernels — the scatter-free path for scattered matrices.

Problem: on TPU both XLA gather and scatter run ~0.14 G elements/s, and for
scattered matrices (power-law / random — the reference's own worst case,
random-512 at 0.1 GFLOPS on CPU, BASELINE.md) nearly every nonzero is its own
row-run, so any segment-sum combine is scatter-bound.  This design removes every
dynamic indexed op except the fast 128-lane ``take_along_axis``:

- The nnz space is bucketed by (row-block rb = row//128, col-block cb = col//128)
  into a dense (CB, RB, S) slot grid (S = padded bucket depth), laid out cb-major,
  slots lo-sorted (lo = row % 128) within each bucket.
- **Stage A** (grid over stream tiles, one cb each): lane-gathers x and writes
  val·x products linearly — no scatter, the layout IS the destination.
- One XLA transpose re-views the grid rb-major (bandwidth-bound, no gather), with
  8 row-block slabs interleaved j-major per kernel block.
- **Stage B** (grid over groups of 8 rb): per sublane, a segmented inclusive
  lane-scan of the products, then K static ``take_along_axis`` passes (indices < 0
  mean masked) pick each (sublane, row-bin) run total; a log-tree add over the G
  sublanes of each slab yields the 128 row sums.  The combine never scatters.

Everything data-dependent is precomputed on the host at convert time; the kernels
see only static index arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import cdiv

LANES = 128
TILE = 8 * LANES     # stage-A tile elements


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------- stage A ---

def _mul_kernel(cbs_ref, lane_ref, val_ref, x_ref, out_ref):
    tile = pl.program_id(0)
    w = lane_ref.shape[1]
    g = 8 * w // LANES
    cb = cbs_ref[tile]
    xrow = x_ref[pl.ds(cb, 1), :]
    xb = jnp.broadcast_to(xrow, (g, LANES))
    lanes = lane_ref[:].astype(jnp.int32).reshape(g, LANES)
    gathered = jnp.take_along_axis(xb, lanes, axis=1)
    out_ref[:] = (val_ref[:].reshape(g, LANES) * gathered).reshape(8, w)


def block_gather_mul(tile_cbs, lane, val, x_table):
    """products[i] = val[i] · x[cb·128 + lane[i]] over a cb-major (H, 128)
    stream; ``lane`` is the in-block column (int8 — 4x less index traffic
    than absolute int32 columns)."""
    h, w = lane.shape
    spec = lambda: pl.BlockSpec((8, w), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(h, 8),),
            in_specs=[spec(), spec(), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=spec(),
        ),
        interpret=_use_interpret(),
    )(tile_cbs, lane, val, x_table)


# ----------------------------------------------------------------- stage B ---

def _seg_scan(v, f, max_run: int):
    """Segmented Hillis–Steele inclusive lane scan, truncated at the longest
    run: after step d coverage is 2d, so ``while d < max_run`` suffices —
    shallow buckets (hyper-sparse inputs) skip most of the log2(128) steps."""
    d = 1
    while d < min(max_run, LANES):
        vz = jnp.concatenate([jnp.zeros_like(v[:, :d]), v[:, :-d]], axis=1)
        fz = jnp.concatenate([jnp.ones_like(f[:, :d]), f[:, :-d]], axis=1)
        v = jnp.where(f > 0, v, v + vz)
        f = jnp.maximum(f, fz)
        d *= 2
    return v


def _reduce_kernel(prod_ref, heads_ref, idx_ref, out_ref, *, max_run: int):
    """One (8·G, 128) block = 8 rb slabs interleaved j-major (row r ↔ sublane
    j = r//8 of slab s = r%8); emits the 8 slabs' (8, 128) row sums."""
    rows = prod_ref.shape[0]
    k = idx_ref.shape[0] // rows

    # heads stored int8 (traffic); widen before compare — Mosaic has no i8 cmpi
    v = _seg_scan(prod_ref[:], heads_ref[:].astype(jnp.int32), max_run)

    acc = jnp.zeros((rows, LANES), v.dtype)
    for kk in range(k):
        idx = idx_ref[kk * rows:(kk + 1) * rows, :].astype(jnp.int32)
        picked = jnp.take_along_axis(v, jnp.maximum(idx, 0), axis=1)
        acc = acc + jnp.where(idx >= 0, picked, 0.0)  # idx < 0 ⇒ masked slot

    # j-major interleave ⇒ slab s's sublanes live at rows ≡ s (mod 8):
    # halving adds over the leading axis stay slab-aligned.
    cur = acc
    n = rows
    while n > 8:
        half8 = (n // 16) * 8          # largest multiple of 8 ≤ n/2
        top = cur[:half8, :] + cur[half8: 2 * half8, :]
        rest = cur[2 * half8:, :]
        cur = jnp.concatenate([top, rest], axis=0) if rest.shape[0] else top
        n = cur.shape[0]
    out_ref[:] = cur


def bucket_reduce(products, heads, idx, rb_pad: int, max_run: int = LANES):
    """Row-block reduction of the rb-major, j-interleaved product stream.

    products/heads: (RB_pad·G, 128); block i covers rows [i·8G, (i+1)·8G).
    idx:            (K·RB_pad·G, 128) — per block, K passes stacked (block-major,
                    K-minor): block i's pass k occupies rows
                    [(i·K + k)·8G, (i·K + k + 1)·8G).  idx < 0 ⇒ masked.
    Returns (RB_pad, 128) row sums.
    """
    import functools

    rows, _ = products.shape
    g = rows // rb_pad
    blk = 8 * g
    k = idx.shape[0] // rows

    def im(i, *_):
        return (i, 0)

    return pl.pallas_call(
        functools.partial(_reduce_kernel, max_run=max_run),
        out_shape=jax.ShapeDtypeStruct((rb_pad, LANES), products.dtype),
        grid=(cdiv(rb_pad, 8),),
        in_specs=[
            pl.BlockSpec((blk, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * blk, LANES), im, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), im, memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(products, heads, idx)


# ------------------------------------------------------- lane unpermute ------

def _unperm_kernel(yt_ref, src_lane_ref, src_chunk_ref, out_ref):
    """out[:, c·128+j] = yt[:, src_chunk·128 + src_lane] — static routing of the
    balance permutation's inverse, chunked so every move is a lane gather."""
    k = yt_ref.shape[1] // LANES
    for c in range(k):
        acc = jnp.zeros((LANES, LANES), yt_ref.dtype)
        lane = src_lane_ref[:, c * LANES:(c + 1) * LANES]
        chunk = src_chunk_ref[:, c * LANES:(c + 1) * LANES]
        for cp in range(k):
            picked = jnp.take_along_axis(
                yt_ref[:, cp * LANES:(cp + 1) * LANES], lane, axis=1)
            acc = acc + jnp.where(chunk == cp, picked, 0.0)
        out_ref[:, c * LANES:(c + 1) * LANES] = acc


def lane_unpermute(y_t, src_lane, src_chunk):
    """Apply a static per-row permutation along a (128, RB_pad) array's columns.

    src_lane/src_chunk: (128, RB_pad) int32 — source column = chunk·128 + lane.
    """
    return pl.pallas_call(
        _unperm_kernel,
        out_shape=jax.ShapeDtypeStruct(y_t.shape, y_t.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(y_t, src_lane, src_chunk)


# ----------------------------------------------- stage B, 1024-row groups ---

def _reduce_grouped_kernel(prod_ref, heads_ref, idx_ref, out_ref, *,
                           max_run: int):
    """One slab = a 1024-row group: (G, 128) products → (8, 128) row sums.

    idx holds K×8 planes of (G, 128) per slab, (k, σ)-major: pass (k, σ) routes
    runs with bin = σ·128 + lane.  Fewer, deeper buckets than the 128-row mode
    (8× fewer grid cells) — the hyper-sparse remedy."""
    g = prod_ref.shape[0]
    k8 = idx_ref.shape[0] // g           # K * 8

    # heads stored int8 (traffic); widen before compare — Mosaic has no i8 cmpi
    v = _seg_scan(prod_ref[:], heads_ref[:].astype(jnp.int32), max_run)

    rows_out = []
    for sigma in range(8):
        acc = jnp.zeros((g, LANES), v.dtype)
        for kk in range(k8 // 8):
            plane = (kk * 8 + sigma)
            idx = idx_ref[plane * g:(plane + 1) * g, :].astype(jnp.int32)
            picked = jnp.take_along_axis(v, jnp.maximum(idx, 0), axis=1)
            acc = acc + jnp.where(idx >= 0, picked, 0.0)
        cur = acc
        n = g
        while n > 1:
            half = n // 2
            top = cur[:half, :] + cur[half: 2 * half, :]
            rest = cur[2 * half:, :]
            cur = jnp.concatenate([top, rest], axis=0) if rest.shape[0] else top
            n = cur.shape[0]
        rows_out.append(cur)
    out_ref[:] = jnp.concatenate(rows_out, axis=0)


def bucket_reduce_grouped(products, heads, idx, rbg_pad: int,
                          max_run: int = LANES):
    """Row-group reduction: slabs of (G, 128) → (RBG_pad·8, 128) row sums.

    products/heads: (RBG_pad·G, 128), slab i at rows [i·G, (i+1)·G).
    idx: (K·8·RBG_pad·G, 128) — slab-major, (k, σ)-minor planes of (G, 128).
    """
    import functools

    rows, _ = products.shape
    g = rows // rbg_pad
    k8 = idx.shape[0] // rows

    def im(i, *_):
        return (i, 0)

    return pl.pallas_call(
        functools.partial(_reduce_grouped_kernel, max_run=max_run),
        out_shape=jax.ShapeDtypeStruct((rbg_pad * 8, LANES), products.dtype),
        grid=(rbg_pad,),
        in_specs=[
            pl.BlockSpec((g, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((k8 * g, LANES), im, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), im, memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(products, heads, idx)
