"""Two-phase bucketed SpMV kernels — the scatter-free path for scattered matrices.

Problem: on TPU both XLA gather and scatter run ~0.14 G elements/s, and for
scattered matrices (power-law / random — the reference's own worst case,
random-512 at 0.1 GFLOPS on CPU, BASELINE.md) nearly every nonzero is its own
row-run, so any segment-sum combine is scatter-bound.  This design removes every
dynamic indexed op except the fast 128-lane ``take_along_axis``:

- The nnz space is bucketed by (row unit = row // row_group, col-block
  cb = col // 128) into a dense (CB, NU, S) slot grid (S = padded bucket depth),
  cb-major, slots row-local-sorted within each bucket.  Buckets that outgrow S
  spill into *ghost columns* — appended col-blocks whose x rows duplicate the
  original cb's — so overflow rides the same two kernels (no side path).
- **Stage A** (grid over (8, W) stream tiles, per-sublane-row col-block ids
  scalar-prefetched): lane-gathers x and writes val·x products linearly — no
  scatter, the layout IS the destination.
- **Stage B**: per row-unit slab, an *MXU prefix sum* (v @ upper-triangular
  ones — the measured Hillis–Steele lane scan runs only 2-7 G elem/s, the MXU
  does this at matmul rate) gives P; run totals are P[end] − P[head−1] via two
  lane-gathers (per-slot ``hm1`` = lane of run head − 1); K static masked
  lane-gather passes route each run total to its row bin; a sublane reduction
  yields the unit's row sums.  The combine never scatters.
  Grouped mode (row_group=1024) reads the cb-major product grid directly
  through a strided (CB, 1, S) BlockSpec — the round-1 XLA relayout pass
  (measured 600 us on g7jac200sc, 10x stage A) is gone.

Everything data-dependent is precomputed on the host at convert time; the
kernels see only static index arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import cdiv

LANES = 128
W_A = 1024           # stage-A tile width (microbench: lane-gather 64 G elem/s
                     # at w=1024 vs 12.9 at w=128 — per-op overhead dominates)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------- stage A ---

def _member_rows(mem_ref, x_ref, t, units, per, g, j, m):
    """(g, 128) x rows for member pass j: one dynamic x slice per member
    unit, each broadcast over its ``per`` 128-slot chunks."""
    rows = [x_ref[pl.ds(mem_ref[(t * units + u) * m + j], 1), :]
            for u in range(units)]
    xb = jnp.concatenate(rows, axis=0) if units > 1 else rows[0]
    if per > 1:
        xb = jnp.broadcast_to(xb[:, None, :],
                              (units, per, LANES)).reshape(g, LANES)
    return xb


def _mul_kernel(mem_ref, lane_ref, val_ref, x_ref, out_ref, *, gran: int):
    t = pl.program_id(0)
    w = lane_ref.shape[1]
    g = 8 * w // LANES
    units = 8 * w // gran
    per = g // units
    xb = _member_rows(mem_ref, x_ref, t, units, per, g, 0, 1)
    lanes = lane_ref[:].astype(jnp.int32).reshape(g, LANES)
    gathered = jnp.take_along_axis(xb, lanes, axis=1)
    out_ref[:] = (val_ref[:].reshape(g, LANES) * gathered).reshape(8, w)


def _mul_kernel_m(mem_ref, lane_ref, src_ref, val_ref, x_ref, out_ref, *,
                  m: int, gran: int):
    t = pl.program_id(0)
    w = lane_ref.shape[1]
    g = 8 * w // LANES
    units = 8 * w // gran
    per = g // units
    lanes = lane_ref[:].astype(jnp.int32).reshape(g, LANES)
    src = src_ref[:].astype(jnp.int32).reshape(g, LANES)
    gathered = jnp.zeros((g, LANES), val_ref.dtype)
    for j in range(m):
        xb = _member_rows(mem_ref, x_ref, t, units, per, g, j, m)
        gj = jnp.take_along_axis(xb, lanes, axis=1)
        gathered = jnp.where(src == j, gj, gathered)
    out_ref[:] = (val_ref[:].reshape(g, LANES) * gathered).reshape(8, w)


def block_gather_mul(members, lane, src, val, x_table, m: int = 1,
                     gran: int | None = None):
    """products[i] = val[i] · x[member·128 + lane[i]] over a group-major (H, W)
    stream.

    Buckets are (column-GROUP, row-unit): a group packs up to ``m`` col-blocks
    (bin-packed at convert so bucket fill stays near the 128-slot row size on
    hyper-sparse inputs); ``src`` picks each slot's member (m-way select of m
    wide lane-gathers — measured: wide takes ~60-200 G elem/s, so m takes on
    m-fold fewer slots beat 1 take on m-fold padding).

    members: (H·(8w/gran)·m,) int32 — m x-row ids per member unit of ``gran``
             slots (default gran = w: one unit per (1, w) stream row, the bkt
             layout; ellg passes gran=128 — per-sublane-row windows).
    lane:    (H, W) int8 in-block column; src: (H, W) int8 member index.
    """
    import functools

    h, w = lane.shape
    gran = w if gran is None else gran
    spec = lambda: pl.BlockSpec((8, w), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    if m == 1:
        return pl.pallas_call(
            functools.partial(_mul_kernel, gran=gran),
            out_shape=jax.ShapeDtypeStruct((h, w), val.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(cdiv(h, 8),),
                in_specs=[spec(), spec(),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=spec(),
            ),
            interpret=_use_interpret(),
        )(members, lane, val, x_table)
    return pl.pallas_call(
        functools.partial(_mul_kernel_m, m=m, gran=gran),
        out_shape=jax.ShapeDtypeStruct((h, w), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(h, 8),),
            in_specs=[spec(), spec(), spec(),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=spec(),
        ),
        interpret=_use_interpret(),
    )(members, lane, src, val, x_table)


# ----------------------------------------------------------------- stage B ---

def _mxu_prefix(v):
    """Row-wise inclusive prefix sum via one (·,128)@(128,128) MXU matmul.

    precision=HIGHEST: the TPU MXU's default single-pass f32 matmul truncates
    inputs to bf16 (measured: 2e-3 relative error — fails the 1e-6 oracle);
    the multi-pass mode recovers ~f32 accuracy.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    acc = jnp.float32 if v.dtype in (jnp.bfloat16, jnp.float16,
                                     jnp.float32) else v.dtype
    tri = (r <= c).astype(v.dtype)
    p = jnp.dot(v, tri, preferred_element_type=acc,
                precision=jax.lax.Precision.HIGHEST)
    return p.astype(v.dtype)


def _run_totals(v, hm1):
    """W[l] = P[l] − P[hm1[l]] — at a run's end lane this is the run total.
    hm1 = lane of the run's head − 1 (int8; −1 at row-start runs → subtract 0).
    """
    p = _mxu_prefix(v)
    h = hm1.astype(jnp.int32)
    ph = jnp.take_along_axis(p, jnp.maximum(h, 0), axis=1)
    return p - jnp.where(h >= 0, ph, jnp.zeros_like(ph))


def _reduce_kernel(prod_ref, hm1_ref, idx_ref, out_ref):
    """One (8·G, 128) block = 8 row-block slabs interleaved j-major (row r ↔
    sublane j = r//8 of slab s = r%8); emits the 8 slabs' (8, 128) row sums.
    idx: K stacked (8G, 128) int8 planes — idx[k][row, bin] = end lane of the
    k-th run with that bin in the row, or <0 masked."""
    rows = prod_ref.shape[0]
    k = idx_ref.shape[0] // rows

    w = _run_totals(prod_ref[:], hm1_ref[:])

    acc = jnp.zeros((rows, LANES), w.dtype)
    for kk in range(k):
        idx = idx_ref[kk * rows:(kk + 1) * rows, :].astype(jnp.int32)
        picked = jnp.take_along_axis(w, jnp.maximum(idx, 0), axis=1)
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


def bucket_reduce(products, hm1, idx, rb_pad: int):
    """Row-block reduction of the rb-major, j-interleaved product stream.

    products/hm1: (RB_pad·G, 128); block i covers rows [i·8G, (i+1)·8G).
    idx:          (K·RB_pad·G, 128) int8 — per block, K passes stacked
                  (block-major, K-minor).  idx < 0 ⇒ masked.
    Returns (RB_pad, 128) row sums.
    """
    rows, _ = products.shape
    g = rows // rb_pad
    blk = 8 * g
    k = idx.shape[0] // rows

    def im(i, *_):
        return (i, 0)

    return pl.pallas_call(
        _reduce_kernel,
        out_shape=jax.ShapeDtypeStruct((rb_pad, LANES), products.dtype),
        grid=(cdiv(rb_pad, 8),),
        in_specs=[
            pl.BlockSpec((blk, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, LANES), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * blk, LANES), im, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), im, memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(products, hm1, idx)


# ----------------------------------------------- stage B, 1024-row groups ---

def _reduce_grouped_kernel(prod_ref, hm1_ref, idx_ref, out_ref):
    """One grid step = 8 row-unit slabs × one col-block chunk, read straight
    from the cb-major grid.  S = 128 exactly: a bucket IS a stream row and the
    slab's row index IS the col-block — prod_ref[:, i, :] is the slab chunk
    with no reshape (Mosaic cannot repack ragged (·, S) rows into lanes; the
    S=128 slice runs at 215 G elem/s, measured).  idx is K planes of (G, 128)
    int16 per slab with combined routing: entry = σ·128 + end_lane (σ = bin
    sublane 0..7), <0 masked.  Output accumulates over col-block chunks."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    k = idx_ref.shape[1]
    blocks = []
    for i in range(8):
        v = prod_ref[:, i, :]
        w = _run_totals(v, hm1_ref[i])
        outs = [jnp.zeros((1, LANES), w.dtype) for _ in range(8)]
        for kk in range(k):
            e = idx_ref[i, kk].astype(jnp.int32)
            valid = e >= 0
            lanes = jnp.where(valid, e, 0) & (LANES - 1)
            picked = jnp.take_along_axis(w, lanes, axis=1)
            sig = e >> 7
            for sigma in range(8):
                m = valid & (sig == sigma)
                outs[sigma] = outs[sigma] + jnp.sum(
                    jnp.where(m, picked, 0.0), axis=0, keepdims=True)
        blocks.append(jnp.concatenate(outs, axis=0))
    out_ref[:] += jnp.concatenate(blocks, axis=0)


def bucket_reduce_grouped(prod_grid, hm1, idx, nu_pad: int, n_chunks: int = 1):
    """Row-unit reduction over the cb-major (CB, NU_pad, 128) product grid.

    prod_grid: (CB, NU_pad, 128) — stage-A output viewed 3-D; each grid step
               DMAs the strided block [j·CB/n : (j+1)·CB/n, 8i:8i+8, :].
    hm1:       (NU_pad, CB, 128) int8 — slab-major; row index = col-block.
    idx:       (NU_pad, K, CB, 128) int16 — entry σ·128 + end_lane, <0 masked.
    n_chunks:  col-block chunking (VMEM bound); CB % n_chunks == 0.
    Returns (NU_pad·8, 128) sums: row u·8+σ = unit u's rows σ·128..σ·128+127.
    """
    cb, nu, _ = prod_grid.shape
    k = idx.shape[1]
    ch = cb // n_chunks

    return pl.pallas_call(
        _reduce_grouped_kernel,
        out_shape=jax.ShapeDtypeStruct((nu_pad * 8, LANES), prod_grid.dtype),
        grid=(nu_pad // 8, n_chunks),
        in_specs=[
            pl.BlockSpec((ch, 8, LANES), lambda u, j: (j, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ch, LANES), lambda u, j: (u, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k, ch, LANES), lambda u, j: (u, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((64, LANES), lambda u, j: (u, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(prod_grid, hm1, idx)


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
