"""XCH kernels — the two fill-perfect passes of the exchange engine.

Pass 1 (``xch_mul``): stream (chunk, col)-sorted slots; per stream row, copy
an m1-block window of the VMEM-resident x table, 128-lane gather + one-hot
select, multiply by val, write the (T1, 128) product tile linearly.  This is
slab's ``_gather_mul`` with the routing deleted — col-sorted order makes the
windows slide monotonically at fill ≈ 1 on any structure.

Pass 2 (``xch_route``): stream (bucket, col)-sorted slots; the "x table" is
now the source chunk's PRODUCT block — (1, P1, 128) selected per step by the
prefetched chunk id, so each chunk's products are DMA'd into VMEM once and
every bucket window-gathers from VMEM.  Slots arrive laid out run-contiguous
per stream row (convert chooses the order; the gather is index-addressed so
any order is free), runs reduce with the MXU prefix trick, σ-planes route to
the bucket's (planes, 128) block.

See formats/xch.py for the layout contract and the CSR5 lineage
(/root/reference/opt/Benchmark_SpMV_using_CSR5/CSR5_avx2/detail/avx2/
csr5_spmv_avx2.h — nnz-space tiles with unconstrained rows per tile).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .slab import _gather_mul, _run_totals, _use_interpret, _vmem_params

LANES = 128


def _vmem_params_bytes(resident_bytes, step_bytes, out_bytes):
    need = resident_bytes + 3 * step_bytes + out_bytes + (6 << 20)
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(min(max(need, 32 << 20), 110 << 20)))


def _xch_mul_kernel(win_ref, lane_ref, sub_ref, val_ref, x_ref, out_ref,
                    *, m: int):
    t = pl.program_id(0)
    out_ref[:] = _gather_mul(win_ref, lane_ref, sub_ref, val_ref, x_ref,
                             t, m=m)


def xch_mul(win, lane, sub, val, x_table, m: int, T: int = 64):
    """Pass-1: products (H, 128) = val * x[window-gather], written linearly.

    win:     (H,) int32 prefetched — x window base col-block per stream row.
    lane/sub:(H, 128) int8; val: (H, 128) values.
    x_table: (CB, 128) values, VMEM-resident for the whole pass.
    """
    h = lane.shape[0]
    n_steps = h // T
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_xch_mul_kernel, m=m),
        out_shape=jax.ShapeDtypeStruct((h, LANES), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                spec8(), spec8(), spec8(),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem_params(
            x_table, T * LANES * (2 + 2 * val.dtype.itemsize), 0),
        interpret=_use_interpret(),
    )(win, lane, sub, val, x_table)


def _xch_route4_kernel(gids_ref, off_ref, cs_ref, win_ref, lane_ref, sub_ref,
                       hm_ref, sig_ref, idx_ref, prod_ref, out_ref,
                       *, m: int, msel: int, kblk: int, p_oh: int):
    """v4 blk-granular route (r5).

    The v3 kernel streamed ``span·planes`` σ-plane end-lane arrays per step
    and ran a masked VPU pick+reduce per plane — `planes` bytes/slot of idx
    traffic and ~0.008 ns/slot/plane of compute, the measured route bound on
    every giant.  v4 stores the routing at BLOCK granularity instead:

      - sig[r] (lane-replicated int8) = stream row r's first target 128-row
        block, relative to the step's base block (prefetched off[t]);
      - idx[j] = end-lanes of runs targeting the row's (sig+j)-th block —
        rows inside one 128-row block are lane-distinct, so ``kblk`` planes
        suffice where kblk = max block span of a stream row's runs (the
        convert's R-band rebalance makes kblk ≈ m2-sized, not scope-sized);
      - per j: one pick repositions run totals to target lanes, and a
        (p_oh, T) one-hot built from sig routes rows to output blocks on
        the MXU (slab's blk trick, ops/pallas/slab.py:140-181);
      - the (p_oh, 128) step contribution accumulates at dynamic sublane
        offset off[t] in a large revisited out block (out-block switches
        cost ~µs; the out block now covers ~10⁵ rows, not one bucket).

    ``msel`` can in principle decouple the SELECT width from the 8-aligned
    SLICE width m, but the r5 probe measured the msel<m static sub-slice
    2× SLOWER (Mosaic relayouts the strided view) — callers pass msel == m
    and planners should simply prefer m = 8.
    """
    t = pl.program_id(0)

    first = jnp.logical_or(
        t == 0, gids_ref[jnp.maximum(t, 1)] != gids_ref[jnp.maximum(t, 1) - 1])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    T = lane_ref.shape[0]
    wins = [prod_ref[0, pl.ds(win_ref[t * T + r], m), :] for r in range(T)]
    ws = jnp.concatenate(wins, axis=0) if T > 1 else wins[0]   # (T·m, 128)
    lane = lane_ref[:].astype(jnp.int32)
    if msel == 1:
        w1 = ws.reshape(T, m, LANES)[:, 0, :] if m > 1 else ws
        g = jnp.take_along_axis(w1, lane, axis=1)
    else:
        if msel < m:
            ws = ws.reshape(T, m, LANES)[:, :msel, :].reshape(T * msel, LANES)
        lane_m = jnp.broadcast_to(lane[:, None, :], (T, msel, LANES)
                                  ).reshape(T * msel, LANES)
        tk = jnp.take_along_axis(ws, lane_m, axis=1).reshape(T, msel, LANES)
        sub = sub_ref[:].astype(jnp.int32)
        srow = jax.lax.broadcasted_iota(jnp.int32, (T, msel, LANES), 1)
        g = jnp.sum(jnp.where(srow == sub[:, None, :], tk, 0.0), axis=1)

    w = _run_totals(g, hm_ref[:])

    sig = sig_ref[:, :p_oh].astype(jnp.int32)               # (T, p_oh)
    iot = jax.lax.broadcasted_iota(jnp.int32, (T, p_oh), 1)
    acc_t = jnp.float32 if w.dtype in (jnp.bfloat16, jnp.float16,
                                       jnp.float32) else w.dtype
    acc = None
    for j in range(kblk):
        e = idx_ref[j].astype(jnp.int32)                    # (T, 128)
        valid = e >= 0
        picked = jnp.take_along_axis(w, jnp.where(valid, e, 0), axis=1)
        masked = jnp.where(valid, picked, 0.0)
        oh = (sig + j == iot).astype(w.dtype)               # (T, p_oh)
        c = jnp.dot(oh.T, masked, preferred_element_type=acc_t,
                    precision=jax.lax.Precision.HIGHEST).astype(w.dtype)
        acc = c if acc is None else acc + c
    out_ref[pl.ds(off_ref[t], p_oh), :] += acc


def xch_route4(gids, off, cs, win, lane, sub, hm1, sig, idx, prod3,
               n_grp: int, gb: int, m: int, msel: int, T: int = 64,
               p_oh: int = 16):
    """Run the v4 route: returns (n_grp·gb, 128) — out row g·gb+i holds the
    i-th 128-row block of output group g (compact blocks; host maps back).

    gids: (n_steps,) int32 prefetched — output group per step, non-decr.
    off:  (n_steps,) int32 prefetched — step's base block − gids[t]·gb,
          with off + p_oh ≤ gb (convert pads at group boundaries).
    cs:   (n_steps,) int32 prefetched — source chunk per step.
    win:  (H,) int32 prefetched — chunk-local product-row window base.
    lane/sub/hm1/sig: (H, 128) int8.  idx: (kblk, H, 128) int8.
    prod3: (n_chunks, P1, 128) pass-1 products.
    """
    h = lane.shape[0]
    n_steps = h // T
    p1 = prod3.shape[1]
    kblk = idx.shape[0]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_xch_route4_kernel, m=m, msel=msel, kblk=kblk,
                          p_oh=p_oh),
        out_shape=jax.ShapeDtypeStruct((n_grp * gb, LANES), prod3.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_steps,),
            in_specs=[
                spec8(), spec8(), spec8(), spec8(),
                pl.BlockSpec((kblk, T, LANES), lambda t, *_: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p1, LANES),
                             lambda t, g, o, c, w: (c[t], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gb, LANES), lambda t, g, o, c, w: (g[t], 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem_params_bytes(
            2 * p1 * LANES * prod3.dtype.itemsize,
            T * LANES * (4 + kblk),
            gb * LANES * prod3.dtype.itemsize * 2),
        interpret=_use_interpret(),
    )(gids, off, cs, win, lane, sub, hm1, sig, idx, prod3)


def _xch_route_kernel(uids_ref, gids_ref, cs_ref, sg0_ref, sg1_ref, win_ref,
                      lane_ref, sub_ref, hm_ref, idx_ref, prod_ref, out_ref,
                      *, m: int, planes: int, g_grp: int, pg: int):
    """The out block covers ``g_grp`` consecutive compact buckets; a step
    accumulates its (planes, 128) contribution at a dynamic sublane offset.
    Per-out-block pipeline flushes cost ~4-7 us on v5e (measured r4: ASIC's
    333 buckets at ~1.5 steps each ran 6x slower than the microbench, which
    had 8 steps per bucket) — grouping divides the flush count by g_grp.

    σ-plane pruning: rows are sorted within a step, so the step's active
    planes form the contiguous range [sg0[t], sg1[t]] (inclusive; empty when
    sg1 < sg0).  Planes are processed in groups of ``pg``; a group outside
    the range skips its gather+mask+reduce entirely (pl.when on prefetched
    scalars).  This removes the span-2 hi-half waste (~2x on the giants:
    non-straddling steps never touch planes ≥ planes/2) and prunes skewed
    σ distributions on long-run structures."""
    t = pl.program_id(0)

    first = jnp.logical_or(
        t == 0, gids_ref[jnp.maximum(t, 1)] != gids_ref[jnp.maximum(t, 1) - 1])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    T = lane_ref.shape[0]
    # window-gather the products (prod_ref block = this step's source chunk)
    wins = [prod_ref[0, pl.ds(win_ref[t * T + r], m), :] for r in range(T)]
    ws = jnp.concatenate(wins, axis=0) if T > 1 else wins[0]
    lane = lane_ref[:].astype(jnp.int32)
    if m == 1:
        g = jnp.take_along_axis(ws, lane, axis=1)
    else:
        lane_m = jnp.broadcast_to(lane[:, None, :], (T, m, LANES)
                                  ).reshape(T * m, LANES)
        tk = jnp.take_along_axis(ws, lane_m, axis=1).reshape(T, m, LANES)
        sub = sub_ref[:].astype(jnp.int32)
        srow = jax.lax.broadcasted_iota(jnp.int32, (T, m, LANES), 1)
        g = jnp.sum(jnp.where(srow == sub[:, None, :], tk, 0.0), axis=1)

    w = _run_totals(g, hm_ref[:])

    off = (uids_ref[t] - gids_ref[t] * g_grp) * planes

    def _plane_block(g0, n_p):
        outs = []
        for sigma in range(g0, g0 + n_p):
            e = idx_ref[sigma].astype(jnp.int32)
            valid = e >= 0
            picked = jnp.take_along_axis(w, jnp.where(valid, e, 0), axis=1)
            outs.append(jnp.sum(jnp.where(valid, picked, 0.0), axis=0,
                                keepdims=True))
        return jnp.concatenate(outs, axis=0) if n_p > 1 else outs[0]

    for g0 in range(0, planes, pg):
        n_p = min(pg, planes - g0)

        @pl.when(jnp.logical_and(sg0_ref[t] < g0 + n_p, sg1_ref[t] >= g0))
        def _(g0=g0, n_p=n_p):
            out_ref[pl.ds(off + g0, n_p), :] += _plane_block(g0, n_p)


def xch_route(uids, gids, cs, sg0, sg1, win, lane, sub, hm1, idx, prod3,
              ngb: int, m: int, planes: int, T: int = 32, g_grp: int = 16,
              pg: int = 8):
    """Pass-2: gather products through sliding windows, reduce runs, σ-route.

    uids:  (n_steps,) int32 prefetched — call-local compact bucket per step,
           non-decreasing.
    gids:  (n_steps,) int32 prefetched — call-local bucket G-group per step
           (uids // g_grp); the out block covers one G-group.
    cs:    (n_steps,) int32 prefetched — source chunk per step.
    sg0/sg1: (n_steps,) int32 prefetched — first/last (inclusive) active
           σ plane per step; sg1 < sg0 means the step routes nothing.
    win:   (H,) int32 prefetched — chunk-local product-row window base.
    lane/sub/hm1: (H, 128) int8.  idx: (planes, H, 128) int8 σ-plane
           end-lanes, −1 masked.
    prod3: (n_chunks, P1, 128) values — pass-1 products; block (1, P1, 128)
           selected by cs[t] (re-DMA'd only when the chunk changes).
    Returns (ngb·g_grp·planes, 128).
    """
    h = lane.shape[0]
    n_steps = h // T
    p1 = prod3.shape[1]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_xch_route_kernel, m=m, planes=planes,
                          g_grp=g_grp, pg=pg),
        out_shape=jax.ShapeDtypeStruct((ngb * g_grp * planes, LANES),
                                       prod3.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(n_steps,),
            in_specs=[
                spec8(), spec8(), spec8(),
                pl.BlockSpec((planes, T, LANES), lambda t, *_: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p1, LANES),
                             lambda t, u, g, c, s0, s1, w: (c[t], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g_grp * planes, LANES),
                                   lambda t, u, g, c, s0, s1, w: (g[t], 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem_params_bytes(
            2 * p1 * LANES * prod3.dtype.itemsize,     # 2 chunk blocks live
            T * LANES * (3 + planes),
            g_grp * planes * LANES * prod3.dtype.itemsize * 2),
        interpret=_use_interpret(),
    )(uids, gids, cs, sg0, sg1, win, lane, sub, hm1, idx, prod3)


# ------------------------------------------------------------- SpMM panel ---

def _xch_mul_panel_kernel(win_ref, lane_ref, sub_ref, val_ref, x_ref,
                          out_ref, *, m: int, B: int):
    """Panel pass-1: the index/value streams (win, lane, sub, val) are read
    ONCE for all B panel columns; per column only the window slice + gather
    + select + multiply repeat.  A vmap over xch_mul re-streams 10 B/slot
    per column — the streams are ~40% of the mul budget at m ≤ 8."""
    t = pl.program_id(0)
    T = lane_ref.shape[0]
    lane = lane_ref[:].astype(jnp.int32)
    sub = sub_ref[:].astype(jnp.int32) if m > 1 else None
    val = val_ref[:]
    for b in range(B):
        wins = [x_ref[b, pl.ds(win_ref[t * T + r], m), :] for r in range(T)]
        ws = jnp.concatenate(wins, axis=0) if T > 1 else wins[0]
        if m == 1:
            g = jnp.take_along_axis(ws, lane, axis=1)
        else:
            lane_m = jnp.broadcast_to(lane[:, None, :], (T, m, LANES)
                                      ).reshape(T * m, LANES)
            tk = jnp.take_along_axis(ws, lane_m, axis=1).reshape(T, m, LANES)
            srow = jax.lax.broadcasted_iota(jnp.int32, (T, m, LANES), 1)
            g = jnp.sum(jnp.where(srow == sub[:, None, :], tk, 0.0), axis=1)
        out_ref[b] = val * g


def xch_mul_panel(win, lane, sub, val, x_tables, m: int, T: int = 64):
    """x_tables: (B, CB, 128); returns (B, H, 128) products."""
    h = lane.shape[0]
    n_steps = h // T
    B = x_tables.shape[0]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_xch_mul_panel_kernel, m=m, B=B),
        out_shape=jax.ShapeDtypeStruct((B, h, LANES), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                spec8(), spec8(), spec8(),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, T, LANES), lambda t, *_: (0, t, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem_params(
            x_tables, T * LANES * (2 + 2 * B * val.dtype.itemsize), 0),
        interpret=_use_interpret(),
    )(win, lane, sub, val, x_tables)


def _xch_route4_panel_kernel(gids_ref, off_ref, cs_ref, win_ref, lane_ref,
                             sub_ref, hm_ref, sig_ref, idx_ref, prod_ref,
                             out_ref, *, m: int, kblk: int, p_oh: int,
                             B: int):
    """Panel pass-2: idx/sig/lane/sub/hm stream once for all B columns and
    the one-hot route batches into ONE (p_oh, T) @ (T, B·128) matmul per
    idx plane."""
    t = pl.program_id(0)

    first = jnp.logical_or(
        t == 0, gids_ref[jnp.maximum(t, 1)] != gids_ref[jnp.maximum(t, 1) - 1])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    T = lane_ref.shape[0]
    lane = lane_ref[:].astype(jnp.int32)
    sub = sub_ref[:].astype(jnp.int32) if m > 1 else None
    ws_b = []
    for b in range(B):
        wins = [prod_ref[b, 0, pl.ds(win_ref[t * T + r], m), :]
                for r in range(T)]
        ws_b.append(jnp.concatenate(wins, axis=0) if T > 1 else wins[0])
    w_cols = []
    for b in range(B):
        if m == 1:
            g = jnp.take_along_axis(ws_b[b], lane, axis=1)
        else:
            lane_m = jnp.broadcast_to(lane[:, None, :], (T, m, LANES)
                                      ).reshape(T * m, LANES)
            tk = jnp.take_along_axis(ws_b[b], lane_m,
                                     axis=1).reshape(T, m, LANES)
            srow = jax.lax.broadcasted_iota(jnp.int32, (T, m, LANES), 1)
            g = jnp.sum(jnp.where(srow == sub[:, None, :], tk, 0.0), axis=1)
        w_cols.append(_run_totals(g, hm_ref[:]))

    sig = sig_ref[:, :p_oh].astype(jnp.int32)
    iot = jax.lax.broadcasted_iota(jnp.int32, (T, p_oh), 1)
    acc_t = jnp.float32 if w_cols[0].dtype in (jnp.bfloat16, jnp.float16,
                                               jnp.float32) \
        else w_cols[0].dtype
    acc = None
    for j in range(kblk):
        e = idx_ref[j].astype(jnp.int32)
        valid = e >= 0
        ms = []
        for b in range(B):
            picked = jnp.take_along_axis(w_cols[b],
                                         jnp.where(valid, e, 0), axis=1)
            ms.append(jnp.where(valid, picked, 0.0))
        masked = jnp.concatenate(ms, axis=1)            # (T, B·128)
        oh = (sig + j == iot).astype(masked.dtype)
        c = jnp.dot(oh.T, masked, preferred_element_type=acc_t,
                    precision=jax.lax.Precision.HIGHEST).astype(masked.dtype)
        acc = c if acc is None else acc + c
    acc3 = acc.reshape(p_oh, B, LANES).transpose(1, 0, 2)
    out_ref[:, pl.ds(off_ref[t], p_oh), :] += acc3


def xch_route4_panel(gids, off, cs, win, lane, sub, hm1, sig, idx, prod3,
                     n_grp: int, gb: int, m: int, T: int = 64,
                     p_oh: int = 16):
    """prod3: (B, n_chunks, P1, 128); returns (B, n_grp·gb, 128)."""
    h = lane.shape[0]
    n_steps = h // T
    B, _, p1, _ = prod3.shape
    kblk = idx.shape[0]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_xch_route4_panel_kernel, m=m, kblk=kblk,
                          p_oh=p_oh, B=B),
        out_shape=jax.ShapeDtypeStruct((B, n_grp * gb, LANES), prod3.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_steps,),
            in_specs=[
                spec8(), spec8(), spec8(), spec8(),
                pl.BlockSpec((kblk, T, LANES), lambda t, *_: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1, p1, LANES),
                             lambda t, g, o, c, w: (0, c[t], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, gb, LANES),
                                   lambda t, g, o, c, w: (0, g[t], 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem_params_bytes(
            2 * B * p1 * LANES * prod3.dtype.itemsize,
            T * LANES * (4 + kblk + B),
            B * gb * LANES * prod3.dtype.itemsize * 2),
        interpret=_use_interpret(),
    )(gids, off, cs, win, lane, sub, hm1, sig, idx, prod3)


# ------------------------------------------------------------ df64 (f64) ---

def _xch_mul_df_kernel(win_ref, lane_ref, sub_ref, valh_ref, vall_ref,
                       xh_ref, xl_ref, outh_ref, outl_ref, *, m: int):
    """df64 pass-1: gather (hi, lo) x pairs through the window, Dekker
    product with (hi, lo) values — slab's df machinery on the exchange's
    fill-perfect stream (ops/pallas/slab.py:_slab_df_kernel)."""
    from ...ops import df64 as df

    t = pl.program_id(0)
    T = lane_ref.shape[0]
    winsh = [xh_ref[pl.ds(win_ref[t * T + r], m), :] for r in range(T)]
    winsl = [xl_ref[pl.ds(win_ref[t * T + r], m), :] for r in range(T)]
    wsh = jnp.concatenate(winsh, axis=0) if T > 1 else winsh[0]
    wsl = jnp.concatenate(winsl, axis=0) if T > 1 else winsl[0]
    lane = lane_ref[:].astype(jnp.int32)
    if m == 1:
        gh = jnp.take_along_axis(wsh, lane, axis=1)
        gl = jnp.take_along_axis(wsl, lane, axis=1)
    else:
        lane_m = jnp.broadcast_to(lane[:, None, :], (T, m, LANES)
                                  ).reshape(T * m, LANES)
        tkh = jnp.take_along_axis(wsh, lane_m, axis=1).reshape(T, m, LANES)
        tkl = jnp.take_along_axis(wsl, lane_m, axis=1).reshape(T, m, LANES)
        sub = sub_ref[:].astype(jnp.int32)
        srow = jax.lax.broadcasted_iota(jnp.int32, (T, m, LANES), 1)
        sel = srow == sub[:, None, :]
        gh = jnp.sum(jnp.where(sel, tkh, 0.0), axis=1)
        gl = jnp.sum(jnp.where(sel, tkl, 0.0), axis=1)
    ph, pl_ = df.df_mul(valh_ref[:], vall_ref[:], gh, gl)
    outh_ref[:] = ph
    outl_ref[:] = pl_


def xch_mul_df(win, lane, sub, val_hi, val_lo, xh_table, xl_table, m: int,
               T: int = 64):
    h = lane.shape[0]
    n_steps = h // T
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((h, LANES), jnp.float32)
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_xch_mul_df_kernel, m=m),
            out_shape=(shape, shape),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_steps,),
                in_specs=[
                    spec8(), spec8(), spec8(), spec8(),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                        memory_space=pltpu.VMEM)),
            ),
            compiler_params=_vmem_params(xh_table, T * LANES * 20, 0),
            interpret=_use_interpret(),
        )(win, lane, sub, val_hi, val_lo, xh_table, xl_table)


def _xch_route4_df_kernel(gids_ref, off_ref, cs_ref, win_ref, lane_ref,
                          sub_ref, hm_ref, sig_ref, idx_ref, prodh_ref,
                          prodl_ref, outh_ref, outl_ref, *, m: int,
                          kblk: int, p_oh: int):
    """df64 v4 route: the f32 kernel's one-hot MXU matmul would re-round
    every accumulation (f32 matmul accumulate ≈ 2⁻²⁴ per add — 13 orders
    above the df64 target), so the route runs per (idx plane, out row) as
    masked compensated log-trees over the step axis (slab's df
    _plane_block pattern).  ~6-8× the f32 route per slot — the same class
    of df64 penalty slab-df64 pays."""
    from ...ops import df64 as df
    from .slab import _df_prefix_runs

    t = pl.program_id(0)

    first = jnp.logical_or(
        t == 0, gids_ref[jnp.maximum(t, 1)] != gids_ref[jnp.maximum(t, 1) - 1])

    @pl.when(first)
    def _():
        outh_ref[:] = jnp.zeros_like(outh_ref)
        outl_ref[:] = jnp.zeros_like(outl_ref)

    T = lane_ref.shape[0]
    winsh = [prodh_ref[0, pl.ds(win_ref[t * T + r], m), :] for r in range(T)]
    winsl = [prodl_ref[0, pl.ds(win_ref[t * T + r], m), :] for r in range(T)]
    wsh = jnp.concatenate(winsh, axis=0) if T > 1 else winsh[0]
    wsl = jnp.concatenate(winsl, axis=0) if T > 1 else winsl[0]
    lane = lane_ref[:].astype(jnp.int32)
    if m == 1:
        gh = jnp.take_along_axis(wsh, lane, axis=1)
        gl = jnp.take_along_axis(wsl, lane, axis=1)
    else:
        lane_m = jnp.broadcast_to(lane[:, None, :], (T, m, LANES)
                                  ).reshape(T * m, LANES)
        tkh = jnp.take_along_axis(wsh, lane_m, axis=1).reshape(T, m, LANES)
        tkl = jnp.take_along_axis(wsl, lane_m, axis=1).reshape(T, m, LANES)
        sub = sub_ref[:].astype(jnp.int32)
        srow = jax.lax.broadcasted_iota(jnp.int32, (T, m, LANES), 1)
        sel = srow == sub[:, None, :]
        gh = jnp.sum(jnp.where(sel, tkh, 0.0), axis=1)
        gl = jnp.sum(jnp.where(sel, tkl, 0.0), axis=1)

    wh, wl = _df_prefix_runs(gh, gl, hm_ref[:])

    sig = sig_ref[:, :1].astype(jnp.int32)                    # (T, 1)
    for j in range(kblk):
        e = idx_ref[j].astype(jnp.int32)
        valid = e >= 0
        pick_h = jnp.take_along_axis(wh, jnp.where(valid, e, 0), axis=1)
        pick_l = jnp.take_along_axis(wl, jnp.where(valid, e, 0), axis=1)
        for p in range(p_oh):
            sel_p = jnp.logical_and(valid, sig + j == p)
            ah = jnp.where(sel_p, pick_h, 0.0)
            al = jnp.where(sel_p, pick_l, 0.0)
            d = 1
            while d < ah.shape[0]:
                zh = jnp.concatenate([ah[d:], jnp.zeros_like(ah[:d])],
                                     axis=0)
                zl = jnp.concatenate([al[d:], jnp.zeros_like(al[:d])],
                                     axis=0)
                ah, al = df.df_add_sloppy(ah, al, zh, zl)
                d *= 2
            oh = outh_ref[pl.ds(off_ref[t] + p, 1), :]
            ol = outl_ref[pl.ds(off_ref[t] + p, 1), :]
            nh, nl = df.df_add_sloppy(oh, ol, ah[:1], al[:1])
            outh_ref[pl.ds(off_ref[t] + p, 1), :] = nh
            outl_ref[pl.ds(off_ref[t] + p, 1), :] = nl


def xch_route4_df(gids, off, cs, win, lane, sub, hm1, sig, idx, prodh3,
                  prodl3, n_grp: int, gb: int, m: int, T: int = 64,
                  p_oh: int = 16):
    h = lane.shape[0]
    n_steps = h // T
    p1 = prodh3.shape[1]
    kblk = idx.shape[0]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n_grp * gb, LANES), jnp.float32)
    ospec = lambda: pl.BlockSpec((gb, LANES), lambda t, g, o, c, w: (g[t], 0),
                                 memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_xch_route4_df_kernel, m=m, kblk=kblk,
                              p_oh=p_oh),
            out_shape=(shape, shape),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(n_steps,),
                in_specs=[
                    spec8(), spec8(), spec8(), spec8(),
                    pl.BlockSpec((kblk, T, LANES), lambda t, *_: (0, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, p1, LANES),
                                 lambda t, g, o, c, w: (c[t], 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, p1, LANES),
                                 lambda t, g, o, c, w: (c[t], 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(ospec(), ospec()),
            ),
            compiler_params=_vmem_params_bytes(
                4 * p1 * LANES * 4, T * LANES * (4 + kblk),
                gb * LANES * 16),
            interpret=_use_interpret(),
        )(gids, off, cs, win, lane, sub, hm1, sig, idx, prodh3, prodl3)
