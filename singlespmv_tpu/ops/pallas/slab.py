"""Fused slab SpMV kernel — gather, multiply, run-reduce and route in one pass.

The round-1/2 bkt pipeline pays three structural taxes on scattered matrices:
the (CB, NU, S) bucket grid forces one padded depth S across every (col-block,
row-unit) bucket (measured PadFactor ~4 on the natural suite), the stage-A
product grid makes a full HBM round trip (8 B/slot write + strided re-read),
and the relayout between stages adds another pass.  This kernel removes all
three: nonzeros are packed into *ragged-free 128-slot stream rows* (pad only
the last row of a (unit, window) group), x lives VMEM-resident for the whole
pass, and gather + multiply + run-total + route happen in one grid step with
the (8, 128) output block revisited across a unit's consecutive steps.

Layout contract (built host-side in formats/slab.py):
  - stream row r: 128 slots, all columns inside ONE aligned window of ``m``
    col-blocks (base block = win_ref[r], window = cols [base·128, (base+m)·128));
    slots sorted by (row, col) so each y row is one contiguous run;
  - every stream row belongs to one row *unit* (1024 consecutive y rows); the
    output block of a grid step is a PAIR of stream-adjacent units (16, 128),
    so a step's T rows may straddle one unit boundary — the host inserts pad
    rows only when a step would span three units (rare: units narrower than
    T stream rows), then overlap-adds the halves (y[u] = hi(block u−1) +
    lo(block u));
  - sub[r, i] = slot's col-block inside the window (0..m-1), lane[r, i] = its
    column inside the block, hm1[r, i] = lane of the slot's run head − 1;
  - route plane σ (0..15): idx[σ, r, l] = end-lane of the run targeting y row
    (pair_first·1024 + σ·128 + l), σ ≥ 8 addressing the pair's second unit.
    (σ, l) ↔ row is bijective inside the pair and a stream row holds at most
    one run per row, so σ-planes NEVER collide — any row mix packs, including
    hyper-sparse units spanning the full 1024 rows per stream row.

Per-slot arithmetic: one 128-lane gather + m-way one-hot select (VPU), 128
MACs of MXU prefix (the run-total trick of ops/pallas/bucket.py), 8 routed
picks + masked sums.  Per-slot traffic: val + 3·int8 + 8·int8 = 15 B — the
kernel is compute-bound (measured ~8-10 G slot/s at T=64;
scripts/probe_slab.py).

Reference analog: none — this replaces CSR5's tile/descriptor machinery
(/root/reference/opt/Benchmark_SpMV_using_CSR5/CSR5_avx2/detail/avx2/
csr5_spmv_avx2.h:47-267) with a layout where the segmented reduction is a
static routing problem solved at convert time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem_params(x_table, step_bytes, out_bytes):
    """Raise Mosaic's scoped-VMEM cap to fit the resident x table.

    The default ~16 MB scoped limit kills any matrix whose x table exceeds it
    (r2: rajat31's 4.69 M cols = 18.8 MB -> JaxRuntimeError; the
    palette_w1024_cbx32k probe reproduces it).  v5e has 128 MB VMEM; leave
    headroom for Mosaic's own scratch."""
    need = x_table.nbytes + 3 * step_bytes + out_bytes + (6 << 20)
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(min(max(need, 32 << 20), 110 << 20)))


def _run_totals(v, hm1):
    """W[l] = P[l] − P[hm1[l]]: at a run's end lane this is the run total."""
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tri = (r <= c).astype(v.dtype)
    acc = jnp.float32 if v.dtype in (jnp.bfloat16, jnp.float16,
                                     jnp.float32) else v.dtype
    p = jnp.dot(v, tri, preferred_element_type=acc,
                precision=jax.lax.Precision.HIGHEST).astype(v.dtype)
    h = hm1.astype(jnp.int32)
    ph = jnp.take_along_axis(p, jnp.maximum(h, 0), axis=1)
    return p - jnp.where(h >= 0, ph, jnp.zeros_like(ph))


def _gather_mul(win_ref, lane_ref, sub_ref, val_ref, x_ref, t, *, m):
    """Window assembly + lane gather + m-way one-hot select + multiply."""
    T = lane_ref.shape[0]
    wins = [x_ref[pl.ds(win_ref[t * T + r], m), :] for r in range(T)]
    ws = jnp.concatenate(wins, axis=0) if T > 1 else wins[0]   # (T·m, 128)
    lane = lane_ref[:].astype(jnp.int32)                        # (T, 128)
    if m == 1:
        g = jnp.take_along_axis(ws, lane, axis=1)
    else:
        lane_m = jnp.broadcast_to(lane[:, None, :], (T, m, LANES)
                                  ).reshape(T * m, LANES)
        tk = jnp.take_along_axis(ws, lane_m, axis=1).reshape(T, m, LANES)
        sub = sub_ref[:].astype(jnp.int32)                      # (T, 128)
        srow = jax.lax.broadcasted_iota(jnp.int32, (T, m, LANES), 1)
        g = jnp.sum(jnp.where(srow == sub[:, None, :], tk, 0.0), axis=1)
    return val_ref[:] * g


def _slab_kernel(uids_ref, sg0_ref, sg1_ref, win_ref, lane_ref, sub_ref,
                 val_ref, hm1_ref, idx_ref, x_ref, out_ref, *, m: int,
                 planes: int, pg: int = 2):
    """σ-plane pruning (r4): slots are row-sorted within a step, so the
    active planes form the contiguous range [sg0[t], sg1[t]]; plane groups
    of ``pg`` outside it skip their gather+mask+reduce.  Dense-row mid
    matrices (raefsky3 class, ≥64 nnz/row) touch 1-3 of the 8/16 planes
    per step — the route was ~half their per-slot budget."""
    t = pl.program_id(0)

    first = jnp.logical_or(
        t == 0, uids_ref[jnp.maximum(t, 1)] != uids_ref[jnp.maximum(t, 1) - 1])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = _run_totals(_gather_mul(win_ref, lane_ref, sub_ref, val_ref, x_ref,
                                t, m=m), hm1_ref[:])

    def _plane_block(g0, n_p):
        outs = []
        for sigma in range(g0, g0 + n_p):
            e = idx_ref[sigma].astype(jnp.int32)                # (T, 128)
            valid = e >= 0
            picked = jnp.take_along_axis(w, jnp.where(valid, e, 0), axis=1)
            outs.append(jnp.sum(jnp.where(valid, picked, 0.0), axis=0,
                                keepdims=True))
        return jnp.concatenate(outs, axis=0) if n_p > 1 else outs[0]

    for g0 in range(0, planes, pg):
        n_p = min(pg, planes - g0)

        @pl.when(jnp.logical_and(sg0_ref[t] < g0 + n_p, sg1_ref[t] >= g0))
        def _(g0=g0, n_p=n_p):
            out_ref[g0:g0 + n_p, :] += _plane_block(g0, n_p)


def _slab_blk_kernel(uids_ref, win_ref, lane_ref, sub_ref, val_ref, hm1_ref,
                     idx_ref, sig_ref, x_ref, out_ref, *, m: int,
                     planes: int, kblk: int):
    """Block-granular route: every stream row targets one aligned GROUP of
    ``kblk`` consecutive 128-row blocks.  Plane j of idx holds the end-lanes
    of runs destined to the group's j-th block (rows inside a block are
    lane-distinct, so one plane per block suffices), and the per-row group
    offset σ·kblk routes each j through an MXU one-hot matmul
    (planes, T) @ (T, 128) instead of `planes` VPU masked reductions.

    kblk > 1 is the scattered/mid-locality unlock (r3): with kblk = 1 a
    stream row draws from a single (128-row × window) rectangle, whose fill
    collapses on anything but dense bands (stomach: pad 2.03 vs 1.27 for
    unit mode).  Widening the row scope to kblk·128 rows multiplies the
    rectangle's nnz by kblk at a route cost of only kblk picks + kblk tiny
    matmuls per step."""
    t = pl.program_id(0)
    T = lane_ref.shape[0]

    first = jnp.logical_or(
        t == 0, uids_ref[jnp.maximum(t, 1)] != uids_ref[jnp.maximum(t, 1) - 1])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = _run_totals(_gather_mul(win_ref, lane_ref, sub_ref, val_ref, x_ref,
                                t, m=m), hm1_ref[:])

    sig = sig_ref[:, :planes].astype(jnp.int32)                 # (T, planes)
    iot = jax.lax.broadcasted_iota(jnp.int32, (T, planes), 1)
    acc = jnp.float32 if w.dtype in (jnp.bfloat16, jnp.float16,
                                     jnp.float32) else w.dtype
    for j in range(kblk):
        e = idx_ref[j].astype(jnp.int32)                        # (T, 128)
        valid = e >= 0
        picked = jnp.take_along_axis(w, jnp.where(valid, e, 0), axis=1)
        masked = jnp.where(valid, picked, 0.0)
        oh = (sig + j == iot).astype(w.dtype)
        out_ref[:] += jnp.dot(oh.T, masked, preferred_element_type=acc,
                              precision=jax.lax.Precision.HIGHEST
                              ).astype(w.dtype)


def _slab_spmm_kernel(uids_ref, win_ref, lane_ref, sub_ref, val_ref, hm1_ref,
                      idx_ref, x_ref, out_ref, *, m: int, planes: int,
                      B: int):
    """Panel variant of _slab_kernel: the index/value streams (lane, sub,
    val, hm1, idx — ~15 B/slot) are read ONCE for all B panel columns, and
    the per-step fixed cost amortizes B× (a vmap re-streams everything per
    column).  The gather/route per column stays VPU work — the MXU panel
    path for block-structured matrices is formats/bsr.spmm."""
    t = pl.program_id(0)

    first = jnp.logical_or(
        t == 0, uids_ref[jnp.maximum(t, 1)] != uids_ref[jnp.maximum(t, 1) - 1])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    T = lane_ref.shape[0]
    lane = lane_ref[:].astype(jnp.int32)
    sub = sub_ref[:].astype(jnp.int32) if m > 1 else None
    acc = []
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
        w = _run_totals(val_ref[:] * g, hm1_ref[:])
        outs = []
        for sigma in range(planes):
            e = idx_ref[sigma].astype(jnp.int32)
            valid = e >= 0
            picked = jnp.take_along_axis(w, jnp.where(valid, e, 0), axis=1)
            outs.append(jnp.sum(jnp.where(valid, picked, 0.0), axis=0,
                                keepdims=True))
        acc.append(jnp.concatenate(outs, axis=0))
    out_ref[:] += jnp.concatenate(acc, axis=0)


def slab_spmm(uids, win, lane, sub, val, hm1, idx, x_panel, nu: int,
              m: int, T: int = 64):
    """Panel SpMM for the unit-mode slab layout.

    x_panel: (B, CB, 128); returns (nu·B·planes, 128) — block u rows
    [b·planes, (b+1)·planes) hold column b's σ-planes."""
    h = lane.shape[0]
    n_steps = h // T
    planes = idx.shape[0]
    B = x_panel.shape[0]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_slab_spmm_kernel, m=m, planes=planes, B=B),
        out_shape=jax.ShapeDtypeStruct((nu * B * planes, LANES), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[
                spec8(), spec8(), spec8(), spec8(),
                pl.BlockSpec((planes, T, LANES), lambda t, *_: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B * planes, LANES),
                                   lambda t, u, w: (u[t], 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem_params(
            x_panel, T * LANES * (3 + val.dtype.itemsize + planes),
            nu * B * planes * LANES * val.dtype.itemsize),
        interpret=_use_interpret(),
    )(uids, win, lane, sub, val, hm1, idx, x_panel)


def slab_spmv(uids, sg0, sg1, win, lane, sub, val, hm1, idx, x_table,
              nu: int, m: int, T: int = 64, pg: int = 2):
    """Run the fused slab kernel.

    uids:    (n_steps,) int32 — compact first-unit index per grid step,
             non-decreasing.
    sg0/sg1: (n_steps,) int32 — first/last (inclusive) active σ plane per
             step (sg1 < sg0: step routes nothing).
    win:     (H,) int32 — window base col-block per stream row.
    lane:    (H, 128) int8; sub: (H, 128) int8 (ignored when m == 1);
    val:     (H, 128) values; hm1: (H, 128) int8;
    idx:     (planes, H, 128) int8 — σ-plane end-lanes, −1 masked.  planes=8:
             single-unit blocks (steps T-aligned per unit); planes=16:
             pair blocks (steps may straddle one unit boundary, host
             overlap-adds block u's rows 8-15 into unit u+1).
    x_table: (CB, 128) values, VMEM-resident for the whole pass.
    nu:      number of compact units (out blocks).
    Returns (nu·planes, 128).
    """
    h = lane.shape[0]
    n_steps = h // T
    planes = idx.shape[0]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_slab_kernel, m=m, planes=planes, pg=pg),
        out_shape=jax.ShapeDtypeStruct((nu * planes, LANES), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_steps,),
            in_specs=[
                spec8(), spec8(), spec8(), spec8(),
                pl.BlockSpec((planes, T, LANES), lambda t, *_: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((planes, LANES),
                                   lambda t, u, s0, s1, w: (u[t], 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem_params(
            x_table, T * LANES * (3 + val.dtype.itemsize + planes),
            nu * planes * LANES * val.dtype.itemsize),
        interpret=_use_interpret(),
    )(uids, sg0, sg1, win, lane, sub, val, hm1, idx, x_table)


def slab_spmv_blk(uids, win, lane, sub, val, hm1, idx, sig, x_table, nb: int,
                  m: int, planes: int, T: int = 128):
    """Block-granular variant (see _slab_blk_kernel).

    uids: (n_steps,) int32 — compact first block-slot per step (multiples of
          kblk: one slot per 128-row block of each compact kblk-block group).
    idx:  (kblk, H, 128) int8 — per group-block end-lane planes, −1 masked.
    sig:  (H, 128) int8 — per stream row its group's block-slot offset from
          the step's first block-slot (multiple of kblk), lane-replicated.
    Returns (nb·planes, 128): out slab f plane p accumulates contributions to
    compact block-slot f+p (host shift-adds the diagonals).
    """
    h = lane.shape[0]
    n_steps = h // T
    kblk = idx.shape[0]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_slab_blk_kernel, m=m, planes=planes, kblk=kblk),
        out_shape=jax.ShapeDtypeStruct((nb * planes, LANES), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[
                spec8(), spec8(), spec8(), spec8(),
                pl.BlockSpec((kblk, T, LANES), lambda t, *_: (0, t, 0),
                             memory_space=pltpu.VMEM),
                spec8(),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((planes, LANES), lambda t, u, w: (u[t], 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem_params(
            x_table, T * LANES * (3 + kblk + 1 + 2 * val.dtype.itemsize),
            nb * planes * LANES * val.dtype.itemsize),
        interpret=_use_interpret(),
    )(uids, win, lane, sub, val, hm1, idx, sig, x_table)


# ------------------------------------------------------------- df64 (f64) ---

def _df_prefix_runs(vh, vl, hm1):
    """df64 run totals: segmented shift-tree prefix + head-difference.

    The f32 kernel uses one MXU triangle matmul for the inclusive prefix;
    double-float can't ride the MXU, so the prefix is a log2(128)-step
    shift tree of compensated adds, and W = P − P[hm1] is a df subtract.
    Subtraction of two prefixes keeps ~2⁻⁴⁸ of the PREFIX magnitude — for
    ≤128-slot rows that is orders below the f64 target precision."""
    from ... import ops as _ops  # noqa: F401  (package anchor)
    from ...ops import df64 as df

    d = 1
    ph, pl_ = vh, vl
    while d < LANES:
        zh = jnp.concatenate([jnp.zeros_like(ph[:, :d]), ph[:, :-d]], axis=1)
        zl = jnp.concatenate([jnp.zeros_like(pl_[:, :d]), pl_[:, :-d]],
                             axis=1)
        ph, pl_ = df.df_add_sloppy(ph, pl_, zh, zl)
        d *= 2
    h = hm1.astype(jnp.int32)
    hh = jnp.take_along_axis(ph, jnp.maximum(h, 0), axis=1)
    hl = jnp.take_along_axis(pl_, jnp.maximum(h, 0), axis=1)
    mask = h >= 0
    hh = jnp.where(mask, hh, 0.0)
    hl = jnp.where(mask, hl, 0.0)
    wh, wl = df.df_add_sloppy(ph, pl_, -hh, -hl)
    return df.df_renorm(wh, wl)


def _slab_df_kernel(uids_ref, sg0_ref, sg1_ref, win_ref, lane_ref, sub_ref,
                    valh_ref, vall_ref, hm1_ref, idx_ref, xh_ref, xl_ref,
                    outh_ref, outl_ref, *, m: int, planes: int, pg: int = 2):
    """df64 unit-mode slab: every value plane rides as an (hi, lo) f32 pair.

    Same layout contract as _slab_kernel; gather/select run per plane pair,
    products use Dekker two-product, run totals the segmented df tree, and
    the out blocks accumulate with compensated adds (a plain f32 `+=` would
    re-round once per step, ~k·2⁻²⁴ for a unit's k steps)."""
    from ...ops import df64 as df

    t = pl.program_id(0)

    first = jnp.logical_or(
        t == 0, uids_ref[jnp.maximum(t, 1)] != uids_ref[jnp.maximum(t, 1) - 1])

    @pl.when(first)
    def _():
        outh_ref[:] = jnp.zeros_like(outh_ref)
        outl_ref[:] = jnp.zeros_like(outl_ref)

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
    vh, vl = df.df_mul(valh_ref[:], vall_ref[:], gh, gl)
    wh, wl = _df_prefix_runs(vh, vl, hm1_ref[:])

    def _plane_block(g0, n_p):
        outs_h, outs_l = [], []
        for sigma in range(g0, g0 + n_p):
            e = idx_ref[sigma].astype(jnp.int32)
            valid = e >= 0
            pick_h = jnp.take_along_axis(wh, jnp.where(valid, e, 0), axis=1)
            pick_l = jnp.take_along_axis(wl, jnp.where(valid, e, 0), axis=1)
            ah = jnp.where(valid, pick_h, 0.0)
            al = jnp.where(valid, pick_l, 0.0)
            # compensated T-row reduction: log tree over axis 0
            d = 1
            while d < ah.shape[0]:
                zh = jnp.concatenate(
                    [ah[d:], jnp.zeros_like(ah[:d])], axis=0)
                zl = jnp.concatenate(
                    [al[d:], jnp.zeros_like(al[:d])], axis=0)
                ah, al = df.df_add_sloppy(ah, al, zh, zl)
                d *= 2
            outs_h.append(ah[:1])
            outs_l.append(al[:1])
        ch = (jnp.concatenate(outs_h, axis=0) if n_p > 1 else outs_h[0])
        cl = (jnp.concatenate(outs_l, axis=0) if n_p > 1 else outs_l[0])
        return ch, cl

    for g0 in range(0, planes, pg):
        n_p = min(pg, planes - g0)

        @pl.when(jnp.logical_and(sg0_ref[t] < g0 + n_p, sg1_ref[t] >= g0))
        def _(g0=g0, n_p=n_p):
            from ...ops import df64 as _df

            ch, cl = _plane_block(g0, n_p)
            oh = outh_ref[g0:g0 + n_p, :]
            ol = outl_ref[g0:g0 + n_p, :]
            nh, nl = _df.df_add_sloppy(oh, ol, ch, cl)
            outh_ref[g0:g0 + n_p, :] = nh
            outl_ref[g0:g0 + n_p, :] = nl


def slab_spmv_df(uids, sg0, sg1, win, lane, sub, val_hi, val_lo, hm1, idx,
                 xh_table, xl_table, nu: int, m: int, T: int = 64,
                 pg: int = 2):
    """df64 unit-mode slab SpMV: returns (hi, lo) f32 planes of shape
    (nu·planes, 128); the caller assembles y = hi + lo in f64."""
    h = lane.shape[0]
    n_steps = h // T
    planes = idx.shape[0]
    spec8 = lambda: pl.BlockSpec((T, LANES), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((nu * planes, LANES), jnp.float32)
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_slab_df_kernel, m=m, planes=planes, pg=pg),
            out_shape=(shape, shape),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(n_steps,),
                in_specs=[
                    spec8(), spec8(), spec8(), spec8(), spec8(),
                    pl.BlockSpec((planes, T, LANES), lambda t, *_: (0, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(pl.BlockSpec((planes, LANES),
                                        lambda t, u, s0, s1, w: (u[t], 0),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((planes, LANES),
                                        lambda t, u, s0, s1, w: (u[t], 0),
                                        memory_space=pltpu.VMEM)),
            ),
            compiler_params=_vmem_params(
                xh_table, T * LANES * (11 + planes),
                2 * nu * planes * LANES * 4),
            interpret=_use_interpret(),
        )(uids, sg0, sg1, win, lane, sub, val_hi, val_lo, hm1, idx,
          xh_table, xl_table)
