"""On-chip primitive microbenchmarks — the machine-constant probe suite.

The reference keeps scratch probes under /root/reference/test/ (alignment.cpp,
simd_shift.cpp, mask_load.cpp ...) that validated the SIMD assumptions its
kernels rely on (SURVEY §2.5).  This is the TPU analog: each probe times one
candidate data motion (lane gather, sublane gather, relayout, one-hot MXU
routing, dynamic-slice accumulate) with the same on-device chained-loop
methodology as the benchmark driver, and the measured rates are what the
format/kernel designs in formats/ and ops/pallas/ are built against (see
PERFORMANCE.md "Measured machine constants").

Run: ``python -m singlespmv_tpu.harness.microbench [--out results/micro.tsv]``
"""
from __future__ import annotations

import sys

import numpy as np

from ..core.timing import now

LANES = 128


def _chained(body):
    """jit(run_n(carry, n)): run body n times with a tiny carry dependency so
    XLA cannot hoist or CSE the probe op (driver.make_chained_runner spirit)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(carry, n, *consts):
        tiny = jnp.asarray(np.finfo(np.float32).tiny, jnp.float32)

        def step(i, c):
            return body(c, tiny, *consts)

        return jax.lax.fori_loop(0, n, step, carry)

    return run_n


def _sync(out):
    """Force device completion.  jax.block_until_ready through the axon tunnel
    returns on dispatch, not completion (measured: flat wall time vs loop
    count) — a scalar readback is the only reliable sync point, and the
    marginal-differencing methodology cancels its fixed cost exactly."""
    import jax

    return float(jax.device_get(out.reshape(-1)[0]))


def _time(run_n, carry, consts=(), *, target_s=0.25, trials=3):
    """Best-of-N marginal per-iteration seconds of run_n."""
    _sync(run_n(carry, 1, *consts))
    n = 4
    while True:
        t0 = now()
        _sync(run_n(carry, n, *consts))
        dt = now() - t0
        if dt >= target_s or n >= (1 << 20):
            break
        n *= 2
    best = float("inf")
    for _ in range(trials):
        t0 = now()
        _sync(run_n(carry, n // 2, *consts))
        t1 = now()
        _sync(run_n(carry, n, *consts))
        t2 = now()
        margin = (t2 - t1) - (t1 - t0)
        per = margin / (n - n // 2) if margin > 0 else (t2 - t0) / (n + n // 2)
        best = min(best, per)
    return best


def _interp():
    import jax

    return jax.default_backend() != "tpu"


# --------------------------------------------------------------- probes ------

def probe_stream(G=8192, dtype=np.float32):
    """VPU elementwise rate: out = a*1.0001 + 0.5 over a VMEM-resident
    (G,128) loop carry (at G=8192 = 4 MB XLA keeps the while-carry on chip)."""
    import jax.numpy as jnp

    a = jnp.asarray(np.random.default_rng(0).standard_normal((G, LANES)),
                    dtype=dtype)

    def body(c, tiny):
        return c * jnp.asarray(1.0001, c.dtype) + jnp.asarray(0.5, c.dtype)

    sec = _time(_chained(body), a)
    return G * LANES, sec


def probe_hbm_read(G=1048576, dtype=np.float32):
    """HBM read bandwidth: reduce a 512 MB constant per iteration.  The
    reduction input depends on the carry (max with a scalar) so XLA can
    neither hoist it out of the loop nor simplify it algebraically."""
    import jax.numpy as jnp

    a = jnp.asarray(np.random.default_rng(0).standard_normal((G, LANES)),
                    dtype=dtype)
    c0 = jnp.zeros((8, LANES), dtype)

    def body(c, tiny, a):
        s = jnp.sum(jnp.maximum(a, c[0, 0]))
        return c + s * tiny

    sec = _time(_chained(body), c0, (a,))
    return G * LANES, sec


def probe_lane_gather(w=128, G=8192, dtype=np.float32, table_rows=1):
    """take_along_axis along lanes inside a Pallas kernel.

    Per (8,w) tile: gather (8w/128,128) lanes from a broadcast x row
    (table_rows=1, the bkt stage-A motion) or from a (g,128) table row-for-row
    (table_rows=0 → per-row sources).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    h = G * LANES // w
    idt = jnp.int16 if np.dtype(dtype).itemsize == 2 else jnp.int32
    col = jnp.asarray(rng.integers(0, LANES, (h, w)), idt)
    val = jnp.asarray(rng.standard_normal((h, w)), dtype=dtype)
    x = jnp.asarray(rng.standard_normal((max(table_rows, 8 * w // LANES), LANES)),
                    dtype=dtype)

    def kernel(col_ref, val_ref, x_ref, out_ref):
        g = 8 * w // LANES
        if table_rows == 1:
            xb = jnp.broadcast_to(x_ref[pl.ds(0, 1), :], (g, LANES))
        else:
            xb = x_ref[0:g, :]
        lanes = col_ref[:].reshape(g, LANES)
        gathered = jnp.take_along_axis(xb, lanes, axis=1)
        out_ref[:] = (val_ref[:].reshape(g, LANES) * gathered).reshape(8, w)

    spec = lambda: pl.BlockSpec((8, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), val.dtype),
        grid=(h // 8,),
        in_specs=[spec(), spec(), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec(),
        interpret=_interp(),
    )

    def body(c, tiny, col, x):
        return call(col, c, x)

    sec = _time(_chained(body), val, (col, x))
    return G * LANES, sec


def probe_gather1024(G=8192, dtype=np.float32, levels=8, w=LANES):
    """Two-level gather: per element pick (sublane 0..levels-1, lane) from an
    (levels,128) x block — `levels`-way where-select of lane gathers.  Models
    col-chunks of 128·levels (bkt with 8× fewer, deeper buckets).  `w` sets
    the tile width ((8,w) per grid step): the select chain cost turned out to
    be tile-granularity-bound, not levels-bound."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    h = G * LANES // w
    g = 8 * w // LANES
    col = jnp.asarray(rng.integers(0, levels * LANES, (h, w)), jnp.int32)
    val = jnp.asarray(rng.standard_normal((h, w)), dtype=dtype)
    x = jnp.asarray(rng.standard_normal((8, LANES)), dtype=dtype)

    def kernel(col_ref, val_ref, x_ref, out_ref):
        lanes = col_ref[:].reshape(g, LANES) % LANES
        sub = col_ref[:].reshape(g, LANES) // LANES
        acc = jnp.zeros((g, LANES), val_ref.dtype)
        for lv in range(levels):
            xb = jnp.broadcast_to(x_ref[pl.ds(lv % 8, 1), :], (g, LANES))
            picked = jnp.take_along_axis(xb, lanes, axis=1)
            acc = jnp.where(sub == lv, picked, acc)
        out_ref[:] = (val_ref[:].reshape(g, LANES) * acc).reshape(8, w)

    spec = lambda: pl.BlockSpec((8, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), val.dtype),
        grid=(h // 8,),
        in_specs=[spec(), spec(), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec(),
        interpret=_interp(),
    )

    def body(c, tiny, col, x):
        return call(col, c, x)

    sec = _time(_chained(body), val, (col, x))
    return G * LANES, sec


def probe_palette_gather(w=1024, G=8192, CBX=8192, dtype=np.float32,
                         per=1):
    """The pal-format inner loop: x fully VMEM-resident as (CBX,128); per
    (8,w) tile each lane-row (or each group of `per` lane-rows) has its own
    scalar-prefetched col-block id; kernel assembles the per-row tables with
    dynamic sublane slices of x, then lane-gathers.  Measures whether
    per-lane-row dynamic palettes sustain the broadcast-table gather rate."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(11)
    h = G * LANES // w
    g = 8 * w // LANES                 # lane-rows per tile
    steps = h // 8
    nb = g // per                      # block ids per tile
    col = jnp.asarray(rng.integers(0, LANES, (h, w)), jnp.int32)
    val = jnp.asarray(rng.standard_normal((h, w)), dtype=dtype)
    x = jnp.asarray(rng.standard_normal((CBX, LANES)), dtype=dtype)
    blk = jnp.asarray(rng.integers(0, CBX, (steps * nb,)), jnp.int32)

    def kernel(blk_ref, col_ref, val_ref, x_ref, out_ref):
        t = pl.program_id(0)
        rows = [jnp.broadcast_to(x_ref[pl.ds(blk_ref[t * nb + p], 1), :],
                                 (per, LANES))
                for p in range(nb)]
        xb = jnp.concatenate(rows, 0) if nb > 1 else rows[0]
        lanes = col_ref[:].reshape(g, LANES)
        out_ref[:] = (val_ref[:].reshape(g, LANES)
                      * jnp.take_along_axis(xb, lanes, axis=1)).reshape(8, w)

    spec = lambda: pl.BlockSpec((8, w), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[spec(), spec(), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=spec(),
        ),
        interpret=_interp(),
    )

    def body(c, tiny, blk, col, x):
        return call(blk, col, c, x)

    sec = _time(_chained(body), val, (blk, col, x))
    return G * LANES, sec


def probe_pal2step(w=1024, G=8192, CBX=8192, dtype=np.float32, K=1):
    """pal two-step gather: per (8,w) tile each lane-row gets an (8,128)
    x window (one dynamic slice), K per-lambda sublane planes select rows
    from the window, then the lane gather places elements at slot lanes.
    Per lane-row element (s,l) reachable iff sub_k[l]==s for some k."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(13)
    h = G * LANES // w
    g = 8 * w // LANES
    steps = h // 8
    col = jnp.asarray(rng.integers(0, LANES, (h, w)), jnp.int32)
    val = jnp.asarray(rng.standard_normal((h, w)), dtype=dtype)
    x = jnp.asarray(rng.standard_normal((CBX, LANES)), dtype=dtype)
    blk = jnp.asarray(rng.integers(0, CBX - 8, (steps * g,)), jnp.int32)
    sub = jnp.asarray(rng.integers(0, 8, (K, h, w)), jnp.int32)
    sel = jnp.asarray(rng.integers(0, K, (h, w)), jnp.int32)

    def kernel(blk_ref, col_ref, val_ref, sub_ref, sel_ref, x_ref, out_ref):
        t = pl.program_id(0)
        win = jnp.stack([x_ref[pl.ds(blk_ref[t * g + p], 8), :]
                         for p in range(g)])            # (g, 8, 128)
        lanes = col_ref[:].reshape(g, LANES)
        acc = None
        for k in range(K):
            subk = sub_ref[k].reshape(g, 1, LANES)
            tk = jnp.take_along_axis(win, subk, axis=1).reshape(g, LANES)
            gk = jnp.take_along_axis(tk, lanes, axis=1)
            if acc is None:
                acc = gk
            else:
                acc = jnp.where(sel_ref[:].reshape(g, LANES) == k, gk, acc)
        out_ref[:] = (val_ref[:].reshape(g, LANES) * acc).reshape(8, w)

    spec = lambda bs: pl.BlockSpec(bs, lambda i, *_: (i, 0) if len(bs) == 2
                                   else (0, i, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), val.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[spec((8, w)), spec((8, w)), spec((K, 8, w)),
                      spec((8, w)), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=spec((8, w)),
        ),
        interpret=_interp(),
    )

    def body(c, tiny, blk, col, sub, sel, x):
        return call(blk, col, c, sub, sel, x)

    sec = _time(_chained(body), val, (blk, col, sub, sel, x))
    return G * LANES, sec


def probe_onehot_inkernel(G=8192, dtype=np.float32):
    """Combine candidate: per (8,128) product tile, build the (8,128,128)
    one-hot from int32 row-bin indices IN KERNEL (iota compare) and contract
    on the MXU into 128 bins — routing without HBM one-hot traffic."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(12)
    binv = jnp.asarray(rng.integers(0, LANES, (G, LANES)), jnp.int32)
    val = jnp.asarray(rng.standard_normal((G, LANES)), dtype=dtype)

    def kernel(bin_ref, val_ref, out_ref):
        b = jax.lax.broadcasted_iota(jnp.int32, (8, LANES, LANES), 2)
        oh = (bin_ref[:].reshape(8, LANES, 1) == b).astype(val_ref.dtype)
        r = jax.lax.dot_general(
            val_ref[:].reshape(1, 8 * LANES),
            oh.reshape(8 * LANES, LANES), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = jnp.broadcast_to(r.astype(val_ref.dtype), (8, LANES))

    spec = lambda: pl.BlockSpec((8, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, LANES), val.dtype),
        grid=(G // 8,),
        in_specs=[spec(), spec()],
        out_specs=spec(),
        interpret=_interp(),
    )

    def body(c, tiny, binv):
        return call(binv, c)

    sec = _time(_chained(body), val, (binv,))
    return G * LANES, sec


def probe_sublane_gather(G=8192, rows=1024, dtype=np.float32):
    """take_along_axis along axis 0 (sublanes) from a (rows,128) VMEM table."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    idx = jnp.asarray(rng.integers(0, rows, (G, LANES)), jnp.int32)
    val = jnp.asarray(rng.standard_normal((G, LANES)), dtype=dtype)
    x = jnp.asarray(rng.standard_normal((rows, LANES)), dtype=dtype)

    def kernel(idx_ref, val_ref, x_ref, out_ref):
        picked = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)
        out_ref[:] = val_ref[:] * picked

    spec = lambda: pl.BlockSpec((8, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, LANES), val.dtype),
        grid=(G // 8,),
        in_specs=[spec(), spec(), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec(),
        interpret=_interp(),
    )

    def body(c, tiny, idx, x):
        return call(idx, c, x)

    sec = _time(_chained(body), val, (idx, x))
    return G * LANES, sec


def probe_xla_transpose(CB=256, NU=256, S=32, dtype=np.float32):
    """The bkt cb-major → unit-major relayout as plain XLA transpose."""
    import jax.numpy as jnp

    a = jnp.asarray(
        np.random.default_rng(4).standard_normal((CB * NU * S,)), dtype=dtype)

    def body(c, tiny):
        p = c.reshape(CB, NU, S).transpose(1, 0, 2).reshape(-1)
        return p

    sec = _time(_chained(body), a)
    return CB * NU * S, sec


def probe_onehot_mxu(G=2048, dtype=np.float32):
    """(8,128)@(128,128) routing matmuls: products routed to 128 bins via a
    precomputed one-hot — MXU as a scatter engine."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((G, LANES)), dtype=dtype)
    onehot = np.zeros((G // 8, LANES, LANES), dtype=dtype)
    cols = rng.integers(0, LANES, (G // 8, LANES))
    for t in range(G // 8):
        onehot[t, np.arange(LANES), cols[t]] = 1.0
    oh = jnp.asarray(onehot)

    def body(c, tiny, oh):
        r = jnp.einsum("tsl,tlb->tsb", c.reshape(G // 8, 8, LANES), oh,
                       preferred_element_type=jnp.float32).astype(c.dtype)
        return r.reshape(G, LANES)

    sec = _time(_chained(body), a, (oh,))
    return G * LANES, sec


def probe_dynslice_accum(T=4096, dtype=np.float32):
    """Sequential-grid accumulate: per step read-modify-write an (8,128) slice
    of a VMEM-resident y at a prefetched dynamic row offset (CSR5-style y
    update)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(6)
    offs = jnp.asarray(np.sort(rng.integers(0, 1016, T)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((T * 8, LANES)), dtype=dtype)

    def kernel(offs_ref, v_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        off = offs_ref[t]
        out_ref[pl.ds(off, 8), :] += v_ref[:]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1024, LANES), dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[pl.BlockSpec((8, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_interp(),
    )

    def body(c, tiny, offs):
        return c + call(offs, c)[0, 0] * tiny

    sec = _time(_chained(body), v, (offs,))
    return T * 8 * LANES, sec


def probe_seg_scan(G=8192, dtype=np.float32):
    """Pure segmented Hillis–Steele lane scan (log2(128) shift steps), no
    gathers — the stage-B scan in isolation."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    heads = jnp.asarray(rng.integers(0, 2, (G, LANES)), jnp.int32)
    val = jnp.asarray(rng.standard_normal((G, LANES)), dtype=dtype)

    def kernel(heads_ref, val_ref, out_ref):
        v = val_ref[:]
        f = heads_ref[:]
        d = 1
        while d < LANES:
            vz = jnp.concatenate([jnp.zeros_like(v[:, :d]), v[:, :-d]], axis=1)
            fz = jnp.concatenate([jnp.ones_like(f[:, :d]), f[:, :-d]], axis=1)
            v = jnp.where(f > 0, v, v + vz)
            f = jnp.maximum(f, fz)
            d *= 2
        out_ref[:] = v

    spec = lambda: pl.BlockSpec((8, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, LANES), val.dtype),
        grid=(G // 8,),
        in_specs=[spec(), spec()],
        out_specs=spec(),
        interpret=_interp(),
    )

    def body(c, tiny, heads):
        return call(heads, c)

    sec = _time(_chained(body), val, (heads,))
    return G * LANES, sec


def probe_seg_scan_roll(G=8192, dtype=np.float32, steps=7):
    """Segmented lane scan with pltpu.roll shifts (circular rotate + iota
    mask) instead of concatenate slices — candidate fix for the measured
    2 G elem/s concatenate-shift scan."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    heads = jnp.asarray(rng.integers(0, 2, (G, LANES)), jnp.int8)
    val = jnp.asarray(rng.standard_normal((G, LANES)), dtype=dtype)

    def kernel(heads_ref, val_ref, out_ref):
        v = val_ref[:]
        f = heads_ref[:].astype(jnp.int32)   # Mosaic rotate needs 32-bit
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        d = 1
        for _ in range(steps):
            vz = jnp.where(lane >= d, pltpu.roll(v, d, axis=1), 0.0)
            fz = jnp.where(lane >= d, pltpu.roll(f, d, axis=1),
                           jnp.ones_like(f))
            v = jnp.where(f > 0, v, v + vz)
            f = jnp.maximum(f, fz)
            d *= 2
        out_ref[:] = v

    spec = lambda: pl.BlockSpec((8, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, LANES), val.dtype),
        grid=(G // 8,),
        in_specs=[spec(), spec()],
        out_specs=spec(),
        interpret=_interp(),
    )

    def body(c, tiny, heads):
        return call(heads, c)

    sec = _time(_chained(body), val, (heads,))
    return G * LANES, sec


def probe_pallas_tile_transpose(CB=256, NU=256, S=128, dtype=np.float32):
    """The bkt relayout as a Pallas grid kernel: per grid step read an
    (8 cb, 8 nu, S) brick, swap the two block axes in VMEM, write to the
    transposed brick of the (NU, CB·S) output — strided-DMA relayout."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a = jnp.asarray(
        np.random.default_rng(8).standard_normal((CB, NU * S)), dtype=dtype)

    def kernel(in_ref, out_ref):
        brick = in_ref[:].reshape(8, 8, S)
        out_ref[:] = jnp.swapaxes(brick, 0, 1).reshape(8, 8 * S)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NU, CB * S), dtype),
        grid=(CB // 8, NU // 8),
        in_specs=[pl.BlockSpec((8, 8 * S), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8 * S), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        interpret=_interp(),
    )

    def body(c, tiny):
        return call(c).reshape(CB, NU * S)

    sec = _time(_chained(body), a)
    return CB * NU * S, sec


PROBES = {
    "vpu_stream_f32": lambda: probe_stream(),
    "hbm_read_f32": lambda: probe_hbm_read(),
    "lane_gather_w128": lambda: probe_lane_gather(w=128),
    "lane_gather_w512": lambda: probe_lane_gather(w=512),
    "lane_gather_w1024": lambda: probe_lane_gather(w=1024),
    "lane_gather_table8_w128": lambda: probe_lane_gather(w=128, table_rows=0),
    "gather1024_8way": lambda: probe_gather1024(levels=8),
    "gather512_4way": lambda: probe_gather1024(levels=4),
    "gather256_2way": lambda: probe_gather1024(levels=2),
    "sublane_gather_1024": lambda: probe_sublane_gather(rows=1024),
    "sublane_gather_64": lambda: probe_sublane_gather(rows=64),
    "sublane_gather_8": lambda: probe_sublane_gather(rows=8),
    "xla_transpose_s32": lambda: probe_xla_transpose(S=32),
    "xla_transpose_s8": lambda: probe_xla_transpose(CB=1024, NU=256, S=8),
    "xla_transpose_s128": lambda: probe_xla_transpose(CB=64, NU=256, S=128),
    "pallas_tile_transpose": lambda: probe_pallas_tile_transpose(),
    "seg_scan_roll_7": lambda: probe_seg_scan_roll(steps=7),
    "seg_scan_roll_4": lambda: probe_seg_scan_roll(steps=4),
    "seg_scan_roll_2": lambda: probe_seg_scan_roll(steps=2),
    "seg_scan_big_block": lambda: probe_seg_scan(G=8192),
    "onehot_mxu_route": lambda: probe_onehot_mxu(),
    "onehot_inkernel_route": lambda: probe_onehot_inkernel(),
    "lane_gather_w1024_tab0": lambda: probe_lane_gather(w=1024, table_rows=0),
    "palette_w1024": lambda: probe_palette_gather(w=1024),
    "palette_w512": lambda: probe_palette_gather(w=512),
    "palette_w1024_per8": lambda: probe_palette_gather(w=1024, per=8),
    "palette_w1024_cbx32k": lambda: probe_palette_gather(w=1024, CBX=32768),
    "gather8way_w1024": lambda: probe_gather1024(levels=8, w=1024),
    "gather4way_w1024": lambda: probe_gather1024(levels=4, w=1024),
    "gather2way_w1024": lambda: probe_gather1024(levels=2, w=1024),
    "gather16way_w1024": lambda: probe_gather1024(levels=16, w=1024),
    "gather8way_w4096": lambda: probe_gather1024(levels=8, w=4096),
    "dynslice_accum": lambda: probe_dynslice_accum(),
    "seg_scan_128": lambda: probe_seg_scan(),
    "lane_gather_w512_bf16": lambda: probe_lane_gather(
        w=512, dtype=np.dtype("bfloat16")),
}


def run(names=None, out=None, log=lambda m: print(m, file=sys.stderr)):
    rows = []
    for name, fn in PROBES.items():
        if names and name not in names:
            continue
        try:
            elems, sec = fn()
            rate = elems / sec / 1e9
            rows.append((name, elems, sec, rate))
            log(f"{name:28s} {rate:10.2f} G elem/s   ({sec * 1e6:9.1f} us)")
        except Exception as e:  # noqa: BLE001 — probes may be unsupported
            rows.append((name, 0, float("nan"), float("nan")))
            log(f"{name:28s} UNSUPPORTED: {type(e).__name__}: {e}")
    if out:
        with open(out, "w") as f:
            f.write("probe\telements\tseconds\tGelem_per_s\n")
            for r in rows:
                f.write(f"{r[0]}\t{r[1]}\t{r[2]:.3e}\t{r[3]:.3f}\n")
    return rows


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("probes", nargs="*", default=None)
    a = ap.parse_args()
    run(a.probes or None, a.out)
