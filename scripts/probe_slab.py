"""Probe: fused slab SpMV kernel rate (window gather + mul + prefix + sigma routes).

Design under test (the bkt-v3 "slab" engine):
  - stream of 128-slot rows, each row belongs to ONE row-unit (rg rows of y)
    and carries its own x-window base (8 contiguous col-blocks);
  - per grid step: T rows; window assembly = T dynamic (8,128) slices of the
    VMEM-resident x table; gather = batched sublane take + lane take;
  - reduce = MXU prefix (HIGHEST) run totals + S8 collision-free sigma planes
    (idx_s[row, lane] = end lane of the run with rl = s*128+lane, i8, -1 none);
  - out block (8,128) indexed by scalar-prefetched unit id, accumulated over
    the unit's consecutive steps.

Measures G slot/s at suite-like scale for T in {8,16}, S8 in {2,8}.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


LANES = 128


def make_call(n_steps, T, S8, CB, NU, dtype, stage="all"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _run_totals(v, hm1):
        r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        tri = (r <= c).astype(v.dtype)
        p = jnp.dot(v, tri, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).astype(v.dtype)
        h = hm1.astype(jnp.int32)
        ph = jnp.take_along_axis(p, jnp.maximum(h, 0), axis=1)
        return p - jnp.where(h >= 0, ph, jnp.zeros_like(ph))

    def kernel(uids_ref, base_ref, lane_ref, sub_ref, val_ref, hm1_ref,
               idx_ref, x_ref, out_ref):
        t = pl.program_id(0)
        first = jnp.logical_or(
            t == 0, uids_ref[jnp.maximum(t, 1)] != uids_ref[jnp.maximum(t, 1) - 1])

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        if stage in ("all", "window", "gather", "select"):
            wins = [x_ref[pl.ds(base_ref[r, 0], 8), :] for r in range(T)]
            ws = jnp.concatenate(wins, axis=0)          # (8T, 128)
        if stage == "window":
            v = val_ref[:] * ws.reshape(T, 8, LANES)[:, 0, :]
        elif stage in ("all", "gather", "select"):
            lane = lane_ref[:].astype(jnp.int32)        # (T, 128)
            lane8 = jnp.broadcast_to(lane[:, None, :], (T, 8, LANES)
                                     ).reshape(8 * T, LANES)
            tk = jnp.take_along_axis(ws, lane8, axis=1)  # (8T, 128)
            if stage == "gather":
                v = val_ref[:] * tk.reshape(T, 8, LANES)[:, 0, :]
            else:
                sub = sub_ref[:].astype(jnp.int32)      # (T, 128)
                srow = jax.lax.broadcasted_iota(jnp.int32, (T, 8, LANES), 1)
                m = (srow == sub[:, None, :]).astype(tk.dtype)
                g = jnp.sum(tk.reshape(T, 8, LANES) * m, axis=1)  # (T, 128)
                v = val_ref[:] * g
        else:
            v = val_ref[:]
        if stage in ("all", "prefix", "route"):
            w = _run_totals(v, hm1_ref[:])
        else:
            w = v
        if stage in ("all", "route", "routeonly"):
            outs = []
            for s in range(S8):
                e = idx_ref[s].astype(jnp.int32)        # (T, 128)
                picked = jnp.take_along_axis(w, jnp.maximum(e, 0), axis=1)
                outs.append(jnp.sum(jnp.where(e >= 0, picked, 0.0), axis=0,
                                    keepdims=True))
            o = jnp.concatenate(outs, axis=0)           # (S8, 128)
            if S8 < 8:
                o = jnp.concatenate(
                    [o, jnp.zeros((8 - S8, LANES), o.dtype)], axis=0)
        else:
            o = jnp.broadcast_to(jnp.sum(w, axis=0, keepdims=True),
                                 (8, LANES))
        out_ref[:] += o

    H = n_steps * T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((T, 1), lambda t, u: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, LANES), lambda t, u: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), lambda t, u: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), lambda t, u: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), lambda t, u: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S8, T, LANES), lambda t, u: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda t, u: (u[t], 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NU * 8, LANES), dtype),
        grid_spec=grid_spec,
    )
    return call, H


def main():
    import jax.numpy as jnp

    from singlespmv_tpu.harness.microbench import _chained, _time

    rng = np.random.default_rng(7)
    CB, NU = 1700, 208
    for T, S8, stage in (
        (16, 8, "all"),
        (32, 8, "all"),
        (64, 8, "all"),
        (32, 8, "window"),
        (32, 8, "gather"),
        (32, 8, "select"),
        (32, 8, "prefix"),
        (32, 8, "routeonly"),
        (32, 2, "all"),
    ):
        if True:
            n_steps = 3200 // (T // 8)
            call, H = make_call(n_steps, T, S8, CB, NU, np.float32,
                                stage=stage)
            steps_per_unit = n_steps // NU
            uids = np.repeat(np.arange(NU, dtype=np.int32),
                             steps_per_unit)
            uids = np.concatenate([uids, np.full(n_steps - len(uids), NU - 1,
                                                 np.int32)])
            base = rng.integers(0, CB - 8, (H, 1)).astype(np.int32)
            lane = rng.integers(0, LANES, (H, LANES)).astype(np.int8)
            sub = rng.integers(0, 8, (H, LANES)).astype(np.int8)
            val = rng.standard_normal((H, LANES)).astype(np.float32)
            # runs: random run boundaries
            heads = rng.random((H, LANES)) < 0.5
            heads[:, 0] = True
            lane_i = np.broadcast_to(np.arange(LANES), (H, LANES))
            hm1 = (np.maximum.accumulate(np.where(heads, lane_i, -1),
                                         axis=1) - 1).astype(np.int8)
            idx = np.full((S8, H, LANES), -1, np.int8)
            # ends: lane before each head, plus 127
            for s in range(S8):
                mask = rng.random((H, LANES)) < (0.3 / S8)
                ends = rng.integers(0, LANES, (H, LANES))
                idx[s] = np.where(mask, ends, -1).astype(np.int8)
            x = rng.standard_normal((CB, LANES)).astype(np.float32)

            uids_j = jnp.asarray(uids)
            args = (jnp.asarray(base), jnp.asarray(lane), jnp.asarray(sub),
                    jnp.asarray(hm1), jnp.asarray(idx), jnp.asarray(x))

            def body(c, tiny, base, lane, sub, hm1, idx, x,
                     call=call, uids_j=uids_j):
                y = call(uids_j, base, lane, sub, c, hm1, idx, x)
                return c * (1.0 + y[0, 0] * tiny)

            sec = _time(_chained(body), jnp.asarray(val), args)
            slots = H * LANES
            print(f"T={T:3d} S8={S8} {stage:9s}: {sec * 1e6:9.1f} us  "
                  f"{slots / sec / 1e9:7.2f} G slot/s", flush=True)


if __name__ == "__main__":
    main()
