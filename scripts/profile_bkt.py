"""Per-stage on-chip profile of the bkt SpMV path for suite matrices.

Times each stage of formats.bkt.spmv in isolation with the chained-loop
methodology (microbench._time): stage A lane-gather+mul, the ru=1 XLA
relayout, stage B reduce (MXU prefix + pick), and the balance unpermute,
plus the fused whole path.  This is the measurement that directs kernel
work — run it after any bkt/bucket kernel change.

Usage: python scripts/profile_bkt.py [matrix ...]   (default: 3 natural synths)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def profile(name, coo, cfg):
    import jax.numpy as jnp

    from singlespmv_tpu.formats import bkt as bkt_mod
    from singlespmv_tpu.harness.microbench import _chained, _time
    from singlespmv_tpu.ops.pallas.bucket import (
        LANES, block_gather_mul, bucket_reduce, bucket_reduce_grouped,
        lane_unpermute)

    state = bkt_mod.convert(coo, cfg)
    RB_pad, CB, G_tot, S, G = (state.rb_pad, state.cb, state.g_tot,
                               state.s, state.g)
    ru = state.row_group // LANES
    NU_pad = RB_pad // ru
    n = state.n_slots
    print(f"== {name}: nnz={coo.nnz} slots={n} pad={n / coo.nnz:.2f} "
          f"S={S} K={state.k} m={state.m} G={G} ru={ru} "
          f"ghosts={state.n_ghost} chunks={state.n_chunks}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=coo.n_col), cfg.np_dtype)
    xp = jnp.zeros((CB * LANES,), x.dtype).at[: coo.n_col].set(x)
    xt = xp.reshape(CB, LANES)

    def rep(label, sec, elems):
        print(f"  {label:14s} {sec * 1e6:9.1f} us   "
              f"{elems / sec / 1e9:7.2f} G elem/s   "
              f"{2 * coo.nnz / sec / 1e9:7.2f} GFLOPS-equiv", flush=True)

    # stage A (carry = val)
    def body_a(c, tiny, members, lane, src, xt):
        return block_gather_mul(members, lane, src, c, xt, state.m)

    sec = _time(_chained(body_a), state.val,
                (state.members, state.lane, state.src, xt))
    rep("stageA", sec, n)

    prod_shape = state.val.shape

    if ru == 1:
        # relayout (carry = prod flattened to val's shape)
        def relayout(flat):
            sh = S // LANES
            return (flat.reshape(G_tot, NU_pad // 8, 8, sh, LANES)
                    .transpose(1, 0, 3, 2, 4).reshape(NU_pad * G, LANES))

        def body_t(c, tiny):
            return relayout(c.reshape(-1)).reshape(prod_shape)

        sec = _time(_chained(body_t), state.val)
        rep("relayout", sec, n)

        p0 = jnp.asarray(rng.standard_normal((NU_pad * G, LANES)),
                         cfg.np_dtype)

        def body_b(c, tiny, hm1, idx):
            y = bucket_reduce(c, hm1, idx, NU_pad)
            return c * (1.0 + y[0, 0] * tiny)

        sec = _time(_chained(body_b), p0, (state.hm1, state.idx))
        rep("stageB", sec, n)
    else:
        p0 = jnp.asarray(rng.standard_normal((G_tot, NU_pad, S)),
                         cfg.np_dtype)

        def body_b(c, tiny, hm1, idx):
            y = bucket_reduce_grouped(c, hm1, idx, NU_pad, state.n_chunks)
            return c * (1.0 + y[0, 0] * tiny)

        sec = _time(_chained(body_b), p0, (state.hm1, state.idx))
        rep("stageB", sec, n)

    if state.balanced:
        rbu = state.src_lane.shape[1]
        y0 = jnp.asarray(rng.standard_normal((LANES, rbu)), cfg.np_dtype)

        def body_u(c, tiny, sl, sc):
            return lane_unpermute(c, sl, sc)

        sec = _time(_chained(body_u), y0, (state.src_lane, state.src_chunk))
        rep("unpermute", sec, LANES * rbu)

    # fused whole path
    def body_f(c, tiny, st):
        y = bkt_mod.spmv(st, c)
        return c * (1.0 + y[0] * tiny)

    sec = _time(_chained(body_f), x, (state,))
    rep("FULL", sec, coo.nnz)


def main():
    import time

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.structgen import synthesize_structured

    names = sys.argv[1:] or ["g7jac200sc", "twotone", "mac_econ_fwd500"]
    for name in names:
        coo = synthesize_structured(name, seed=0)
        for grp in (1024, 128):
            cfg = Config(format="bkt", dtype="float32", bkt_row_group=grp)
            try:
                t0 = time.perf_counter()
                profile(f"{name} (row_group={grp})", coo, cfg)
                print(f"  [convert+profile wall {time.perf_counter()-t0:.1f}s]",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"== {name} (row_group={grp}): {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
