"""Per-stage on-chip profile of the bkt SpMV path for suite matrices.

Times each stage of formats.bkt.spmv in isolation with the chained-loop
methodology (microbench._time): stage A lane-gather+mul, the cb->unit
relayout, stage B reduce, the balance unpermute, and the BSR overflow, plus
the fused whole path.  This is the measurement that directs kernel work —
run it after any bkt/bucket kernel change.

Usage: python scripts/profile_bkt.py [matrix ...]   (default: 3 natural synths)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def profile(name, coo, cfg):
    import jax
    import jax.numpy as jnp

    from singlespmv_tpu.formats import bkt as bkt_mod
    from singlespmv_tpu.formats import bsr as bsr_mod
    from singlespmv_tpu.harness.microbench import _chained, _time
    from singlespmv_tpu.ops.pallas.bucket import (
        LANES, block_gather_mul, bucket_reduce, bucket_reduce_grouped,
        lane_unpermute)

    state = bkt_mod.convert(coo, cfg)
    RB_pad, CB_pad, S, G = state.rb_pad, state.cb_pad, state.s, state.g
    ru = state.row_group // LANES
    NU_pad = RB_pad // ru
    n = state.n_slots
    print(f"== {name}: nnz={coo.nnz} slots={n} pad={n / coo.nnz:.2f} "
          f"S={S} K={state.k} G={G} ru={ru} max_run={state.max_run} "
          f"overflow={state.overflow_nnz} "
          f"({state.overflow_nnz / coo.nnz * 100:.1f}%) w_a={state.val.shape[1]}",
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=coo.n_col), cfg.np_dtype)
    xp = jnp.zeros((CB_pad * LANES,), x.dtype).at[: coo.n_col].set(x)
    xt = xp.reshape(CB_pad, LANES)

    rows = []

    def rep(label, sec, elems):
        rows.append((label, sec, elems))
        print(f"  {label:14s} {sec * 1e6:9.1f} us   "
              f"{elems / sec / 1e9:7.2f} G elem/s   "
              f"{2 * coo.nnz / sec / 1e9:7.2f} GFLOPS-equiv", flush=True)

    # stage A (carry = val)
    def body_a(c, tiny, cb_ids, lane, xt):
        return block_gather_mul(cb_ids, lane, c, xt)

    sec = _time(_chained(body_a), state.val, (state.cb_ids, state.lane, xt))
    rep("stageA", sec, n)

    # relayout (carry = prod flattened to val's shape)
    prod_shape = state.val.shape

    def relayout(prod):
        fused = S <= LANES and LANES % S == 0 and CB_pad % (LANES // S) == 0
        fused_big = S > LANES and S % LANES == 0
        if fused and ru == 1:
            c2n = LANES // S
            return (prod.reshape(CB_pad // c2n, c2n, NU_pad // 8, 8, S)
                    .transpose(2, 0, 3, 1, 4).reshape(NU_pad * G, LANES))
        if fused:
            c2n = LANES // S
            return (prod.reshape(CB_pad // c2n, c2n, NU_pad, S)
                    .transpose(2, 0, 1, 3).reshape(NU_pad * G, LANES))
        if fused_big and ru == 1:
            sh = S // LANES
            return (prod.reshape(CB_pad, NU_pad // 8, 8, sh, LANES)
                    .transpose(1, 0, 3, 2, 4).reshape(NU_pad * G, LANES))
        if fused_big:
            sh = S // LANES
            return (prod.reshape(CB_pad, NU_pad, sh, LANES)
                    .transpose(1, 0, 2, 3).reshape(NU_pad * G, LANES))
        if ru == 1:
            p = prod.reshape(CB_pad, NU_pad, S).transpose(1, 0, 2)
            p = p.reshape(NU_pad // 8, 8, G, LANES).transpose(0, 2, 1, 3)
            return p.reshape(NU_pad * G, LANES)
        return (prod.reshape(CB_pad, NU_pad, S).transpose(1, 0, 2)
                .reshape(NU_pad * G, LANES))

    def body_t(c, tiny):
        return relayout(c.reshape(-1)).reshape(prod_shape)

    sec = _time(_chained(body_t), state.val)
    rep("relayout", sec, n)

    # stage B (carry = p)
    p0 = jnp.asarray(rng.standard_normal((NU_pad * G, LANES)), cfg.np_dtype)

    def body_b(c, tiny, heads, idx):
        if ru == 1:
            y = bucket_reduce(c, heads, idx, NU_pad, max_run=state.max_run)
        else:
            y = bucket_reduce_grouped(c, heads, idx, NU_pad,
                                      max_run=state.max_run)
        return c * (1.0 + y[0, 0] * tiny)

    sec = _time(_chained(body_b), p0, (state.heads, state.idx))
    rep("stageB", sec, n)

    if state.balanced:
        rbu = state.src_lane.shape[1]
        y0 = jnp.asarray(rng.standard_normal((LANES, rbu)), cfg.np_dtype)

        def body_u(c, tiny, sl, sc):
            return lane_unpermute(c, sl, sc)

        sec = _time(_chained(body_u), y0, (state.src_lane, state.src_chunk))
        rep("unpermute", sec, LANES * rbu)

    if state.overflow_nnz:
        def body_o(c, tiny, ov):
            y = bsr_mod.spmv(ov, c)
            return c * (1.0 + y[0] * tiny)

        sec = _time(_chained(body_o), x, (state.overflow,))
        rep("overflowBSR", sec, state.overflow_nnz)

    # fused whole path
    def body_f(c, tiny, st):
        y = bkt_mod.spmv(st, c)
        return c * (1.0 + y[0] * tiny)

    sec = _time(_chained(body_f), x, (state,))
    rep("FULL", sec, coo.nnz)
    return rows


def main():
    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.structgen import synthesize_structured

    names = sys.argv[1:] or ["g7jac200sc", "twotone", "mac_econ_fwd500"]
    for name in names:
        coo = synthesize_structured(name, seed=0)
        for grp in (1024, 128):
            cfg = Config(format="bkt", dtype="float32", bkt_row_group=grp)
            try:
                profile(f"{name} (row_group={grp})", coo, cfg)
            except Exception as e:  # noqa: BLE001
                print(f"== {name} (row_group={grp}): {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
