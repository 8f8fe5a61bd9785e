"""Distributed flagship SpMV: the xch v4 exchange engine under shard_map.

r4's distributed path computed `val * x_all[col]` through the XLA general
gather — the 0.14 G elem/s motion this framework exists to avoid (r4 VERDICT
"What's weak" #4: a real pod would run ~50× below the single-chip flagship).
This operator row-partitions the matrix into R equal contiguous spans and runs
the FULL v4 exchange (pass-1 windowed gather-multiply + blk-granular one-hot
route, ops/pallas/xch.py) per shard:

- every shard converts its row span with ONE COMMON plan (m1/m2/kblk/t/p_oh/gb
  fixed) and a single source chunk, so the per-shard layouts stack into single
  arrays that ``shard_map`` splits over the "row" mesh axis;
- x is sharded over "row"; one tiled ``all_gather`` over ICI assembles it and
  each shard slices only its COLUMN FOOTPRINT (per-shard scalar base block) —
  the VMEM-resident window table stays bounded no matter the global n_col;
- y needs no psum: out groups tile each shard's row span directly (the v4
  visited-groups design), shards concatenate over "row".

Reference parity: the reference is single-node (SURVEY §2.6); this implements
the BASELINE.json north-star ("matrices row/block-partitioned across hosts,
halo segments of the dense vector exchanged ... overlapped with local SpMV
compute").  The finer-grained ppermute/boundary-table exchange lives in
parallel/halo.py; this operator is the compute-side flagship.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import Config
from ..core.types import COOMatrix, cdiv, round_up
from ..formats import xch as xch_mod

LANES = 128


def _pad_rows(a, h, fill=0):
    if a.shape[0] == h:
        return a
    pad = np.full((h - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


def _pad_planes(a, h, fill):
    if a.shape[1] == h:
        return a
    pad = np.full((a.shape[0], h - a.shape[1]) + a.shape[2:], fill, a.dtype)
    return np.concatenate([a, pad], axis=1)


@dataclasses.dataclass
class DistXch:
    """Converted, mesh-stacked distributed exchange operator.

    Build with ``DistXch.convert(coo, cfg, mesh)``; apply with ``op(x)``.
    """

    mesh: object
    cfg: Config
    n_row: int
    n_col: int
    nnz: int
    R: int
    rows_per: int
    row0s: tuple             # per-shard first row (balanced contiguous cuts)
    m1: int
    m2: int
    t1: int
    t2: int
    kblk: int
    p_oh: int
    gb: int
    ng: int                  # out groups per shard
    p1: int                  # product rows per shard (single chunk)
    cb_pad: int              # footprint col-blocks (+ window margin)
    x_len: int               # padded global x length (multiple of R)
    x_mode: str              # "ring" (ppermute halo rounds) | "allgather"
    n_rounds: tuple          # ring rounds (backward, forward owner reach)
    arrays: dict             # stacked device arrays, leading dim R
    _jitted: object = None

    @staticmethod
    def convert(coo: COOMatrix, cfg: Config, mesh, *,
                row_axis: str = "row") -> "DistXch":
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        R = int(np.prod([axes[a] for a in ([row_axis] if isinstance(
            row_axis, str) else row_axis)]))
        gb = 64
        grain = gb * LANES

        # common plan from the whole-matrix closed form, all knobs fixed so
        # every shard's layout agrees in shape structure
        est = xch_mod.estimate_v4(coo, cfg, no_long=True)
        if not est.get("feasible", False):
            raise ValueError("distxch: infeasible plan")
        rows0 = coo.row.astype(np.int64)
        cols0 = coo.col.astype(np.int64)

        # nnz-BALANCED contiguous splits at out-group (gb·128-row) grain:
        # shards execute in SPMD lockstep, so the slowest shard's padded
        # stream is the step time — equal-row splits on skewed matrices
        # waste the light shards (the distributed analog of CSR5's tile
        # balancing).  Greedy prefix cut at the nnz/R quantiles.
        n_grain = cdiv(max(coo.n_row, 1), grain)
        gr_nnz = np.bincount(np.minimum(rows0 // grain, n_grain - 1),
                             minlength=n_grain).astype(np.float64)
        cum = np.cumsum(gr_nnz)
        total = max(cum[-1], 1.0)
        if n_grain < R:
            # fewer out-group grains than shards: trailing shards are empty
            bounds = [min(i, n_grain) for i in range(R)] + [n_grain]
        else:
            bounds = [0]
            for rshard in range(1, R):
                tgt = total * rshard / R
                g = int(np.searchsorted(cum, tgt))
                bounds.append(int(np.clip(g + 1, bounds[-1] + 1,
                                          n_grain - (R - rshard))))
            bounds.append(n_grain)
        row0s = [b * grain for b in bounds[:-1]]
        ng = max(b1 - b0 for b0, b1 in zip(bounds[:-1], bounds[1:]))
        rows_per = ng * grain           # padded span per shard (shapes)
        shard_of = np.searchsorted(np.asarray(row0s[1:] + [coo.n_row + 1]),
                                   rows0, side="right")
        sub_nnz = np.bincount(shard_of, minlength=R)
        kblk = int(est.get("kblk", 8))
        p_oh = min(int(est.get("p_oh", 16)), gb)
        m2 = xch_mod._align8(max(int(est.get("m2_hint", 8)), 1),
                             xch_mod.M2_CAP)
        plan = {"feasible": True, "route_v": 4,
                "k_slots": int(max(sub_nnz.max(), 16 * LANES)),
                "kblk": kblk, "kblk_fix": True,
                "p_oh": p_oh, "p_oh_fix": p_oh,
                "gb": gb, "gb_fix": True,
                "m2_fix": m2, "t1_fix": 128, "t2_fix": 64,
                "no_long": True, "no_peel": True, "no_refine": True}

        # per-shard column footprint (common width = max over shards)
        cb0s, cb1s = [], []
        for r in range(R):
            m = shard_of == r
            if m.any():
                cb0s.append(int(cols0[m].min()) >> 7)
                cb1s.append((int(cols0[m].max()) >> 7) + 1)
            else:
                cb0s.append(0)
                cb1s.append(1)
        cbn = max(b - a for a, b in zip(cb0s, cb1s))

        states = []
        m1_common = None
        for r in range(R):
            m = shard_of == r
            lr = rows0[m] - row0s[r]
            lc = cols0[m] - cb0s[r] * LANES
            lv = np.asarray(coo.val)[m]
            if len(lr) == 0:            # keep shapes: one explicit zero
                lr = np.zeros(1, np.int64)
                lc = np.zeros(1, np.int64)
                lv = np.zeros(1, coo.val.dtype)
            sub = COOMatrix(n_row=rows_per, n_col=cbn * LANES,
                            row=lr, col=lc, val=lv)
            pl = dict(plan)
            if m1_common is not None:
                pl["m1_fix"] = m1_common
            st = xch_mod._convert_v4(sub, cfg, pl)
            if m1_common is None:
                m1_common = st.m1       # first (usually largest) shard leads
                if st.m1 != plan.get("m1_fix"):
                    pass
            elif st.m1 != m1_common:
                raise AssertionError("distxch: m1 drift across shards")
            if len(st.win1) != 1 or len(st.gids2) != 1:
                raise ValueError("distxch: shard layout needs multiple "
                                 "pallas calls (raise R or CHUNK_ROWS)")
            if st.n_chunks != 1:
                raise AssertionError("distxch: expected a single chunk")
            states.append(st)

        t1, t2 = states[0].t1, states[0].t2
        p1 = max(round_up(max(np.asarray(st.win1[0]).shape[0], t1), t1)
                 for st in states)
        s_max = max(np.asarray(st.gids2[0]).shape[0] for st in states)
        s_max = max(s_max, 1)
        h2 = s_max * t2
        nvis = max(np.asarray(st.vis_gids).shape[0] for st in states)
        nvis = max(nvis, 1)

        def shard_arrays(st):
            w1 = _pad_rows(np.asarray(st.win1[0]), p1)
            la1 = _pad_rows(np.asarray(st.lane1[0]), p1)
            su1 = _pad_rows(np.asarray(st.sub1[0]), p1)
            va1 = _pad_rows(np.asarray(st.val1[0]), p1)
            g = np.asarray(st.gids2[0])
            gpad = int(g[-1]) if len(g) else 0
            g = _pad_rows(g, s_max, gpad)
            off = _pad_rows(np.asarray(st.off2[0]), s_max, 0)
            w2 = _pad_rows(np.asarray(st.win2[0]), h2)
            la2 = _pad_rows(np.asarray(st.lane2[0]), h2)
            su2 = _pad_rows(np.asarray(st.sub2[0]), h2)
            hm = _pad_rows(np.asarray(st.hm2[0]), h2)
            sg = _pad_rows(np.asarray(st.sig2[0]), h2)
            ix = _pad_planes(np.asarray(st.idx2[0]), h2, -1)
            v = np.asarray(st.vis_gids).astype(np.int32)
            # pad with the single overflow slot ng (row dropped by [:ng]);
            # duplicates of ng forbid the unique_indices fast path
            vis = np.concatenate([v, np.full(nvis - len(v), ng, np.int32)])
            return (w1, la1, su1, va1, g, off, w2, la2, su2, hm, sg, ix,
                    vis)

        names = ("win1", "lane1", "sub1", "val1", "gids", "off", "win2",
                 "lane2", "sub2", "hm2", "sig2", "idx2", "vis")
        stacked = {n: np.stack([shard_arrays(st)[i] for st in states])
                   for i, n in enumerate(names)}
        stacked["cb0"] = np.asarray(cb0s, np.int32).reshape(R, 1)

        cb_pad = states[0].cb_pad
        x_len = round_up(max(cb0s[r] * LANES + cb_pad * LANES
                             for r in range(R)) + LANES, R * LANES)

        # x exchange mode: when every shard's column footprint spans only a
        # few owners' x slices (banded/local structure), a ppermute ring of
        # n_rounds moves only what is needed; scattered footprints fall
        # back to one tiled all_gather.  Ring rounds k deliver owner
        # (r - k) mod R, so the round count is the worst backward distance
        # to a needed owner.
        L = x_len // R
        n_bwd = n_fwd = 0
        for r in range(R):
            if sub_nnz[r] == 0:
                continue        # dummy shard: gathers multiply a 0 value
            lo = cb0s[r] * LANES
            hi = lo + cb_pad * LANES
            for o in range(R):
                if o * L < hi and o * L + L > lo:
                    n_bwd = max(n_bwd, max(r - o, 0))
                    n_fwd = max(n_fwd, max(o - r, 0))
        x_mode = "ring" if (R > 1 and n_bwd + n_fwd <= R - 2) else "allgather"

        def put(a):
            return jax.device_put(a, NamedSharding(mesh, P(row_axis)))

        arrays = {n: put(a) for n, a in stacked.items()}
        op = DistXch(
            mesh=mesh, cfg=cfg, n_row=coo.n_row, n_col=coo.n_col,
            nnz=coo.nnz, R=R, rows_per=rows_per, row0s=tuple(row0s),
            x_mode=x_mode, n_rounds=(n_bwd, n_fwd),
            m1=m1_common,
            m2=states[0].m2, t1=t1, t2=t2, kblk=kblk,
            p_oh=states[0].p_oh, gb=gb, ng=ng, p1=p1, cb_pad=cb_pad,
            x_len=x_len, arrays=arrays)
        op._jitted = op._build(row_axis)
        return op

    def _build(self, row_axis: str):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        mesh = self.mesh
        rows_per, ng, gb = self.rows_per, self.ng, self.gb
        m1, m2, t1, t2, p_oh = self.m1, self.m2, self.t1, self.t2, self.p_oh
        p1, cb_pad = self.p1, self.cb_pad

        from ..ops.pallas.xch import xch_mul, xch_route4

        x_mode, n_rounds, R = self.x_mode, self.n_rounds, self.R
        x_len = self.x_len

        def _assemble_x(cb0, x_loc):
            fp0 = cb0[0, 0] * LANES
            if x_mode != "ring":
                x_all = jax.lax.all_gather(x_loc, row_axis, tiled=True)
                return jax.lax.dynamic_slice(
                    x_all, (fp0,), (cb_pad * LANES,)).reshape(cb_pad, LANES)
            # bidirectional ppermute halo ring: the backward chain's round
            # k delivers owner me-k, the forward chain's owner me+k (the
            # balanced row cuts misalign shards and x owners, so needed
            # owners sit on BOTH sides).  Slices land in a footprint
            # buffer guard-padded by L each side; unneeded owners clamp
            # into discarded space and are masked off.
            L = x_len // R
            me = jax.lax.axis_index(row_axis)
            buf = jnp.zeros((L + cb_pad * LANES + L,), x_loc.dtype)
            n_bwd, n_fwd = n_rounds

            def _deposit(buf, xk, owner):
                pos = owner * L - fp0 + L
                upd = jax.lax.dynamic_update_slice(buf, xk, (pos,))
                needed = jnp.logical_and(
                    owner * L < fp0 + cb_pad * LANES, owner * L + L > fp0)
                return jnp.where(needed, upd, buf)

            buf = _deposit(buf, x_loc.reshape(-1), me)
            xk = x_loc.reshape(-1)
            for k in range(1, n_bwd + 1):
                xk = jax.lax.ppermute(
                    xk, row_axis, [(i, (i + 1) % R) for i in range(R)])
                buf = _deposit(buf, xk, (me - k) % R)
            xk = x_loc.reshape(-1)
            for k in range(1, n_fwd + 1):
                xk = jax.lax.ppermute(
                    xk, row_axis, [(i, (i - 1) % R) for i in range(R)])
                buf = _deposit(buf, xk, (me + k) % R)
            return buf[L: L + cb_pad * LANES].reshape(cb_pad, LANES)

        def local(win1, lane1, sub1, val1, gids, off, win2, lane2, sub2,
                  hm2, sig2, idx2, vis, cb0, x_loc):
            x_tab = _assemble_x(cb0, x_loc)
            prod = xch_mul(win1[0], lane1[0], sub1[0], val1[0], x_tab,
                           m1, t1)
            prod3 = prod.reshape(1, p1, LANES)
            cs = jnp.zeros_like(gids[0])
            out = xch_route4(gids[0], off[0], cs, win2[0], lane2[0],
                             sub2[0], hm2[0], sig2[0], idx2[0], prod3,
                             int(vis.shape[1]), gb, m2, m2, t2, p_oh)
            out3 = out.reshape(vis.shape[1], gb * LANES)
            yg = jnp.zeros((ng + 1, gb * LANES), out.dtype)
            yg = yg.at[vis[0]].set(out3, mode="drop")
            return yg[:ng].reshape(1, rows_per)

        spec = P(row_axis)
        sharded = shard_map(
            local, mesh=mesh,
            in_specs=(spec,) * 14 + (spec,),
            out_specs=spec,
            check_vma=False,
        )

        n_row = self.n_row
        row0s = self.row0s
        R = self.R

        @jax.jit
        def run(arrays, x):
            xp = jnp.zeros((self.x_len,), x.dtype).at[: x.shape[0]].set(x)
            y_sh = sharded(arrays["win1"], arrays["lane1"], arrays["sub1"],
                           arrays["val1"], arrays["gids"], arrays["off"],
                           arrays["win2"], arrays["lane2"], arrays["sub2"],
                           arrays["hm2"], arrays["sig2"], arrays["idx2"],
                           arrays["vis"], arrays["cb0"], xp)
            y_sh = y_sh.reshape(R, rows_per)
            # balanced cuts: shard spans differ — R static update slices
            y = jnp.zeros((n_row + rows_per,), y_sh.dtype)
            for r in range(R):
                take = min(rows_per, n_row + rows_per - row0s[r])
                y = jax.lax.dynamic_update_slice(y, y_sh[r][:take],
                                                 (row0s[r],))
            return y[:n_row]

        return run

    def __call__(self, x):
        import jax.numpy as jnp

        x = jnp.asarray(np.asarray(x, dtype=self.cfg.np_dtype))
        return self._jitted(self.arrays, x)

    def spmm(self, X):
        import jax
        import jax.numpy as jnp

        X = jnp.asarray(np.asarray(X, dtype=self.cfg.np_dtype))
        return jax.vmap(self._jitted, in_axes=(None, 1), out_axes=1)(
            self.arrays, X)
