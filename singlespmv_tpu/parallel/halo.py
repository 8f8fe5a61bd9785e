"""Halo-exchange distributed SpMV — comm/compute-overlapped row partitioning.

The north-star asks for "halo segments of the dense vector exchanged ...
overlapped with local SpMV compute" (BASELINE.md north-star; the reference
itself is single-node, SURVEY §2.6).  ``DistSpMV`` (parallel.spmv) all-gathers
the whole x then computes — strictly sequential, and the gather volume is
n_col per shard regardless of structure.  This module is the structured
alternative:

- x is sharded over the 1-D row mesh; each entry's column has an *owner*.
- At convert time every shard's stream splits into a **local** stream (columns
  it owns) and a **halo** stream (columns it needs from others), and the
  pairwise column needs are compiled into static ppermute *rounds*: round d
  ships, for every shard j, exactly the x entries shard (j+d)%R needs from j —
  empty rounds are dropped at convert (a banded matrix needs only d ∈ {1, R−1};
  a scattered one degrades towards all-to-all).
- The jitted step issues all ppermute sends first, then computes the local
  stream's SpMV, then the halo stream's: XLA's async collectives overlap the
  ICI transfer with the local compute (on the CPU test backend collectives are
  synchronous — the win there is the reduced exchange *volume*).

Comm volume: Σ_d H_d values per shard instead of n_col — for a bandwidth-w
banded matrix that is O(w), the classic halo exchange.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import Config
from ..core.types import COOMatrix, cdiv, round_up
from ..formats import ss as ss_format
from ..ops.segsum import (combine_partials, extract_run_partials,
                          segmented_scan_inclusive)


@dataclasses.dataclass
class HaloSpMV:
    """Halo-exchanged, overlap-scheduled distributed SpMV over a 1-D row mesh.

    Build with ``HaloSpMV.convert(coo, cfg, mesh)``; apply with ``op(x)``.
    """

    mesh: object
    cfg: Config
    n_row: int
    n_col: int
    nnz: int
    R: int
    rows_per: int
    xs: int                   # x slice length per shard
    rounds: tuple             # (d, H_d) pairs, empty rounds dropped
    local_nnz: int
    halo_nnz: int
    # stacked device arrays, leading dim R
    local_state: dict         # field -> (R, ...) arrays (SS stream, n_col=xs)
    halo_state: dict          # field -> (R, ...) arrays (n_col=halo_total)
    send_idx: tuple           # per round: (R, H_d) int32 local x positions
    perm: object              # (R, rows_per) global row ids
    _jitted: object = None

    @staticmethod
    def convert(coo: COOMatrix, cfg: Config, mesh, *,
                row_axis: str = "row") -> "HaloSpMV":
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        R = axes.get(row_axis, 1)

        # Contiguous equal-row partition — halo exchange trades the balanced
        # snake-deal (DistSpMV) for row locality: a banded matrix's shard then
        # needs only its neighbours' x slices (few, small rounds).  The nnz
        # imbalance a contiguous split can introduce is absorbed by the
        # uniform (max-shard) stream padding; scattered matrices that need
        # balance more than locality keep using DistSpMV.
        rows_per = cdiv(max(coo.n_row, 1), R)
        perm = (np.arange(R)[:, None] * rows_per
                + np.arange(rows_per)[None, :]).astype(np.int64)
        perm[perm >= coo.n_row] = coo.n_row          # ghost slots
        xs = cdiv(max(coo.n_col, 1), R)

        e_s = np.minimum(coo.row // rows_per, R - 1).astype(np.int64)
        e_lr = coo.row - e_s * rows_per
        e_owner = np.minimum(coo.col // xs, R - 1).astype(np.int64)

        # --- pairwise needs: unique cols shard s requires from owner o ------
        needs = {}
        for s in range(R):
            in_s = e_s == s
            for o in range(R):
                if o == s:
                    continue
                m = in_s & (e_owner == o)
                needs[(s, o)] = np.unique(coo.col[m]) if m.any() else \
                    np.zeros(0, dtype=np.int64)

        # rounds: d delivers owner (s-d)%R -> s; drop globally-empty rounds
        rounds = []
        for d in range(1, R):
            h_d = max((needs[(s, (s - d) % R)].size for s in range(R)),
                      default=0)
            if h_d > 0:
                rounds.append((d, int(h_d)))
        offsets = {}
        off = 0
        for d, h_d in rounds:
            offsets[d] = off
            off += h_d
        halo_total = max(off, 1)

        # send_idx[d][j] = local x positions j ships to (j+d)%R
        send_idx = []
        for d, h_d in rounds:
            arr = np.zeros((R, h_d), dtype=np.int64)
            for j in range(R):
                cols_need = needs[((j + d) % R, j)]
                arr[j, : cols_need.size] = cols_need - j * xs
            send_idx.append(arr)

        # --- split each shard's triplets into local / halo streams ---------
        def pack(states, n_col_sub):
            h_needed = max(st.h for st in states)
            r_needed = max(st.r_max for st in states)
            rebuilt = [
                ss_format.build_stream(
                    COOMatrix(n_row=rows_per, n_col=n_col_sub,
                              row=st._rows, col=st._cols, val=st._vals),
                    cfg, min_h=h_needed, min_r_max=r_needed)
                for st in states
            ]
            return {f: np.stack([np.asarray(getattr(st, f)) for st in rebuilt])
                    for f in ("col", "val", "heads", "end_pos", "rank_rows")}

        class _Sub:
            def __init__(self, rows, cols, vals, n_col_sub):
                self._rows, self._cols, self._vals = rows, cols, vals
                st = ss_format.build_stream(
                    COOMatrix(n_row=rows_per, n_col=n_col_sub,
                              row=rows, col=cols, val=vals), cfg)
                self.h, self.r_max = st.h, st.r_max

        local_subs, halo_subs = [], []
        ldt = coo.row.dtype
        for s in range(R):
            in_s = e_s == s
            loc = in_s & (e_owner == s)
            rem = in_s & ~loc
            lr_l = e_lr[loc]
            lc_l = (coo.col[loc] - s * xs).astype(ldt)
            o_l = np.lexsort((lc_l, lr_l))
            local_subs.append(_Sub(lr_l[o_l].astype(ldt), lc_l[o_l],
                                   coo.val[loc][o_l], xs))
            lr_h = e_lr[rem]
            own_h = e_owner[rem]
            cols_h = coo.col[rem]
            # halo coordinate = round offset + rank of col in the (sorted)
            # per-owner needs list — vectorized searchsorted per owner
            hc = np.zeros(lr_h.size, dtype=np.int64)
            for o in range(R):
                if o == s:
                    continue
                mo = own_h == o
                if mo.any():
                    base = offsets[(s - o) % R]
                    hc[mo] = base + np.searchsorted(needs[(s, o)], cols_h[mo])
            o_h = np.lexsort((hc, lr_h))
            halo_subs.append(_Sub(lr_h[o_h].astype(ldt),
                                  hc[o_h].astype(ldt),
                                  coo.val[rem][o_h], halo_total))

        local_state = pack(local_subs, xs)
        halo_state = pack(halo_subs, halo_total)

        spec = P(row_axis)
        def put(a):
            return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

        op = HaloSpMV(
            mesh=mesh, cfg=cfg, n_row=coo.n_row, n_col=coo.n_col,
            nnz=coo.nnz, R=R, rows_per=rows_per, xs=xs,
            rounds=tuple(rounds), local_nnz=int((e_owner == e_s).sum()),
            halo_nnz=int((e_owner != e_s).sum()),
            local_state={k: put(v) for k, v in local_state.items()},
            halo_state={k: put(v) for k, v in halo_state.items()},
            send_idx=tuple(put(a) for a in send_idx),
            perm=jax.device_put(jnp.asarray(perm.reshape(-1)),
                                NamedSharding(mesh, P())),
        )
        op._jitted = op._build(row_axis)
        return op

    def _build(self, row_axis: str):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        mesh, R, xs = self.mesh, self.R, self.xs
        rows_per, rounds = self.rows_per, self.rounds
        use_pallas = (self.cfg.variant == "optimized"
                      and jax.default_backend() == "tpu")

        def ss_apply(st, x_all):
            col, val = st["col"][0], st["val"][0]
            heads, end_pos = st["heads"][0], st["end_pos"][0]
            rank_rows = st["rank_rows"][0]
            prod = val * x_all[col]
            if use_pallas:
                from ..ops.pallas.segscan import segmented_scan_tiles

                scanned = segmented_scan_tiles(prod, heads)
            else:
                scanned = segmented_scan_inclusive(prod, heads.astype(bool))
            partials = extract_run_partials(scanned, end_pos)
            return combine_partials(partials, rank_rows, rows_per)

        perm_pairs = {d: [(j, (j + d) % R) for j in range(R)]
                      for d, _ in rounds}

        def body(local_st, halo_st, send_idx, x_loc):
            # 1) issue all halo sends first — async collectives start here
            recvs = []
            for (d, h_d), sidx in zip(rounds, send_idx):
                send = x_loc[sidx[0]]
                recvs.append(jax.lax.ppermute(send, row_axis,
                                              perm=perm_pairs[d]))
            # 2) local compute overlaps the in-flight exchanges
            y = ss_apply(local_st, x_loc)
            # 3) halo compute consumes the received segments
            if recvs:
                x_halo = jnp.concatenate(recvs) if len(recvs) > 1 else recvs[0]
                y = y + ss_apply(halo_st, x_halo)
            return y[None]

        grid = P(row_axis)
        sharded = shard_map(
            body, mesh=mesh,
            in_specs=({k: grid for k in self.local_state},
                      {k: grid for k in self.halo_state},
                      tuple(grid for _ in self.send_idx), grid),
            out_specs=grid,
            check_vma=False,
        )

        n_col_pad = xs * R

        @jax.jit
        def run(local_st, halo_st, send_idx, perm, x):
            xp = jnp.zeros((n_col_pad,), x.dtype).at[: x.shape[0]].set(x)
            y_perm = sharded(local_st, halo_st, send_idx, xp).reshape(-1)
            # contiguous partition: shard-order concat IS global row order —
            # no inverse-permutation scatter needed (perm kept for inspection)
            return y_perm[: self.n_row]

        return run

    def __call__(self, x):
        import jax.numpy as jnp

        x = jnp.asarray(np.asarray(x, dtype=self.cfg.np_dtype))
        return self._jitted(self.local_state, self.halo_state, self.send_idx,
                            self.perm, x)

    @property
    def exchange_elems(self) -> int:
        """Per-shard exchanged x elements per SpMV (vs n_col for all-gather)."""
        return sum(h for _, h in self.rounds)
