"""BKT — two-phase bucketed format: the scatter-free scattered-matrix path.

No reference analog (the reference's CPU caches make scattered access cheap; its
own random-* results are 0.1–2.2 GFLOPS, BASELINE.md).  On TPU both XLA gather and
scatter run ~0.14 G el/s, so BKT routes everything through the three fast motions —
streaming, 128-lane ``take_along_axis``, and MXU matmuls (see ops.pallas.bucket):

  stage A: products in (column-group)-major bucket order (m-way lane-gather of x);
  stage B: per row-unit MXU prefix sum + K static masked lane-gathers → row sums.

Buckets are (column group, row unit) cells of depth S; grouped mode
(row_group=1024, the scattered-suite mode) fixes **S = 128, so a bucket IS one
128-lane stream row** — Mosaic cannot repack ragged (·, S) rows into lanes, and
with S=128 stage B slices slabs at 215 G elem/s (measured) with zero data
movement.  Occupancy is kept near the row size by **packing up to m col-blocks
per group** (bin-packed by load at convert; stage A m-way-selects the x row per
slot), instead of padding shallow buckets m-fold.  Buckets that still overflow
spill into *ghost groups* (same member columns, fresh rows), and over-chained
collision runs respill the same way — no side path: one pair of kernels covers
everything.

Convert computes every data-dependent index on the host; padding is bounded by
``PAD_LIMIT`` (beyond it — hyper-sparse giants — convert refuses and `auto`
falls back to csr/css).
"""
from __future__ import annotations

import math

import numpy as np

from ..config import Config
from ..core import hostmem as hm
from ..core.types import COOMatrix, cdiv, round_up
from .base import device_put, pytree_dataclass

LANES = 128
W_A = 1024             # stage-A tile width (ops.pallas.bucket.W_A)
PAD_LIMIT = 16.0       # max padded-slots / nnz before refusing
MIN_SLOTS = 1 << 16    # small matrices are always allowed
K_MAX = 32             # absolute collision-chain cap
IDX_VMEM_BUDGET = 4 << 20   # stage-B idx block bytes (double-buffered by the
                            # pipeline out of ~16 MB VMEM)
CB_CHUNK_MAX = 384     # stage-B col-group chunk (block (ch, 8, 128) ~1.5 MB)
GROUP_FILL_TARGET = 72  # pack col-blocks until expected bucket fill ≥ this


def k_cap(g: int, itemsize: int, floor: int = 4) -> int:
    """VMEM-aware collision-chain cap: idx block = K·G·128·itemsize bytes."""
    return max(floor, min(K_MAX, IDX_VMEM_BUDGET // (g * 128 * itemsize)))


def balance_map(rows: np.ndarray, RB: int) -> np.ndarray:
    """Lane-preserving balance permutation: per lo class, deal rows (heaviest
    first) to the least-loaded row-block.  Returns (RB, 128) new_rb_of.
    Shared by convert() and estimate() — the estimate MUST model the balanced
    bucket depths or it overstates S by the row-skew factor."""
    w = np.bincount(rows, minlength=RB * LANES).reshape(RB, LANES)
    new_rb_of = np.empty((RB, LANES), dtype=np.int64)
    loads = np.zeros(RB, dtype=np.int64)
    for cls in range(LANES):          # greedy: heaviest → least-loaded rb
        order_desc = np.argsort(-w[:, cls], kind="stable")
        targets = np.argsort(loads, kind="stable")
        new_rb_of[order_desc, cls] = targets
        loads[targets] += w[order_desc, cls]
    return new_rb_of


def _pick_m(nnz: int, n_buckets: int, cfg: Config) -> int:
    """Column-group width: pack col-blocks until the expected bucket fill
    reaches GROUP_FILL_TARGET (m wide lane-gathers on m-fold fewer slots beat
    one gather on m-fold padding — stage B scales with slots)."""
    if cfg.bkt_group_cols:
        return int(cfg.bkt_group_cols)
    fill = nnz / max(n_buckets, 1)
    m = 1
    while m < 8 and fill * m < GROUP_FILL_TARGET:
        m *= 2
    return m


def _pack_columns(col_load: np.ndarray, m: int) -> np.ndarray:
    """Serpentine-deal columns (sorted by load, heaviest first) into
    ceil(CB/m) groups of m — pairs heavy with light so group loads even out.
    Returns (n_grp, m) member table (tail padded with the last column)."""
    CB = len(col_load)
    n_grp = cdiv(CB, m)
    order = np.argsort(-col_load, kind="stable")
    pad = n_grp * m - CB
    if pad:
        order = np.concatenate([order, np.repeat(order[-1:], pad)])
    members = np.empty((n_grp, m), dtype=np.int32)
    for j in range(m):                # serpentine: heavy rounds alternate ends
        blk = order[j * n_grp:(j + 1) * n_grp]
        members[:, j] = blk if j % 2 == 0 else blk[::-1]
    return members


def _plan_s(s_base: int, ru: int) -> int:
    """Grouped mode is fixed at S=128 (a bucket IS one stream row; Mosaic
    cannot lower ragged (·, S) row repacks — the S=128 slice runs at
    215 G elem/s, measured).  ru=1 rounds S to 128-multiples so its XLA
    relayout is row-granular (142 G elem/s measured vs 3-6 for ragged)."""
    return LANES if ru == 8 else round_up(s_base, LANES)


def _ghost_counts(counts2d: np.ndarray, S: int) -> np.ndarray:
    """Ghost groups per original group: the deepest bucket's overflow,
    in units of S (each ghost group serves every row unit)."""
    excess = np.maximum(counts2d - S, 0)
    return (-(-excess // S)).max(axis=1)


def _align_groups(g_tot: int, NU_pad: int, S: int, ru: int):
    """N ≡ 0 (mod 8·W_A) so the stage-A stream tiles evenly; grouped mode
    additionally splits the group axis into VMEM-sized chunks (stage-B
    output accumulates over them).  Returns (G_tot, n_chunks)."""
    unit = NU_pad * S
    need = (8 * W_A) // math.gcd(unit, 8 * W_A)
    g_tot = round_up(g_tot, need)
    if ru != 8:
        return g_tot, 1
    n = cdiv(g_tot, CB_CHUNK_MAX)
    while True:
        step = 8 * n                      # chunks of 8-multiples of rows
        lcm = step * need // math.gcd(step, need)
        c = round_up(g_tot, lcm)
        if c // n <= CB_CHUNK_MAX:
            return c, n
        n = cdiv(c, CB_CHUNK_MAX)


def estimate(coo: COOMatrix, cfg: Config) -> dict:
    """Cheap convert-free plan: slots / S / m / ghosts — used by formats.auto.

    Mirrors convert()'s planning math (same counts, packing, alignment) so
    auto never picks a bkt that convert would then refuse.
    """
    ru = max(1, int(cfg.bkt_row_group) // LANES)
    RB = cdiv(max(coo.n_row, 1), LANES)
    CB = cdiv(max(coo.n_col, 1), LANES)
    NU = cdiv(RB, ru)
    if coo.nnz:
        rows = coo.row.astype(np.int64)
        rb = rows // LANES
        if bool(cfg.bkt_balance) and RB <= 2048:
            rb = balance_map(rows, RB)[rb, rows % LANES]
        cb = coo.col.astype(np.int64) // LANES
        m = _pick_m(coo.nnz, CB * NU, cfg) if ru == 8 else 1
        if m > 1:
            col_load = np.bincount(cb, minlength=CB)
            members = _pack_columns(col_load, m)
            grp_of = np.zeros(CB, dtype=np.int64)
            for j in range(m):
                grp_of[members[:, j]] = np.arange(members.shape[0])
            gb = grp_of[cb]
        else:
            gb = cb
        n_grp = cdiv(CB, m)
        counts0 = np.bincount(gb * NU + rb // ru, minlength=n_grp * NU)
    else:
        m, n_grp = 1, CB
        counts0 = np.zeros(n_grp * NU, dtype=np.int64)
    nz = counts0[counts0 > 0]
    s_need = int(counts0.max(initial=1))
    s_cap = int(np.percentile(nz, cfg.bkt_cap_pct)) if nz.size else 1
    s_base = max(min(s_need, max(s_cap, 1)), 1)

    NU_pad = round_up(NU, 8)
    S = _plan_s(s_base, ru)
    gpc = _ghost_counts(counts0.reshape(n_grp, NU), S)
    if ru == 1:
        ghost_total = _align_groups(n_grp + int(gpc.sum()), NU_pad, S,
                                    ru)[0] * NU_pad * S
        S_d = _plan_s(s_need, ru)
        deep_total = _align_groups(n_grp, NU_pad, S_d, ru)[0] * NU_pad * S_d
        if deep_total < ghost_total:
            S = S_d
            gpc = np.zeros(n_grp, dtype=np.int64)
    g_tot, _nch = _align_groups(n_grp + int(gpc.sum()), NU_pad, S, ru)
    n = g_tot * NU_pad * S
    k_est = 2 if ru == 8 else max(1, min(8, 128 // max(1, S)))
    feasible = n <= max(PAD_LIMIT * max(coo.nnz, 1), MIN_SLOTS)
    return {"slots": n, "s": S, "m": m, "rb_pad": NU_pad * ru,
            "g_tot": g_tot, "ghosts": int(gpc.sum()), "k_est": k_est,
            "feasible": feasible}


@pytree_dataclass(meta=("n_row", "n_col", "nnz", "rb_pad", "cb", "g_tot",
                        "s", "g", "k", "m", "n_slots", "n_ghost", "balanced",
                        "row_group", "n_chunks"))
class BKTState:
    n_row: int
    n_col: int
    nnz: int
    rb_pad: int
    cb: int           # original col-blocks (x table rows)
    g_tot: int        # column groups incl. ghost groups + alignment pads
    s: int            # bucket depth (128 in grouped mode)
    g: int            # sublanes per row-unit slab = g_tot·s / 128
    k: int            # collision chain depth
    m: int            # col-blocks packed per group (stage-A m-way select)
    n_slots: int
    n_ghost: int
    members: object   # (H·8·m,) int32 — per stage-A sublane row, m x rows
    mem_tab: object   # (g_tot, m) int32 — group → member col-blocks (to_coo)
    lane: object      # (H, W) int8 — in-block column (col − cb·128)
    src: object       # (H, W) int8 — member index per slot (m > 1)
    val: object       # (H, W) values
    hm1: object       # int8 — lane of run head − 1 (−1: row start)
    idx: object       # int8 (ru=1) / int16 σ·128+lane (grouped); <0 masked
    lo_a: object      # (H, W) int32 — row-local per slot (to_coo only)
    balanced: bool = False
    src_lane: object = None   # (128, RB_pad) int32 — balance-inverse routing
    src_chunk: object = None
    row_group: int = 128      # rows per bucket unit (128 or 1024); 1024 uses
                              # the grouped stage-B kernel (scattered mode)
    n_chunks: int = 1         # grouped stage-B col-group chunking (VMEM)


def convert(coo: COOMatrix, cfg: Config) -> BKTState:
    n_row, n_col, nnz = coo.n_row, coo.n_col, coo.nnz

    ru = max(1, int(cfg.bkt_row_group) // LANES)   # 128-row blocks per bucket
    if ru not in (1, 8):
        raise ValueError("bkt_row_group must be 128 or 1024")
    RL = ru * LANES                                 # rows per bucket unit
    RB = cdiv(max(n_row, 1), LANES)
    CB = cdiv(max(n_col, 1), LANES)
    NU = cdiv(RB, ru)                               # bucket row units

    rows = hm.astype(coo.row, np.int64)
    cols = hm.astype(coo.col, np.int64)
    rb = rows // LANES
    cb = cols // LANES
    lo = rows % LANES

    # --- lane-preserving balance permutation: within each lo class, spread
    # heavy rows across row-blocks so bucket depths even out (the bkt analog of
    # CSR5's load balancing / the reference JDS row sort).  Inverted after
    # stage B by a static Pallas lane shuffle (ops.pallas.bucket.lane_unpermute).
    balanced = bool(cfg.bkt_balance) and RB <= 2048 and nnz > 0
    new_rb_of = None
    if balanced:
        new_rb_of = balance_map(rows, RB)
        rb = new_rb_of[rb, lo]

    ub = rb // ru                                  # bucket row-unit index
    rl = (rb % ru) * LANES + lo                    # row-local within the unit

    # --- column groups: pack m col-blocks per group (serpentine by load) -----
    m = _pick_m(nnz, CB * NU, cfg) if ru == 8 else 1
    if m > 1:
        col_load = np.bincount(cb, minlength=CB)
        base_members = _pack_columns(col_load, m)
        grp_of = np.zeros(CB, dtype=np.int64)
        j_of = np.zeros(CB, dtype=np.int8)
        for j in range(m):
            grp_of[base_members[:, j]] = np.arange(base_members.shape[0])
            j_of[base_members[:, j]] = j
        gb = grp_of[cb]
        j_e0 = j_of[cb]
        n_grp = base_members.shape[0]
    else:
        base_members = np.arange(CB, dtype=np.int32).reshape(CB, 1)
        gb = cb
        j_e0 = np.zeros(nnz, dtype=np.int8)
        n_grp = CB

    # S: bucket depth; dense buckets spill into ghost groups (same members,
    # fresh stream rows).
    counts0 = np.bincount(gb * NU + ub, minlength=n_grp * NU) if nnz else \
        np.zeros(n_grp * NU, dtype=np.int64)
    nz_counts = counts0[counts0 > 0]
    s_need = int(counts0.max(initial=1))
    s_cap = int(np.percentile(nz_counts, cfg.bkt_cap_pct)) if nz_counts.size \
        else 1
    s_base = max(min(s_need, max(s_cap, 1)), 1)

    NU_pad = round_up(NU, 8)
    S = _plan_s(s_base, ru)
    gpc = _ghost_counts(counts0.reshape(n_grp, NU), S)
    if ru == 1:
        # deep-S alternative: cheaper when overflow concentrates in a few
        # dense buckets (a ghost group is a full NU_pad·S panel)
        ghost_total = _align_groups(n_grp + int(gpc.sum()), NU_pad, S,
                                    ru)[0] * NU_pad * S
        S_d = _plan_s(s_need, ru)
        deep_total = _align_groups(n_grp, NU_pad, S_d, ru)[0] * NU_pad * S_d
        if deep_total < ghost_total:
            S = S_d
            gpc = np.zeros(n_grp, dtype=np.int64)
    RB_pad = NU_pad * ru

    # ---- ghost-group bookkeeping ---------------------------------------------
    ghost_base = np.zeros(n_grp + 1, dtype=np.int64)
    np.cumsum(gpc, out=ghost_base[1:])
    next_ghost = n_grp + int(ghost_base[-1])   # first free ghost group index
    ghost_parent = [np.repeat(np.arange(n_grp, dtype=np.int64), gpc)]

    # Inverse routing for the balance permutation, sized to the final RB_pad:
    # out[lo, rb_orig] reads y_tab[new_rb_of[rb_orig, lo], lo]; identity on pads.
    if balanced:
        rbu = round_up(RB_pad, LANES)
        src_col = np.broadcast_to(np.arange(rbu, dtype=np.int32),
                                  (LANES, rbu)).copy()
        src_col[:, :RB] = new_rb_of.T
        src_lane = device_put(src_col % LANES)
        src_chunk = device_put(src_col // LANES)
    else:
        src_lane = device_put(np.zeros((LANES, LANES), np.int32))
        src_chunk = device_put(np.zeros((LANES, LANES), np.int32))

    # ---- entry arrays, bucket-major, row-local-sorted within bucket ---------
    bucket0 = gb * NU_pad + ub
    order = np.lexsort((cols, rl, bucket0)) if nnz else np.zeros(0, np.int64)
    ogrp = gb[order]                   # original group per entry
    ub_e = ub[order]
    rl_e = rl[order]
    col_e = cols[order]
    j_e = j_e0[order]
    val_e = hm.astype(coo.val, cfg.np_dtype)[order]
    counts = np.bincount(bucket0, minlength=n_grp * NU_pad) if nnz else \
        np.zeros(n_grp * NU_pad, dtype=np.int64)
    start = hm.zeros(n_grp * NU_pad, np.int64)
    np.cumsum(counts[:-1], out=start[1:])
    seq = hm.arange(nnz) - start[bucket0[order]]
    bkt_grp = ogrp.copy()              # bucket's group index (ghosts re-home)

    # bucket-cap overflow -> round-0 ghost groups: same unit, seq mod S
    over = seq >= S
    if over.any():
        bkt_grp[over] = n_grp + ghost_base[ogrp[over]] + (seq[over] - S) // S
        seq = np.where(over, (seq - S) % S, seq)

    def assign_ghosts(mask):
        """Re-home masked entries into fresh ghost groups (per parent group,
        so member tables carry over).  Returns the number of new groups."""
        nonlocal bkt_grp, seq, next_ghost
        idx_m = np.nonzero(mask)[0]
        # order by rl%128 first (same-rl contiguous, RL-1 last): collision
        # mates — runs sharing a bin lane — land in different stream rows
        # instead of re-colliding in the ghost buckets
        rm = rl_e[idx_m]
        sub = np.lexsort((rm, rm % LANES, rm == RL - 1,
                          ub_e[idx_m], ogrp[idx_m]))
        idx_m = idx_m[sub]
        key = ogrp[idx_m] * NU_pad + ub_e[idx_m]
        cnts = np.bincount(key, minlength=n_grp * NU_pad)
        # every masked entry needs fresh capacity: ceil(cnt/S), max over units
        gpc2 = (-(-cnts.reshape(n_grp, NU_pad) // S)).max(axis=1)
        base2 = np.zeros(n_grp + 1, dtype=np.int64)
        np.cumsum(gpc2, out=base2[1:])
        st2 = np.zeros(n_grp * NU_pad, dtype=np.int64)
        np.cumsum(cnts[:-1], out=st2[1:])
        within = np.arange(len(idx_m)) - st2[key]
        bkt_grp[idx_m] = next_ghost + base2[ogrp[idx_m]] + within // S
        seq[idx_m] = within % S
        ghost_parent.append(np.repeat(np.arange(n_grp, dtype=np.int64), gpc2))
        next_ghost += int(base2[-1])
        return int(base2[-1])

    # ---- entry-space runs + collision chains (with over-chain respill) ------
    # A run = one (bucket, rl) group, split at 128-slot stream-row boundaries
    # (p = bkt_grp·S + seq is the slab-stream position).  K is a Poisson-tail
    # max over ~N/128 cells, so instead of sizing idx by the max, runs deeper
    # than K_TARGET respill into ghost groups (fresh rows, shallow chains).
    K_TARGET = 4 if ru == 8 else 8   # grouped stage-B compute scales with K,
                                     # but tighter caps make the respill loop
                                     # diverge (measured: K=2 → +50% ghosts)

    def compute_runs():
        o2 = np.lexsort((seq, rl_e, ub_e, bkt_grp))
        bke = bkt_grp[o2] * NU_pad + ub_e[o2]
        rle = rl_e[o2]
        sq = seq[o2]
        n = len(o2)
        new_g = np.empty(n, dtype=bool)
        if n:
            new_g[0] = True
            new_g[1:] = (bke[1:] != bke[:-1]) | (rle[1:] != rle[:-1])
        first = np.nonzero(new_g)[0]
        last = np.append(first[1:] - 1, n - 1) if len(first) else first
        gbg = bkt_grp[o2[first]]
        ubg = ub_e[o2[first]]
        rlg = rle[first]
        p0 = gbg * S + sq[first]
        # rl == RL-1 merges with the bucket's trailing pads -> extend to end
        p1 = gbg * S + np.where(rlg == RL - 1, S - 1, sq[last])
        n_c = (p1 >> 7) - (p0 >> 7)            # stream-row crossings
        tot = n_c + 1
        offs = np.zeros(len(first) + 1, dtype=np.int64)
        np.cumsum(tot, out=offs[1:])
        rep = np.repeat(np.arange(len(first)), tot)
        j = np.arange(int(offs[-1])) - offs[:-1][rep]
        end_p = np.minimum(p1[rep], ((p0[rep] >> 7) + 1 + j) * 128 - 1)
        r_ub = ubg[rep]
        r_prow = end_p >> 7
        r_el = end_p & 127
        r_bin = rlg[rep]
        key = (r_ub << 32) + r_prow * 128 + r_bin % LANES
        ord2 = np.lexsort((r_el, key))
        key_s = key[ord2]
        is_first = np.empty(len(key_s), dtype=bool)
        if len(key_s):
            is_first[0] = True
            is_first[1:] = key_s[1:] != key_s[:-1]
        grp2 = np.cumsum(is_first) - 1
        fpos = np.nonzero(is_first)[0]
        chain = (np.arange(len(key_s)) - fpos[grp2]) if len(key_s) else \
            np.zeros(0, np.int64)
        return (r_ub[ord2], r_prow[ord2], r_el[ord2], r_bin[ord2], chain,
                rep[ord2], o2, new_g, p0, first)

    for _ in range(3):
        (r_ub, r_prow, r_el, r_bin, chain, run_grp, o2, new_g, p0,
         first) = compute_runs()
        if int(chain.max(initial=0)) < K_TARGET:
            break
        bad_groups = np.unique(run_grp[chain >= K_TARGET])
        gi = np.cumsum(new_g) - 1              # group id per sorted entry
        bad_mask = np.zeros(nnz, dtype=bool)
        bad_mask[o2] = np.isin(gi, bad_groups)
        assign_ghosts(bad_mask)
    K = int(chain.max(initial=0)) + 1
    itemsize = 2 if ru == 8 else 1

    # ---- final geometry -------------------------------------------------------
    G_tot, n_chunks = _align_groups(next_ghost, NU_pad, S, ru)
    n_ghost = G_tot - n_grp
    N = G_tot * NU_pad * S
    if N > max(PAD_LIMIT * max(nnz, 1), MIN_SLOTS):
        raise ValueError(
            f"bkt: padded grid {N} slots vs nnz {nnz} exceeds PAD_LIMIT — "
            "matrix too hyper-sparse for dense bucketing; use csr/css")
    G = G_tot * S // LANES
    k_lim = k_cap(8 * (G // n_chunks) if ru == 8 else G, itemsize, floor=1)
    if K > k_lim:
        raise ValueError(
            f"bkt: collision chains exceed the VMEM cap ({K} > {k_lim}); "
            f"matrix structure unsuited to bkt_row_group={cfg.bkt_row_group}"
            " — try the other row group or csr/css")

    # group → member col-blocks, ghosts inherit their parent's members
    mem_tab = hm.zeros((G_tot, m), np.int32)
    mem_tab[:n_grp] = base_members
    gp = np.concatenate(ghost_parent) if ghost_parent else \
        np.zeros(0, np.int64)
    mem_tab[n_grp: n_grp + len(gp)] = base_members[gp]

    # ---- slot arrays (stage A) -----------------------------------------------
    slot = (bkt_grp * NU_pad + ub_e) * S + seq
    slot_grp = hm.arange(N) // (NU_pad * S)
    lane_a = hm.zeros(N, np.int64)                   # pad slots: lane 0
    src_a = hm.zeros(N, np.int8)                     # pad slots: member 0
    val_a = hm.zeros(N, cfg.np_dtype)
    rl_slot = hm.full(N, RL - 1, np.int64)           # pad slots sort/merge last
    lane_a[slot] = col_e % LANES
    src_a[slot] = j_e
    val_a[slot] = val_e
    rl_slot[slot] = rl_e

    # m member x-row ids per W_A-slot sublane row (group-pure by alignment)
    row_grp = hm.arange(N // W_A) // ((NU_pad * S) // W_A)
    members_flat = hm.astype(mem_tab[row_grp].reshape(-1), np.int32)

    # ---- stage-B stream row of each run / slot --------------------------------
    def to_brow(u, prow):
        if ru == 1:
            return (u // 8) * (8 * G) + prow * 8 + (u % 8)
        return u * G + prow

    # hm1: per slot, the lane of its run's head − 1 (−1 at lane-0 heads) —
    # stage B computes run totals as MXU-prefix P[end] − P[hm1].  Heads sit at
    # stream-row starts (lane 0), bucket starts, and (bucket, rl) group starts.
    B_rows = NU_pad * G
    heads_b = hm.zeros((B_rows, LANES), bool)
    heads_b[:, 0] = True
    bs_p = hm.arange(G_tot) * S                      # bucket starts, any unit
    bs_units = np.repeat(np.arange(NU_pad, dtype=np.int64), G_tot)
    bs_pp = np.tile(bs_p, NU_pad)
    heads_b[to_brow(bs_units, bs_pp >> 7), bs_pp & 127] = True
    g_units = ub_e[o2[first]]
    heads_b[to_brow(g_units, p0 >> 7), p0 & 127] = True
    lane_grid = np.broadcast_to(np.arange(LANES, dtype=np.int64),
                                (B_rows, LANES))
    head_lane = np.maximum.accumulate(
        np.where(heads_b, lane_grid, -1), axis=1)
    hm1_b = hm.astype(head_lane - 1, np.int8)

    # ---- idx: K static routing planes ----------------------------------------
    er = to_brow(r_ub, r_prow)
    if ru == 1:
        blk = 8 * G
        n_blocks = NU_pad // 8
        idx_full = hm.full((n_blocks * K * blk, LANES), -1, np.int8)
        blk_i = er // blk
        row_in_blk = er % blk
        idx_full[(blk_i * K + chain) * blk + row_in_blk, r_bin] = r_el
    else:
        # slab-major, k-minor planes of (G, 128); entry σ·128 + end_lane
        idx_full = hm.full((NU_pad * K * G, LANES), -1, np.int16)
        slab_i = er // G
        row_in = er % G
        idx_full[(slab_i * K + chain) * G + row_in, r_bin % LANES] = \
            (r_bin // LANES) * LANES + r_el

    return BKTState(
        n_row=n_row, n_col=n_col, nnz=nnz, rb_pad=RB_pad, cb=CB,
        g_tot=G_tot, s=S, g=G, k=K, m=m, n_slots=N, n_ghost=n_ghost,
        members=device_put(members_flat),
        mem_tab=device_put(mem_tab),
        lane=device_put(hm.astype(lane_a.reshape(N // W_A, W_A), np.int8)),
        src=device_put(src_a.reshape(N // W_A, W_A)),
        val=device_put(val_a.reshape(N // W_A, W_A)),
        hm1=device_put(hm1_b.reshape(NU_pad, G, LANES) if ru == 8
                       else hm1_b),
        idx=device_put(idx_full.reshape(NU_pad, K, G, LANES) if ru == 8
                       else idx_full),
        lo_a=device_put(hm.astype(rl_slot.reshape(N // W_A, W_A), np.int32)),
        balanced=balanced, src_lane=src_lane, src_chunk=src_chunk,
        row_group=RL, n_chunks=n_chunks,
    )


def spmv(state: BKTState, x):
    import jax.numpy as jnp

    from ..ops import pallas as pallas_pkg

    if not pallas_pkg.supports(x.dtype):
        raise TypeError(
            "bkt runs Pallas kernels: use float32/bfloat16 on TPU (f64 is "
            "Mosaic-unsupported; pick csr/ss for an f64 XLA path)")
    from ..ops.pallas.bucket import (block_gather_mul, bucket_reduce,
                                     bucket_reduce_grouped)

    RB_pad, CB, G_tot, S, G = (state.rb_pad, state.cb, state.g_tot,
                               state.s, state.g)
    ru = state.row_group // LANES
    NU_pad = RB_pad // ru
    xp = jnp.zeros((CB * LANES,), x.dtype).at[: state.n_col].set(x)
    prod = block_gather_mul(state.members, state.lane, state.src, state.val,
                            xp.reshape(CB, LANES), state.m)
    if ru == 8:
        # stage B reads the group-major grid directly (strided BlockSpec)
        y8 = bucket_reduce_grouped(prod.reshape(G_tot, NU_pad, S),
                                   state.hm1, state.idx, NU_pad,
                                   state.n_chunks)
        y_tab = y8                     # row u·8+σ ↔ rb index u·8+σ
    else:
        # group-major -> j-interleaved rb-major relayout: S is a multiple of
        # 128 so every move is row-granular (XLA transposes at 142 G elem/s)
        flat = prod.reshape(-1)
        sh = S // LANES
        p = (flat.reshape(G_tot, NU_pad // 8, 8, sh, LANES)
             .transpose(1, 0, 3, 2, 4).reshape(NU_pad * G, LANES))
        y_tab = bucket_reduce(p, state.hm1, state.idx, NU_pad)
    if state.balanced:
        from ..ops.pallas.bucket import lane_unpermute

        rbu = state.src_lane.shape[1]
        y_t = jnp.zeros((LANES, rbu), y_tab.dtype).at[:, :RB_pad].set(y_tab.T)
        y_tab = lane_unpermute(y_t, state.src_lane, state.src_chunk)[:, :RB_pad].T
    return y_tab.reshape(-1)[: state.n_row]


def report_fields(state: BKTState, cfg: Config) -> dict:
    return {"RB": state.rb_pad, "ColGroups": state.g_tot,
            "GroupWidth": state.m, "SlotDepth": state.s,
            "ChainK": state.k, "GhostGroups": state.n_ghost,
            "PadFactor": round(state.n_slots / max(state.nnz, 1), 3)}


def traffic_bytes(state: BKTState, cfg: Config) -> int:
    vsz = np.dtype(cfg.dtype).itemsize
    slots = state.n_slots
    isz = 2 if state.row_group // LANES == 8 else 1
    src = slots if state.m > 1 else 0
    stage_a = slots * (1 + 2 * vsz) + src              # lane + src + val + out
    stage_b = slots * (vsz + 1) + state.k * slots * isz  # prod + hm1 + idx
    return stage_a + stage_b + state.n_row * vsz


def to_coo(state: BKTState) -> COOMatrix:
    """Inverse conversion (explicit zeros dropped — they pad like ghosts)."""
    val = np.asarray(state.val).reshape(-1)
    rl = np.asarray(state.lo_a).reshape(-1)
    N = state.n_slots
    ru = state.row_group // LANES
    nu_pad = state.rb_pad // ru
    slot_grp = np.arange(N) // (nu_pad * state.s)
    mem = np.asarray(state.mem_tab).astype(np.int64)
    j = np.asarray(state.src).reshape(-1).astype(np.int64)
    col = (mem[slot_grp, j] * LANES
           + np.asarray(state.lane).reshape(-1).astype(np.int64))
    group = (np.arange(N) % (nu_pad * state.s)) // state.s
    rows = group * state.row_group + rl
    if state.balanced:
        # invert the balance permutation: new_rb -> original rb, per lo class
        s_rb = rows // LANES
        lo = rows % LANES
        src_col = (np.asarray(state.src_chunk).astype(np.int64) * LANES
                   + np.asarray(state.src_lane))        # (128, RB_pad): orig->new
        inv = np.argsort(src_col, axis=1, kind="stable")  # (128, RB_pad): new->orig
        rows = inv[lo, s_rb] * LANES + lo
    keep = val != 0
    rows, col, val = rows[keep], col[keep], val[keep]
    return COOMatrix.from_triplets(state.n_row, state.n_col, rows, col, val,
                                   sort=True, sum_duplicates=True)
