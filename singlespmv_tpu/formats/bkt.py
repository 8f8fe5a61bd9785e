"""BKT — two-phase bucketed format: the scatter-free scattered-matrix path.

No reference analog (the reference's CPU caches make scattered scatter cheap; its
own random-* results are 0.1–2.2 GFLOPS, BASELINE.md).  On TPU both XLA gather and
scatter run ~0.14 G el/s, so BKT routes everything through the two fast motions —
streaming and 128-lane ``take_along_axis`` (see ops.pallas.bucket):

  stage A: products in (col-block)-major bucket order (lane-gather of x);
  transpose: one XLA relayout of the dense (CB, RB, S) slot grid to rb-major;
  stage B: per-row-block lane-scan + K static masked lane-gathers → 128 row sums.

Convert computes every data-dependent index on the host; padding is bounded by
``PAD_LIMIT`` (beyond it — hyper-sparse giants — convert refuses and `auto`
falls back to bsr/css).
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..core.types import COOMatrix, cdiv, round_up
from .base import device_put, pytree_dataclass

LANES = 128
PAD_LIMIT = 16.0       # max padded-slots / nnz before refusing — generous:
                       # pad slots stream at HBM speed, so even 10x-padded bkt
                       # beats scatter-bound alternatives on hyper-sparse inputs
MIN_SLOTS = 1 << 16    # small matrices are always allowed
K_MAX = 32             # absolute collision-chain cap; excess → overflow
IDX_VMEM_BUDGET = 4 << 20   # stage-B idx block bytes (double-buffered by the
                            # pipeline out of ~16 MB VMEM)


def k_cap(g: int, floor: int = 4) -> int:
    """VMEM-aware collision-chain cap: idx block = K·8G·128·4 bytes."""
    return max(floor, min(K_MAX, IDX_VMEM_BUDGET // (8 * g * 128 * 4)))


def balance_map(rows: np.ndarray, RB: int) -> np.ndarray:
    """Lane-preserving balance permutation: per lo class, deal rows (heaviest
    first) to the least-loaded row-block.  Returns (RB, 128) new_rb_of.
    Shared by convert() and estimate() — the estimate MUST model the balanced
    bucket depths or it overstates S by the row-skew factor (round-2 fix:
    the planner was rejecting bkt_g on matrices convert handles at pad ≈ 2)."""
    w = np.bincount(rows, minlength=RB * LANES).reshape(RB, LANES)
    new_rb_of = np.empty((RB, LANES), dtype=np.int64)
    loads = np.zeros(RB, dtype=np.int64)
    for cls in range(LANES):          # greedy: heaviest → least-loaded rb
        order_desc = np.argsort(-w[:, cls], kind="stable")
        targets = np.argsort(loads, kind="stable")
        new_rb_of[order_desc, cls] = targets
        loads[targets] += w[order_desc, cls]
    return new_rb_of


def estimate(coo: COOMatrix, cfg: Config) -> dict:
    """Cheap convert-free plan: slots / S / overflow — used by formats.auto.

    Mirrors convert()'s planning math exactly (same counts, cap, alignment
    candidates) so auto never picks a bkt that convert would then refuse.
    """
    import math

    ru = max(1, int(cfg.bkt_row_group) // LANES)
    RB = cdiv(max(coo.n_row, 1), LANES)
    CB = cdiv(max(coo.n_col, 1), LANES)
    NU = cdiv(RB, ru)
    if coo.nnz:
        rows = coo.row.astype(np.int64)
        rb = rows // LANES
        if bool(cfg.bkt_balance) and RB <= 2048:
            rb = balance_map(rows, RB)[rb, rows % LANES]
        counts0 = np.bincount((coo.col.astype(np.int64) // LANES) * NU
                              + rb // ru, minlength=CB * NU)
    else:
        counts0 = np.zeros(1, dtype=np.int64)
    nz = counts0[counts0 > 0]
    s_need = int(counts0.max(initial=1))
    s_cap = int(np.percentile(nz, cfg.bkt_cap_pct)) if nz.size else 1
    s_base = max(min(s_need, max(s_cap, 1)), 1)

    def plan(u_mult):
        nup = round_up(NU, u_mult)
        align = max(1, 1024 // math.gcd(nup, 1024))
        s = round_up(s_base, align)
        cbp = round_up(CB, 128 // math.gcd(s, 128))
        if ru == 8:   # grouped stage-B blocks are (G, 128): need G % 8 == 0
            cbp = round_up(cbp, 1024 // math.gcd(s, 1024))
        return cbp * nup * s, nup, s, cbp

    n, nu_pad, s, cb_pad = min(plan(m) for m in (8, 64, 128, 256, 1024))
    over = int(np.maximum(nz - s, 0).sum()) if nz.size else 0
    k_est = max(1, min(16, (ru * 128) // max(1, s)))
    feasible = n <= max(PAD_LIMIT * max(coo.nnz, 1), MIN_SLOTS)
    if ru == 8 and cb_pad * s // 128 < 8:
        feasible = False
    return {"slots": n, "s": s, "rb_pad": nu_pad * ru, "cb_pad": cb_pad,
            "overflow": over, "k_est": k_est, "feasible": feasible}


@pytree_dataclass(meta=("n_row", "n_col", "nnz", "rb_pad", "cb_pad", "s", "g",
                        "k", "n_slots", "overflow_nnz", "balanced",
                        "row_group", "max_run"))
class BKTState:
    n_row: int
    n_col: int
    nnz: int
    rb_pad: int
    cb_pad: int
    s: int            # padded bucket depth (capped; dense buckets overflow)
    g: int            # sublanes per rb slab = cb_pad·s / 128
    k: int            # collision chain depth
    n_slots: int
    overflow_nnz: int
    cb_ids: object    # (n_tiles,) int32 — col-block per stage-A tile
    lane: object      # (H, W) int8 — stage-A in-block column (col - cb·128)
    val: object       # (H, W) values
    heads: object     # (RB_pad·G, 128) int8 — stage-B run heads
    idx: object       # (K·RB_pad·G, 128) int8 — static bin gathers, <0 masked
    lo_a: object      # (H, W) int32 — row-local per slot (to_coo only)
    overflow: object  # BSRState — dense buckets' overflow (CSR5 fast-track
                      # analog: the dense part rides the MXU)
    balanced: bool = False
    src_lane: object = None   # (128, RB_pad) int32 — balance-inverse routing
    src_chunk: object = None
    row_group: int = 128      # rows per bucket unit (128 or 1024); 1024 uses
                              # the grouped stage-B kernel (hyper-sparse mode)
    max_run: int = 128        # longest real run — truncates the stage-B scan


def convert(coo: COOMatrix, cfg: Config) -> BKTState:
    n_row, n_col, nnz = coo.n_row, coo.n_col, coo.nnz
    import math

    ru = max(1, int(cfg.bkt_row_group) // LANES)   # 128-row blocks per bucket
    if ru not in (1, 8):
        raise ValueError("bkt_row_group must be 128 or 1024")
    RL = ru * LANES                                 # rows per bucket unit
    RB = cdiv(max(n_row, 1), LANES)
    CB = cdiv(max(n_col, 1), LANES)
    NU = cdiv(RB, ru)                               # bucket row units

    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    rb = rows // LANES
    cb = cols // LANES
    lo = (rows % LANES).astype(np.int64)

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

    # S: bucket depth, capped near the 90th percentile — dense buckets' excess
    # routes to the BSR overflow (the dense part is exactly what BSR is good
    # at, mirroring CSR5's fast/normal track split).
    counts0 = np.bincount(cb * NU + ub, minlength=CB * NU) if nnz else \
        np.zeros(CB * NU, dtype=np.int64)
    nz_counts = counts0[counts0 > 0]
    s_need = int(counts0.max(initial=1))
    s_cap = int(np.percentile(nz_counts, cfg.bkt_cap_pct)) if nz_counts.size \
        else 1
    s_base = max(min(s_need, max(s_cap, 1)), 1)

    # RB_pad rounding trades ghost row-blocks against the S alignment forced by
    # "stage-A tiles (1024 slots) single-col-block": S must be a multiple of
    # 1024/gcd(RB_pad, 1024).  Pick the candidate minimizing total slots.
    def plan(u_mult):
        nup = round_up(NU, u_mult)
        align = max(1, 1024 // math.gcd(nup, 1024))
        s = round_up(s_base, align)
        cbp = round_up(CB, 128 // math.gcd(s, 128))
        if ru == 8:   # grouped stage-B blocks are (G, 128): need G % 8 == 0
            cbp = round_up(cbp, 1024 // math.gcd(s, 1024))
        return cbp * nup * s, nup, s, cbp

    N, NU_pad, S, CB_pad = min(plan(m) for m in (8, 64, 128, 256, 1024))
    RB_pad = NU_pad * ru
    if N > max(PAD_LIMIT * max(nnz, 1), MIN_SLOTS):
        raise ValueError(
            f"bkt: padded grid {N} slots vs nnz {nnz} exceeds PAD_LIMIT — "
            "matrix too hyper-sparse for dense bucketing; use bsr/css")

    G = CB_pad * S // LANES
    H = N // LANES
    if ru == 8 and G < 8:
        raise ValueError("bkt grouped mode needs G >= 8 (matrix too narrow)")

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

    # ---- slot assignment: bucket-major, row-local-sorted within bucket ------
    bucket = cb * NU_pad + ub
    counts = np.bincount(bucket, minlength=CB * NU_pad) if nnz else \
        np.zeros(CB * NU_pad, dtype=np.int64)
    order = np.lexsort((cols, rl, bucket)) if nnz else np.zeros(0, np.int64)
    b_sorted = bucket[order]
    start = np.zeros(CB * NU_pad, dtype=np.int64)
    np.cumsum(counts[:-1], out=start[1:])
    seq = np.arange(nnz) - start[b_sorted]

    # Entries beyond the per-bucket cap overflow into BSR (built further down,
    # together with the over-chained-run overflow).
    over = seq >= S
    over_rows = [rows[order][over]]
    over_cols = [cols[order][over]]
    over_vals = [coo.val[order][over]]

    keep_s = ~over
    order = order[keep_s]
    b_sorted = b_sorted[keep_s]
    seq = seq[keep_s]
    nnz_in = int(order.shape[0])
    slot = b_sorted * S + seq

    slot_cb = np.arange(N) // (NU_pad * S)
    col_a = (slot_cb * LANES).astype(np.int64)       # ghost: lane 0 of own block
    val_a = np.zeros(N, dtype=cfg.np_dtype)
    rl_slot = np.full(N, RL - 1, dtype=np.int64)     # ghosts sort/merge last
    real = np.zeros(N, dtype=bool)
    col_a[slot] = cols[order]
    val_a[slot] = coo.val[order].astype(cfg.np_dtype)
    rl_slot[slot] = rl[order]
    real[slot] = True

    # Stage-A tile width: widest W whose (8·W)-slot tiles never straddle a
    # col-block (fewer grid steps, bigger vector ops per take_along_axis).
    w_a = LANES
    for cand in (1024, 512, 256):
        if (NU_pad * S) % (8 * cand) == 0:
            w_a = cand
            break
    n_tiles = N // (8 * w_a)
    cb_ids = ((np.arange(n_tiles) * 8 * w_a) // (NU_pad * S)).astype(np.int32)

    # ---- stage-B layout -----------------------------------------------------
    # slot -> (cb, unit, seq) -> B position (brow, lane)
    s_cb = slot_cb
    s_rem = np.arange(N) % (NU_pad * S)
    s_ub = s_rem // S
    s_seq = s_rem % S
    q = s_cb * S + s_seq
    j = q // LANES
    lane = q % LANES
    if ru == 1:
        # 8 slabs per kernel block, j-interleaved (min-tile outputs)
        brow = (s_ub // 8) * (8 * G) + j * 8 + (s_ub % 8)
    else:
        # one slab per kernel block; output is the unit's (8, 128) y rows
        brow = s_ub * G + j

    B_rows = NU_pad * G
    rl_b = np.full((B_rows, LANES), RL - 1, dtype=np.int64)
    real_b = np.zeros((B_rows, LANES), dtype=bool)
    bucket_start_b = np.zeros((B_rows, LANES), dtype=bool)
    rl_b[brow, lane] = rl_slot
    real_b[brow, lane] = real
    bucket_start_b[brow, lane] = (s_seq == 0)

    prev_rl = np.empty_like(rl_b)
    prev_rl[:, 0] = -1
    prev_rl[:, 1:] = rl_b[:, :-1]
    heads_b = bucket_start_b | (rl_b != prev_rl)
    heads_b[:, 0] = True

    nxt_head = np.empty_like(heads_b)
    nxt_head[:, -1] = True
    nxt_head[:, :-1] = heads_b[:, 1:]
    ends_b = nxt_head                                   # last element of each run

    # runs: (brow, end_lane, bin); keep runs containing >= 1 real slot
    run_id_flat = np.cumsum(heads_b.reshape(-1)) - 1
    run_real = np.zeros(int(run_id_flat[-1]) + 1 if B_rows else 1, dtype=bool)
    np.logical_or.at(run_real, run_id_flat, real_b.reshape(-1))
    er, el = np.nonzero(ends_b)
    run_ids = run_id_flat.reshape(B_rows, LANES)[er, el]
    keep = run_real[run_ids]
    er, el = er[keep], el[keep]
    bins = rl_b[er, el]

    # collision chain: k-th run of (brow, bin)
    okey = er * RL + bins
    oorder = np.lexsort((el, okey))
    run_ids_s = run_ids[keep][oorder]
    er_s, el_s, bins_s, okey_s = er[oorder], el[oorder], bins[oorder], okey[oorder]
    is_first = np.empty(len(okey_s), dtype=bool)
    if len(okey_s):
        is_first[0] = True
        is_first[1:] = okey_s[1:] != okey_s[:-1]
    grp = np.cumsum(is_first) - 1
    first_pos = np.nonzero(is_first)[0]
    chain = np.arange(len(okey_s)) - first_pos[grp] if len(okey_s) else \
        np.zeros(0, np.int64)

    # Cap the collision-chain depth: runs beyond the VMEM-aware cap would blow
    # the stage-B idx block, so their entries overflow into BSR.
    k_lim = k_cap(G, floor=1 if ru == 8 else 4)  # grouped idx = K·8·G rows
    if chain.size and chain.max() >= k_lim:
        bad_runs = np.zeros(int(run_id_flat[-1]) + 1, dtype=bool)
        bad_runs[run_ids_s[chain >= k_lim]] = True
        slot_bad_b = bad_runs[run_id_flat].reshape(B_rows, LANES) & real_b
        ent_b = np.full(B_rows * LANES, -1, dtype=np.int64)
        ent_b[brow[slot] * LANES + lane[slot]] = np.arange(nnz_in)
        bad_ent = ent_b[np.nonzero(slot_bad_b.reshape(-1))[0]]
        bad_ent = bad_ent[bad_ent >= 0]
        over_rows.append(rows[order][bad_ent])
        over_cols.append(cols[order][bad_ent])
        over_vals.append(coo.val[order][bad_ent])
        val_a[slot[bad_ent]] = 0        # excluded from the grid path (+ to_coo)
        routed = chain < k_lim
        er_s, el_s, bins_s, chain = (er_s[routed], el_s[routed],
                                     bins_s[routed], chain[routed])
        run_ids_s = run_ids_s[routed]
    K = int(chain.max(initial=0)) + 1

    # Longest run actually picked by idx — the stage-B scan only needs to
    # cover that distance (shallow buckets skip most of the log2(128) steps).
    run_len = np.bincount(run_id_flat)
    max_run = int(run_len[run_ids_s].max(initial=1)) if run_ids_s.size else 1

    from . import bsr as bsr_mod

    over_coo = COOMatrix.from_triplets(
        n_row, n_col, np.concatenate(over_rows), np.concatenate(over_cols),
        np.concatenate(over_vals), index_bits=cfg.index_bits, sort=True)
    overflow_state = bsr_mod.convert(over_coo, cfg)

    if ru == 1:
        blk = 8 * G
        n_blocks = NU_pad // 8
        idx_full = np.full((n_blocks * K * blk, LANES), -1, dtype=np.int32)
        blk_i = er_s // blk
        row_in_blk = er_s % blk
        idx_full[(blk_i * K + chain) * blk + row_in_blk, bins_s] = el_s
    else:
        # slab-major, (k, σ)-minor planes of (G, 128); bin = σ·128 + lane
        idx_full = np.full((NU_pad * K * 8 * G, LANES), -1, dtype=np.int32)
        slab_i = er_s // G
        row_in = er_s % G
        sig = bins_s // LANES
        b_lane = bins_s % LANES
        idx_full[((slab_i * K + chain) * 8 + sig) * G + row_in, b_lane] = el_s

    lane_a = col_a - slot_cb * LANES          # in-block column, 0..127
    return BKTState(
        n_row=n_row, n_col=n_col, nnz=nnz, rb_pad=RB_pad, cb_pad=CB_pad,
        s=S, g=G, k=K, n_slots=N, overflow_nnz=over_coo.nnz,
        cb_ids=device_put(cb_ids),
        lane=device_put(lane_a.reshape(N // w_a, w_a).astype(np.int8)),
        val=device_put(val_a.reshape(N // w_a, w_a)),
        heads=device_put(heads_b.astype(np.int8)),
        idx=device_put(idx_full.astype(np.int8)),
        lo_a=device_put(rl_slot.reshape(N // w_a, w_a).astype(np.int32)),
        overflow=overflow_state,
        balanced=balanced, src_lane=src_lane, src_chunk=src_chunk,
        row_group=RL, max_run=max_run,
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

    RB_pad, CB_pad, S, G = state.rb_pad, state.cb_pad, state.s, state.g
    ru = state.row_group // LANES
    NU_pad = RB_pad // ru
    xp = jnp.zeros((CB_pad * LANES,), x.dtype).at[: state.n_col].set(x)
    prod = block_gather_mul(state.cb_ids, state.lane, state.val,
                            xp.reshape(CB_pad, LANES))
    # cb-major -> unit-major relayout (pure transpose, no gather).  When S
    # divides 128 the q = cb·S + seq split factors across the lane boundary,
    # so ONE 5-D transpose does the whole relayout (~1.9× faster on chip).
    fused = S <= LANES and LANES % S == 0 and CB_pad % (LANES // S) == 0
    fused_big = S > LANES and S % LANES == 0   # lanes = seq % 128 directly
    if fused and ru == 1:
        c2n = LANES // S
        p = (prod.reshape(CB_pad // c2n, c2n, NU_pad // 8, 8, S)
             .transpose(2, 0, 3, 1, 4).reshape(NU_pad * G, LANES))
    elif fused:
        c2n = LANES // S
        p = (prod.reshape(CB_pad // c2n, c2n, NU_pad, S)
             .transpose(2, 0, 1, 3).reshape(NU_pad * G, LANES))
    elif fused_big and ru == 1:
        sh = S // LANES
        p = (prod.reshape(CB_pad, NU_pad // 8, 8, sh, LANES)
             .transpose(1, 0, 3, 2, 4).reshape(NU_pad * G, LANES))
    elif fused_big:
        sh = S // LANES
        p = (prod.reshape(CB_pad, NU_pad, sh, LANES)
             .transpose(1, 0, 2, 3).reshape(NU_pad * G, LANES))
    elif ru == 1:
        p = prod.reshape(CB_pad, NU_pad, S).transpose(1, 0, 2)
        p = p.reshape(NU_pad // 8, 8, G, LANES).transpose(0, 2, 1, 3)
        p = p.reshape(NU_pad * G, LANES)
    else:
        p = (prod.reshape(CB_pad, NU_pad, S).transpose(1, 0, 2)
             .reshape(NU_pad * G, LANES))
    if ru == 1:
        y_tab = bucket_reduce(p, state.heads, state.idx, NU_pad,
                              max_run=state.max_run)
    else:
        y_tab = bucket_reduce_grouped(p, state.heads, state.idx, NU_pad,
                                      max_run=state.max_run)
    if state.balanced:
        from ..ops.pallas.bucket import lane_unpermute

        rbu = state.src_lane.shape[1]
        y_t = jnp.zeros((LANES, rbu), y_tab.dtype).at[:, :RB_pad].set(y_tab.T)
        y_tab = lane_unpermute(y_t, state.src_lane, state.src_chunk)[:, :RB_pad].T
    y = y_tab.reshape(-1)[: state.n_row]
    if state.overflow_nnz:
        from . import bsr as bsr_mod

        y = y + bsr_mod.spmv(state.overflow, x)
    return y


def report_fields(state: BKTState, cfg: Config) -> dict:
    return {"RB": state.rb_pad, "CB": state.cb_pad, "SlotDepth": state.s,
            "ChainK": state.k, "OverflowNnz": state.overflow_nnz,
            "PadFactor": round(state.n_slots / max(state.nnz, 1), 3)}


def traffic_bytes(state: BKTState, cfg: Config) -> int:
    from . import bsr as bsr_mod

    vsz = np.dtype(cfg.dtype).itemsize
    slots = state.n_slots
    stage_a = slots * (1 + 2 * vsz)                    # lane(i8) + val + out
    stage_b = slots * (vsz + 1) + state.k * slots * 1  # prod + heads + idx (i8)
    over = bsr_mod.traffic_bytes(state.overflow, cfg) if state.overflow_nnz else 0
    return stage_a + stage_b + state.n_row * vsz + over


def to_coo(state: BKTState) -> COOMatrix:
    """Inverse conversion (explicit zeros dropped — they pad like ghosts)."""
    val = np.asarray(state.val).reshape(-1)
    rl = np.asarray(state.lo_a).reshape(-1)
    N = state.n_slots
    ru = state.row_group // LANES
    nu_pad = state.rb_pad // ru
    slot_cb = np.arange(N) // (nu_pad * state.s)
    col = slot_cb * LANES + np.asarray(state.lane).reshape(-1).astype(np.int64)
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
    if state.overflow_nnz:
        from . import bsr as bsr_mod

        oc = bsr_mod.to_coo(state.overflow)
        rows = np.concatenate([rows, oc.row.astype(rows.dtype)])
        col = np.concatenate([col, oc.col.astype(col.dtype)])
        val = np.concatenate([val, oc.val])
    return COOMatrix.from_triplets(state.n_row, state.n_col, rows, col, val,
                                   sort=True, sum_duplicates=True)
