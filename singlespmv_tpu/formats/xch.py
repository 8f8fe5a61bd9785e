"""XCH — two-pass exchange engine for hyper-sparse / scattered giants.

The slab engine packs 128-slot stream rows whose columns share an m·128-col
window INSIDE a 1024-row unit.  On the hyper-sparse giant class (circuit5M,
rajat31, webbase: ≥1 M rows, ≤10 nnz/row, no locality) that joint constraint
is unsatisfiable — a (unit × window) cell holds ~8 nonzeros, so stream rows
run at fill 8/128 and the state pads 6–16× (r3: circuit5M 0.09× baseline,
916 s converts).  XCH splits the two constraints into two fill-perfect passes
with ONE order exchange between them:

  pass 1 (mul):   nonzeros sorted by (chunk, col) — chunk = K consecutive
                  nonzeros of the row-major stream.  Col-sorted order makes
                  the x windows slide monotonically (spans ~n_col/K per
                  stream row → window fill ≈ 1 for ANY structure; hub
                  columns are contiguous constant runs, i.e. free).  The
                  kernel gathers x from the VMEM-resident table, multiplies,
                  and writes products linearly: no routing at all.
  pass 2 (route): product slots re-gathered into (bucket, col) order — a
                  bucket is ``planes``·128 consecutive rows.  Because a
                  bucket's sources interleave the chunk's product stream
                  ~evenly (gap ≈ rows_per_chunk/rows_per_bucket), the
                  gather is again a monotone sliding window (m2 blocks) —
                  over the chunk's products, which fit one VMEM block.
                  Within each 128-slot stream row the slots are laid out
                  row-contiguously (any per-slot order is reachable: the
                  window gather is index-addressed), so runs reduce with the
                  MXU prefix trick and route to the bucket's (planes, 128)
                  output block through σ-planes — exactly slab's machinery,
                  now at fill ≈ 1.

The exchange granularity obeys m1·m2 ≈ n_row·n_col/(scope·nnz): for
circuit5M (scope 2048) that is ~253, i.e. m1 = m2 = 16 — each pass pays a
16-way one-hot select per slot instead of slab's 16× padding.

Reference parity: this is the CSR5 idea taken to its TPU conclusion — CSR5
tiles the *nnz space* with rows unconstrained per tile
(/root/reference/opt/Benchmark_SpMV_using_CSR5/CSR5_avx2/detail/avx2/
csr5_spmv_avx2.h:47-267, tile = ω·σ slots, cross-tile carry via calibrator);
XCH's pass-2 stream rows are such tiles, with the carry/empty-row machinery
replaced by static σ-plane routing computed at convert time.
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..core import hostmem as hm
from ..core.types import COOMatrix, cdiv
from .base import device_put, pytree_dataclass
from .slab import _walk

LANES = 128
STATE_REV = 4               # bump when layout/planning changes (cache key)
X_TABLE_CAP = 96 << 20      # VMEM-resident x table bound (v5e, as slab)
P1_CAP_ROWS = 12288         # chunk product block ≤ 6 MB VMEM (12288·128·4B)
M_MAX = 120                 # int8 sub index headroom
M2_CAP = 40                 # route-window cap: the select's VMEM working set
#                             (T·m·128 f32 ×3) serializes the pipeline past
#                             this (measured r4: m2=55 ran 2x the model)
G_GRP = 16                  # compact buckets per out block: out-block
#                             switches flush the pipeline (~4-7 us each,
#                             measured r4) — grouping divides them by G
CHUNK_ROWS = 160_000        # stream rows per pallas_call: the win2 prefetch
#                             is 4 B/STREAM ROW (not per step), so the SMEM
#                             budget (1 MB) caps rows — 160k rows = 640 KB
#                             win + 5 per-step arrays ≤ 100 KB.  (r4: the
#                             old 40k-STEP cap let 1.2M rows through on
#                             Freescale1/cage15 → 4-5 MB SMEM → compile
#                             failure "prefetched SMEM operand 5".)

# measured-rate cost model, fitted on the r4 chip microbench
# (scripts/probe_xch_kernel.py, on-device chained loops, TPU v5e):
#   mul   T=64..128, m=1..32:  0.01-0.13 ns/slot  (fixed ~0.15 us/step)
#   route T=32..64, p=8..16:   0.10-0.27 ns/slot  (fixed ~0.45 us/step,
#                               ~0.003 ns/member, ~0.005 ns/plane)
# Shared rates come from core/chipconst (harness.calibrate refreshes them);
# the per-kernel step-fixed costs are xch-local fits.
from ..core import chipconst as _cc

MUL_FIXED_S = 0.15e-6
ROUTE_FIXED_S = 0.45e-6
BLOCK_SWITCH_S = 4e-6       # per out/source block change (pipeline flush)
BASE_SLOT_S = 0.013e-9
SEL_ENTRY_S = 0.0157e-9                 # one-hot select entry cost (m > 1)
SEL_SLOT_S = 0.002e-9                   # per window member per slot
#   (r4 v3 decomposition, shared with slab: mul m=8 measured 0.041 ns/slot
#    = base + entry + 8·member; the old flat 0.012+0.003m underpriced small
#    windows and left ASIC's pass-1 at fill 0.36 — m1=16 measured +11%)
# route σ cost, refit from the r4 pg-sweep (scripts/probe_xch_route2.py,
# pg=8: p8m8 0.166, p16m8 0.233, p32m8 0.357 ns/slot; act=.5 at p32 saved
# 0.09): a plane costs DMA+issue whether pruned or not, compute only when
# in the step's active [sg0, sg1] range
ROUTE_BASE_S = 0.078e-9                 # run-total + write, per slot
ROUTE_SEL_S = 0.003e-9                  # pass-2 select, per member (the
#                                         route's live state is bigger than
#                                         the mul's: m8→m24 measured
#                                         +0.0027/member on the pg sweep)
ROUTE_DMA_S = 0.0025e-9                 # per out plane (incl. pruned)
ROUTE_CMP_S = 0.0055e-9                 # per ACTIVE plane (gather+mask+sum)
ROUTE_SLOT_S = ROUTE_DMA_S + ROUTE_CMP_S   # back-compat aggregate
HBM_BPS = _cc.get("hbm_bps")
EST_CAL = 0.62              # closed-form → measured calibration (r4): the
#                             estimate can't see G-grouping, σ-range pruning
#                             or the convert's span/t2 re-optimization; on
#                             the three measured giants est/meas was 1.55/
#                             0.946 (ASIC), 2.56/1.78 (webbase), 4.22/2.33
#                             (Hamrle3) — a flat 0.62 reproduces all three
#                             within 12%


@pytree_dataclass(meta=("n_row", "n_col", "nnz", "m1", "m2", "t1", "t2",
                        "planes", "span", "n_chunks", "p1", "cb_pad",
                        "n_buckets", "n_slots1", "n_slots2", "chunk_nb"))
class XchState:
    n_row: int
    n_col: int
    nnz: int
    m1: int                 # pass-1 x window col-blocks
    m2: int                 # pass-2 product window blocks (of 128 slots)
    t1: int                 # pass-1 stream rows per grid step
    t2: int                 # pass-2 stream rows per grid step
    planes: int             # σ-planes = bucket scope / 128 (8 or 16)
    span: int               # buckets per out block (2 = slab-style pair:
    #                         steps may straddle one bucket boundary, host
    #                         overlap-adds — the ultra-sparse pad fix)
    n_chunks: int
    p1: int                 # product stream rows per chunk (fixed)
    cb_pad: int             # x-table col-blocks
    n_buckets: int          # compact (nonempty) buckets
    n_slots1: int
    n_slots2: int
    chunk_nb: tuple         # bucket G-GROUPS per pass-2 call chunk
    # pass 1 (single pallas_call; win1 prefetch is 4 B/stream row ≤ 1 MB up
    # to 250k rows — chunked like pass 2 when larger)
    win1: object            # k × (H1_c,) int32 — x window base col-block
    lane1: object           # k × (H1_c, 128) int8
    sub1: object            # k × (H1_c, 128) int8
    val1: object            # k × (H1_c, 128) dtype
    # pass 2 (per-call-chunk tuples)
    uids2: object           # k × (S_c,) int32 — call-local compact bucket/step
    cs2: object             # k × (S_c,) int32 — source chunk per step
    win2: object            # k × (H2_c,) int32 — chunk-local product row base
    lane2: object           # k × (H2_c, 128) int8
    sub2: object            # k × (H2_c, 128) int8
    hm2: object             # k × (H2_c, 128) int8
    idx2: object            # k × (span·planes, H2_c, 128) int8 — σ-plane
    #                         end-lanes, −1 masked
    bucket_ids: object      # (n_buckets,) int32 — original bucket ids
    lo_mask: object = None  # span=2: (n_buckets, 1) dtype — 0 where the
    #                         bucket is never a step's first (its block is
    #                         unwritten garbage; contributions arrive via
    #                         the previous block's hi half)
    gids2: object = None    # k × (S_c,) int32 — call-local bucket G-group
    #                         per step (out block index)
    sg0_2: object = None    # k × (S_c,) int32 — first active σ plane/step
    sg1_2: object = None    # k × (S_c,) int32 — last active σ plane/step
    #                         (inclusive; −1 = step routes nothing).  Rows
    #                         are sorted within a step, so active planes are
    #                         the contiguous range [sg0, sg1] — the kernel
    #                         skips plane groups outside it.


# ---------------------------------------------------------------- planning ---

def _span_quantiles(sorted_keys, group_starts,
                    qs=(0.3, 0.5, 0.7, 0.85, 0.95)):
    """Candidate window sizes (in 128-blocks) from span quantiles of 128
    consecutive same-group keys — the walk's cut rate at m = q-span is ~1-q.
    Mixed structures (dense rows + scatter) have strongly bimodal spans, so
    the grid must be dense enough to land near the cost optimum."""
    if len(sorted_keys) <= 128:
        return [1]
    lag = 127
    # subsample positions on giants: the span distribution converges fast
    step = max(len(sorted_keys) >> 22, 1)
    pos = np.arange(0, len(sorted_keys) - lag, step)
    a = sorted_keys[pos + lag] - sorted_keys[pos]
    # ignore spans that cross a group boundary (the walk cuts there anyway)
    gi = np.searchsorted(group_starts, pos, side="right")
    same = gi == np.searchsorted(group_starts, pos + lag, side="right")
    a = a[same]
    if a.size == 0:
        return [1]
    out = []
    for q in qs:
        s = int(np.quantile(a, q))
        out.append(int(np.clip((s >> 7) + 2, 1, M_MAX)))
    return sorted(set(out))


def _sample_groups(keys, starts, stride):
    """Every ``stride``-th group's key range, with rebuilt boundaries —
    a structure-preserving subproblem for candidate evaluation."""
    if stride <= 1 or len(starts) <= stride + 1:
        return keys, starts
    segs = [(starts[g], starts[g + 1])
            for g in range(0, len(starts) - 1, stride)]
    keys_s = np.concatenate([keys[a:b] for a, b in segs])
    lens = np.asarray([b - a for a, b in segs], np.int64)
    starts_s = np.concatenate([[0], np.cumsum(lens)])
    return keys_s, starts_s


SAMPLE_WALK_NNZ = 8_000_000   # candidate walks run on a 1/8 group sample
#                               past this; only the winner walks in full


def _align8(m, cap=M_MAX):
    """Window sizes must be f32-sublane-aligned: pl.ds(win, m) with m not a
    multiple of 8 takes Mosaic's unaligned-slice path, measured ~3x slower
    per slot (r4 probe: mul m=5 0.142 vs m=8 0.041 ns/slot; route m=17
    0.62 vs m=16 0.26).  m=1 slices hit a fast special case."""
    if m <= 1:
        return 1
    return min(((m + 7) // 8) * 8, (cap // 8) * 8 if cap >= 8 else 1)


def _best_walk(keys, starts, t_cands, fixed_s, per_slot_s, pad_h,
               m_override=None, m_cap=M_MAX, extra_cands=()):
    """Walk at candidate window sizes, pick the (m, t) minimizing the
    measured step-cost model: steps·fixed + padded_slots·per_slot_s(m).
    On giants the candidates are evaluated on a group sample; the winner
    gets the one full walk."""
    if m_override:
        cands = [min(m_override, m_cap)]
    else:
        cands = [min(m, m_cap)
                 for m in _span_quantiles(keys, starts[1:-1])]
        cands += [min(max(int(m), 1), m_cap) for m in extra_cands]
    cands = sorted(set(_align8(m, m_cap) for m in cands))
    stride = 8 if (len(keys) > SAMPLE_WALK_NNZ and len(cands) > 1) else 1
    keys_e, starts_e = _sample_groups(keys, starts, stride)
    best = None
    for m in cands:
        sizes, bases, grows = _walk(keys_e, starts_e, m)
        for t in t_cands:
            h = pad_h(grows, t) * stride
            sec = (h / t) * fixed_s + h * LANES * per_slot_s(m)
            if best is None or sec < best[0]:
                best = (sec, m, t, sizes, bases, grows)
    m, t = best[1], best[2]
    if stride > 1:
        sizes, bases, grows = _walk(keys, starts, m)
        return m, t, sizes, bases, grows
    return m, t, best[3], best[4], best[5]


def estimate(coo: COOMatrix, cfg: Config) -> dict:
    """Closed-form plan (no sorts): scope, K, predicted m1/m2 and cost.

    The exact m's come from span quantiles at convert; here the uniform-mix
    bound m1·m2 ≈ n_row·n_col/(scope·nnz) sizes the cost for the planner."""
    n_r, n_c, nnz = max(coo.n_row, 1), max(coo.n_col, 1), max(coo.nnz, 1)
    if coo.nnz == 0:
        return {"feasible": False, "est_s": 0.0}
    if cdiv(n_c, LANES) * LANES * np.dtype(cfg.dtype).itemsize > X_TABLE_CAP:
        return {"feasible": False, "est_s": float("inf")}
    best = None
    for planes in (8, 16, 32):
        scope = planes * LANES
        q = n_r * n_c / (scope * nnz)
        # skew the balance: the route select is ~2x the mul select per
        # member (bigger live state), so m1 ≈ 2·m2
        m2_bal = max(np.sqrt(q / 2.0), 1.0)
        k_slots = int(np.clip(m2_bal * scope * nnz / n_r,
                              16 * LANES, P1_CAP_ROWS * LANES))
        m1 = int(np.clip(cdiv(n_c, k_slots), 1, M_MAX))
        m2 = int(np.clip(round(k_slots * n_r / (scope * nnz) + 0.5), 1,
                         M2_CAP))
        t1, t2 = 128, 32
        # padding: bucket t2-alignment dominates — per (bucket, chunk) group
        # about t2/2 pad rows; sparse-structure walks add ~10%
        n_grp = max(n_r / scope, 1.0) + nnz / k_slots
        slots2 = 1.1 * nnz + n_grp * (t2 / 2) * LANES
        slots1 = 1.05 * nnz
        per1 = (BASE_SLOT_S + (SEL_ENTRY_S if m1 > 1 else 0.0)
                + m1 * SEL_SLOT_S)
        deg = nnz / n_r
        n_chunks_e = max(nnz / k_slots, 1.0)
        avg_run = max(deg / min(n_chunks_e, max(deg, 1.0)), 1.0)
        act = min(planes, t2 / avg_run + 1.0)   # active σ planes per step
        per2 = (ROUTE_BASE_S + m2 * ROUTE_SEL_S
                + 2 * planes * ROUTE_DMA_S + act * ROUTE_CMP_S
                + 3.0 / HBM_BPS)
        switches = n_r / scope / G_GRP + 2.0 * nnz / k_slots
        sec = (slots1 / LANES / t1 * MUL_FIXED_S
               + slots2 / LANES / t2 * ROUTE_FIXED_S
               + switches * BLOCK_SWITCH_S
               + slots1 * max(per1, (np.dtype(cfg.dtype).itemsize + 2 + 4)
                              / HBM_BPS)
               + slots2 * per2)
        slots = slots1 + slots2
        cand = {"feasible": True, "est_s": sec, "planes": planes,
                "k_slots": k_slots, "m1": m1, "m2": m2, "t1": t1, "t2": t2,
                "slots": int(slots)}
        if best is None or sec < best["est_s"]:
            best = cand
    best["est_s"] *= EST_CAL
    return best


# ----------------------------------------------------------------- convert ---

def convert(coo: COOMatrix, cfg: Config, plan: dict = None) -> XchState:
    dtype = cfg.np_dtype
    if coo.nnz == 0 or coo.n_row == 0:
        return _empty_state(coo, cfg)
    p = plan or estimate(coo, cfg)
    if not p["feasible"]:
        raise ValueError("xch: infeasible (x table exceeds VMEM cap)")
    planes, t1, t2 = p["planes"], p["t1"], p["t2"]
    scope = planes * LANES
    nnz = coo.nnz

    rows0 = hm.astype(coo.row, np.int64)
    cols0 = hm.astype(coo.col, np.int64)
    vals0 = hm.astype(coo.val, dtype)

    # ---- pass-1 layout: (chunk, col)-sorted, sliding x windows ----
    k_slots = int(min(p["k_slots"], nnz))
    n_chunks = cdiv(nnz, k_slots)
    g1 = hm.arange(nnz) // k_slots            # input is row-major sorted
    o1 = hm.argsort_keys(g1 * np.int64(coo.n_col) + cols0)
    cols_s = cols0[o1]
    chunk_starts = np.concatenate(
        [np.searchsorted(g1[o1], np.arange(n_chunks)), [nnz]])

    def _pad1(grows, t):
        return len(grows) * int(cdiv(int(grows.max(initial=1)), t) * t)

    m1, t1, sizes1, bases1, crows1 = _best_walk(
        cols_s, chunk_starts, (32, 64, 128) if not p.get("t1_fix") else
        (p["t1_fix"],), MUL_FIXED_S,
        lambda m: (BASE_SLOT_S + (SEL_ENTRY_S if m > 1 else 0.0)
                   + m * SEL_SLOT_S), _pad1,
        m_override=p.get("m1_fix"),
        extra_cands=(round(coo.n_col / k_slots) + 1,))

    p1 = int(cdiv(int(crows1.max(initial=1)), t1) * t1)
    h1 = n_chunks * p1
    # walk rows (chunk-major) -> final stream rows at chunk offsets
    wstart1 = np.concatenate([[0], np.cumsum(crows1)[:-1]])
    cidx = np.repeat(hm.arange(n_chunks), crows1)
    final1 = cidx * p1 + (hm.arange(len(sizes1)) - wstart1[cidx])

    win1 = hm.zeros(h1, np.int32)
    win1[final1] = bases1.astype(np.int32)
    lane1 = hm.zeros((h1, LANES), np.int8)
    sub1 = hm.zeros((h1, LANES), np.int8)
    val1 = hm.zeros((h1, LANES), dtype)
    sr1 = final1[np.repeat(hm.arange(len(sizes1)), sizes1)]
    li1 = hm.arange(nnz) - np.repeat(wslot_starts(sizes1), sizes1)
    lane1[sr1, li1] = (cols_s & (LANES - 1)).astype(np.int8)
    sub1[sr1, li1] = ((cols_s >> 7) - win1[sr1]).astype(np.int8)
    val1[sr1, li1] = vals0[o1]

    # per-nnz product position (in pass-1 order)
    src = sr1 * np.int64(LANES) + li1

    # ---- pass-2 layout: (bucket, src)-sorted, sliding product windows ----
    bshift = int(np.log2(scope))
    buckets = (rows0[o1] >> bshift)
    o2 = hm.argsort_keys(buckets * np.int64(h1) * LANES + src)
    src_s = src[o2]
    buck_s = buckets[o2]
    rows_s = rows0[o1][o2]
    chunk_of = src_s // (np.int64(p1) * LANES)
    grp = buck_s * np.int64(n_chunks + 1) + chunk_of
    gb = np.flatnonzero(np.concatenate([[True], grp[1:] != grp[:-1]]))
    grp_starts = np.append(gb, nnz)
    grp_bucket0 = buck_s[gb]
    grp_chunk0 = chunk_of[gb].astype(np.int64)

    ub0, bidx0 = np.unique(grp_bucket0, return_inverse=True)

    def _pad_span(grows, t, span, chunk_map, bmap):
        """Pad group stream-row counts: steps never cross a chunk boundary
        or a bucket G-group boundary, and touch at most ``span`` consecutive
        compact buckets (slab's pair-span: the out block covers the pair,
        host overlap-adds)."""
        pads = np.zeros(len(grows), np.int64)
        cur = 0
        straddle_step = -1
        for g, r in enumerate(grows):
            if g > 0 and cur % t != 0:
                if (chunk_map[g] != chunk_map[g - 1] or span == 1
                        or bmap[g] // G_GRP != bmap[g - 1] // G_GRP):
                    pads[g - 1] += t - (cur % t)
                    cur += t - (cur % t)
                    straddle_step = -1
                else:
                    s = cur // t
                    if s == straddle_step:      # a 3rd bucket in one step
                        pads[g - 1] += t - (cur % t)
                        cur += t - (cur % t)
                    else:
                        straddle_step = s
            cur += int(r)
        if cur % t:
            pads[-1] += t - (cur % t)
        return grows + pads

    span_cands = (1, 2) if not p.get("span_fix") else (p["span_fix"],)
    t2_cands = (32, 64) if not p.get("t2_fix") else (p["t2_fix"],)

    # walk per m candidate (span/t-independent), then pick (m, t, span) by
    # the fitted step-cost model; candidates evaluated on a group sample
    # past SAMPLE_WALK_NNZ, winner walked in full
    scope_deg = scope * nnz / max(coo.n_row, 1)
    if p.get("m2_fix"):
        m_cands = [p["m2_fix"]]
    else:
        m_cands = _span_quantiles(src_s, grp_starts[1:-1])
        m_cands.append(round(k_slots / max(scope_deg, 1.0)) + 1)
    m_cands = sorted(set(_align8(min(max(m, 1), M2_CAP, p1))
                         for m in m_cands))
    stride = 8 if (nnz > SAMPLE_WALK_NNZ and len(m_cands) > 1) else 1
    src_e, grp_starts_e = _sample_groups(src_s, grp_starts, stride)
    chunk_e = grp_chunk0[::stride] if stride > 1 else grp_chunk0
    bidx_e = bidx0[::stride] if stride > 1 else bidx0

    def _pad_cost(grows, t_c, sp_c, chunk_map):
        pads = _pad_span(grows, t_c, sp_c, chunk_map, bidx_e)
        return int(pads.sum())

    # expected run length (adjacent same-row slots in (bucket, src) order
    # merge into one run after the per-stream-row row sort)
    row_brk = int(np.count_nonzero(rows_s[1:] != rows_s[:-1])) + 1
    avg_run = nnz / max(row_brk, 1)
    best = None
    for m_c in m_cands:
        wk = _walk(src_e, grp_starts_e, m_c)
        for t_c in t2_cands:
            for sp_c in span_cands:
                h_c = _pad_cost(wk[2], t_c, sp_c, chunk_e) * stride
                act = min(sp_c * planes, t_c / max(avg_run, 1.0) + 1.0)
                per = (ROUTE_BASE_S + m_c * ROUTE_SEL_S
                       + sp_c * planes * ROUTE_DMA_S + act * ROUTE_CMP_S
                       + 3.0 / HBM_BPS)
                sec = (h_c / t_c) * ROUTE_FIXED_S + h_c * LANES * per
                if best is None or sec < best[0]:
                    best = (sec, m_c, t_c, sp_c, wk)
    _, m2, t2, span, wk = best
    if stride > 1:
        wk = _walk(src_s, grp_starts, m2)
    sizes2, bases2, grows2 = wk

    grows_pad = _pad_span(grows2, t2, span, grp_chunk0, bidx0)
    h2 = int(grows_pad.sum())
    gstart = np.concatenate([[0], np.cumsum(grows_pad)[:-1]])
    wstart2 = np.concatenate([[0], np.cumsum(grows2)[:-1]])
    gidx = np.repeat(hm.arange(len(grows2)), grows2)
    final2 = gstart[gidx] + (hm.arange(len(sizes2)) - wstart2[gidx])

    grp_bucket = grp_bucket0                      # per walk GROUP
    grp_chunk = grp_chunk0

    # chunk-local window base, clamped so [win, win+m2) stays in the block
    base_loc = bases2 - grp_chunk[gidx] * p1
    base_loc = np.minimum(np.maximum(base_loc, 0), p1 - m2)
    win2 = hm.zeros(h2, np.int32)
    win2[final2] = base_loc.astype(np.int32)
    # padded rows inherit their group's chunk (any valid base: 0)

    # per-slot stream row, then re-sort slots by (stream row, y row, src) so
    # each y row is one contiguous run per stream row
    sr2_0 = final2[np.repeat(hm.arange(len(sizes2)), sizes2)]
    o3 = hm.argsort_keys(sr2_0 * np.int64(coo.n_row + 1) + rows_s)
    src_f, rows_f, sr2 = src_s[o3], rows_s[o3], sr2_0[o3]
    new_row = np.concatenate([[True], sr2[1:] != sr2[:-1]])
    rstart = np.flatnonzero(new_row)
    li2 = hm.arange(nnz) - rstart[np.cumsum(new_row) - 1]

    lane2 = hm.zeros((h2, LANES), np.int8)
    sub2 = hm.zeros((h2, LANES), np.int8)
    hm2 = hm.zeros((h2, LANES), np.int8)
    src_row = src_f >> 7
    chunk_f = src_row // np.int64(p1)
    lane2[sr2, li2] = (src_f & (LANES - 1)).astype(np.int8)
    sub2[sr2, li2] = (src_row - chunk_f * p1 - win2[sr2]).astype(np.int8)

    new_run = hm.zeros(nnz, np.bool_)
    new_run[0] = True
    new_run[1:] = (rows_f[1:] != rows_f[:-1]) | (sr2[1:] != sr2[:-1])
    qpos = sr2 * LANES + li2
    head_q = np.maximum.accumulate(np.where(new_run, qpos, -1))
    hm2[sr2, li2] = (head_q - sr2 * LANES - 1).astype(np.int8)

    end = hm.zeros(nnz, np.bool_)
    end[:-1] = new_run[1:]
    end[-1] = True
    r_run, sr_run, e_lane = rows_f[end], sr2[end], li2[end]

    # per-step first group / compact bucket / bucket G-group
    n_steps = h2 // t2
    grp_of_frow = np.repeat(hm.arange(len(grows_pad)),
                            grows_pad.astype(np.int64))
    g_step = grp_of_frow[::t2]
    ub = ub0
    n_buckets = len(ub)
    uids = bidx0[g_step].astype(np.int32)         # compact, non-decreasing
    gids = uids // G_GRP                          # out-block G-group
    chunk_step = grp_chunk[g_step].astype(np.int32)
    written = hm.zeros(n_buckets, np.bool_)
    written[uids.astype(np.int64)] = True
    lo_mask = written.astype(dtype).reshape(n_buckets, 1)

    # σ: span-local — off = run's compact bucket − step's first bucket
    grp_run = grp_of_frow[sr_run]                 # group per run end
    off_run = bidx0[grp_run] - uids[sr_run // t2].astype(np.int64)
    assert off_run.min(initial=0) >= 0 and \
        off_run.max(initial=0) < span, \
        "xch: a grid step spans more buckets than the out block covers"
    sigma = ((r_run & np.int64(scope - 1)) >> 7) + planes * off_run
    l_run = r_run & np.int64(LANES - 1)
    idx2 = hm.full((span * planes, h2, LANES), -1, np.int8)
    idx2[sigma, sr_run, l_run] = e_lane.astype(np.int8)

    # per-step active σ range (kernel plane-group pruning); run ends are
    # stream-row-sorted so reduceat segments are contiguous
    sg0 = hm.zeros(n_steps, np.int32)
    sg1 = hm.full(n_steps, -1, np.int32)
    if len(sr_run):
        s_of = (sr_run // t2).astype(np.int64)
        bnd = np.flatnonzero(np.concatenate([[True], s_of[1:] != s_of[:-1]]))
        sg0[s_of[bnd]] = np.minimum.reduceat(sigma, bnd).astype(np.int32)
        sg1[s_of[bnd]] = np.maximum.reduceat(sigma, bnd).astype(np.int32)

    # ---- split pass-2 into SMEM-prefetch-sized pallas_calls ----
    ngb_tot = int(gids[-1]) + 1 if n_steps else 0
    cz = _chunk_steps(gids, n_steps, ngb_tot,
                      max_steps=max(CHUNK_ROWS // t2, 1))
    u_t, g_t, c_t, w_t, la_t, su_t, hm_t, ix_t, s0_t, s1_t = \
        [], [], [], [], [], [], [], [], [], []
    for s0, s1, g0, _ngb in cz:
        r0, r1 = s0 * t2, s1 * t2
        u_t.append(device_put((uids[s0:s1] - g0 * G_GRP).astype(np.int32)))
        g_t.append(device_put((gids[s0:s1] - g0).astype(np.int32)))
        c_t.append(device_put(chunk_step[s0:s1]))
        w_t.append(device_put(win2[r0:r1]))
        la_t.append(device_put(lane2[r0:r1]))
        su_t.append(device_put(sub2[r0:r1]))
        hm_t.append(device_put(hm2[r0:r1]))
        ix_t.append(device_put(idx2[:, r0:r1]))
        s0_t.append(device_put(sg0[s0:s1]))
        s1_t.append(device_put(sg1[s0:s1]))

    # ---- split pass-1 likewise (win1 prefetch = 4 B/stream row ≤ 1 MB) ----
    cz1 = []
    max_rows1 = (160_000 // t1) * t1            # plain range split
    for r0 in range(0, h1, max_rows1):
        cz1.append((r0, min(r0 + max_rows1, h1)))
    w1_t, la1_t, su1_t, va1_t = [], [], [], []
    for r0, r1 in cz1:
        w1_t.append(device_put(win1[r0:r1]))
        la1_t.append(device_put(lane1[r0:r1]))
        su1_t.append(device_put(sub1[r0:r1]))
        va1_t.append(device_put(val1[r0:r1]))

    cb_tot = cdiv(max(coo.n_col, 1), LANES)
    return XchState(
        n_row=coo.n_row, n_col=coo.n_col, nnz=nnz, m1=m1, m2=m2, t1=t1,
        t2=t2, planes=planes, span=span, n_chunks=n_chunks, p1=p1,
        cb_pad=cb_tot + m1, n_buckets=n_buckets,
        n_slots1=h1 * LANES, n_slots2=h2 * LANES,
        chunk_nb=tuple(c[3] for c in cz),
        win1=tuple(w1_t), lane1=tuple(la1_t), sub1=tuple(su1_t),
        val1=tuple(va1_t),
        uids2=tuple(u_t), cs2=tuple(c_t), win2=tuple(w_t),
        lane2=tuple(la_t), sub2=tuple(su_t), hm2=tuple(hm_t),
        idx2=tuple(ix_t), bucket_ids=device_put(ub.astype(np.int32)),
        lo_mask=device_put(lo_mask), gids2=tuple(g_t),
        sg0_2=tuple(s0_t), sg1_2=tuple(s1_t))


def wslot_starts(sizes):
    return np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)


def cdiv_np(a, b):
    return -(-a // b)


def _chunk_steps(uids, n_steps, n_buckets, max_steps=None):
    """Split pass-2 steps into chunks of ≤``max_steps`` (SMEM row cap / t2),
    cutting at new-bucket steps.  Returns [(s0, s1, first_bucket,
    n_buckets_in_chunk)]; the last chunk covers through ``n_buckets`` (with
    span, a trailing bucket may never be a step's first — its block stays
    unwritten, lo_mask drops it)."""
    if n_steps == 0:
        return []
    cap = max_steps if max_steps else n_steps
    if n_steps <= cap:
        return [(0, n_steps, 0, n_buckets)]
    new_b = np.flatnonzero(np.concatenate([[True], uids[1:] != uids[:-1]]))
    cuts = [0]
    while cuts[-1] + cap < n_steps:
        k = np.searchsorted(new_b, cuts[-1] + cap, side="right") - 1
        s = int(new_b[k])
        if s <= cuts[-1]:
            raise ValueError("xch: a single bucket exceeds the step cap")
        cuts.append(s)
    cuts.append(n_steps)
    out = []
    for i in range(len(cuts) - 1):
        s0, s1 = cuts[i], cuts[i + 1]
        u0 = int(uids[s0])
        u_next = int(uids[s1]) if s1 < n_steps else n_buckets
        out.append((s0, s1, u0, u_next - u0))
    return out


def _empty_state(coo, cfg):
    dtype = cfg.np_dtype
    z8 = lambda *s: device_put(hm.zeros(s, np.int8))
    return XchState(
        n_row=coo.n_row, n_col=coo.n_col, nnz=0, m1=1, m2=1, t1=8, t2=8,
        planes=8, span=1, n_chunks=1, p1=8, cb_pad=1, n_buckets=0,
        n_slots1=0, n_slots2=0, chunk_nb=(0,),
        win1=(device_put(hm.zeros(0, np.int32)),),
        lane1=(z8(0, LANES),), sub1=(z8(0, LANES),),
        val1=(device_put(hm.zeros((0, LANES), dtype)),),
        uids2=(device_put(hm.zeros(0, np.int32)),),
        gids2=(device_put(hm.zeros(0, np.int32)),),
        sg0_2=(device_put(hm.zeros(0, np.int32)),),
        sg1_2=(device_put(hm.zeros(0, np.int32)),),
        cs2=(device_put(hm.zeros(0, np.int32)),),
        win2=(device_put(hm.zeros(0, np.int32)),),
        lane2=(z8(0, LANES),), sub2=(z8(0, LANES),), hm2=(z8(0, LANES),),
        idx2=(device_put(hm.full((8, 0, LANES), -1, np.int8)),),
        bucket_ids=device_put(hm.zeros(0, np.int32)))


# -------------------------------------------------------------------- spmv ---

def _mul_phase(state: XchState, x):
    import jax.numpy as jnp

    from ..ops.pallas.xch import xch_mul

    xp = jnp.zeros((state.cb_pad * LANES,), x.dtype)
    xp = xp.at[: state.n_col].set(x)
    xp = xp.reshape(state.cb_pad, LANES)
    prods = [xch_mul(w, la, su, va, xp, state.m1, state.t1)
             for w, la, su, va in zip(state.win1, state.lane1, state.sub1,
                                      state.val1)]
    prod = prods[0] if len(prods) == 1 else jnp.concatenate(prods, axis=0)
    return prod.reshape(state.n_chunks, state.p1, LANES)


def _route_phase(state: XchState, prod3):
    import jax.numpy as jnp

    from ..ops.pallas.xch import xch_route

    n = state.n_row
    op = state.span * state.planes          # out planes per bucket slot
    sg0s = state.sg0_2 or tuple(jnp.zeros_like(u) for u in state.uids2)
    sg1s = state.sg1_2 or tuple(jnp.full_like(u, op - 1)
                                for u in state.uids2)
    outs = [xch_route(u, g, c, s0, s1, w, la, su, h2, ix, prod3,
                      ngb, state.m2, op, state.t2, G_GRP)
            for u, g, c, s0, s1, w, la, su, h2, ix, ngb in zip(
                state.uids2, state.gids2, state.cs2, sg0s, sg1s,
                state.win2, state.lane2, state.sub2, state.hm2,
                state.idx2, state.chunk_nb)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    scope = state.planes * LANES
    nbk = out.shape[0] // op                # G-padded bucket slots
    out3 = out.reshape(nbk, state.span, scope)
    if nbk < state.n_buckets:               # trailing never-first buckets
        out3 = jnp.concatenate(
            [out3, jnp.zeros((state.n_buckets - nbk, state.span, scope),
                             out3.dtype)], axis=0)
    out3 = out3[: state.n_buckets]
    if state.span == 1:
        yb = out3[:, 0, :]
    else:
        # pair overlap-add: slot b's hi half targets compact bucket b+1
        # (never-first buckets' own slots are zeroed with their G-block)
        yb = out3[:, 0, :] + jnp.concatenate(
            [jnp.zeros((1, scope), out3.dtype), out3[:-1, 1, :]], axis=0)
    nb_tot = cdiv(max(n, 1), scope)
    y2 = jnp.zeros((nb_tot, scope), prod3.dtype)
    y2 = y2.at[state.bucket_ids].set(yb, mode="drop", unique_indices=True)
    return y2.reshape(-1)[:n]


def spmv(state: XchState, x):
    import jax.numpy as jnp

    from ..ops import pallas as pallas_pkg

    if state.nnz == 0 or state.n_buckets == 0:
        return jnp.zeros((state.n_row,), x.dtype)
    if not pallas_pkg.supports(x.dtype):
        raise TypeError("xch runs Pallas kernels: use float32/bfloat16 "
                        "(csr/ss for the f64 XLA path)")
    return _route_phase(state, _mul_phase(state, x))


def phases(state: XchState):
    """Mul/Route split for the driver's MulPerf/SumPerf report keys
    (reference opt_ss.cpp phases; src/main.cpp:173-174)."""
    return {"Mul": _mul_phase, "Sum": _route_phase}


def spmm(state: XchState, X):
    import jax

    return jax.vmap(spmv, in_axes=(None, 1), out_axes=1)(state, X)


# ----------------------------------------------------------------- reports ---

def report_fields(state: XchState, cfg: Config) -> dict:
    return {"Window1Blocks": state.m1, "Window2Blocks": state.m2,
            "RoutePlanes": state.planes, "Span": state.span,
            "Chunks": state.n_chunks,
            "PadFactor": round((state.n_slots1 + state.n_slots2)
                               / max(2 * state.nnz, 1), 3)}


def traffic_bytes(state: XchState, cfg: Config) -> int:
    vsz = np.dtype(cfg.dtype).itemsize
    pass1 = state.n_slots1 * (vsz + 2) + state.n_slots1 * 4   # stream + write
    pass2 = state.n_slots2 * (3 + state.planes) + state.n_slots1 * 4
    return (pass1 + pass2 + state.n_row * vsz
            + state.cb_pad * LANES * vsz)


def to_coo(state: XchState) -> COOMatrix:
    """Host-side inverse: recover (row, col, val) from the two layouts."""
    cat = lambda t, ax=0: np.concatenate([np.asarray(a) for a in t], axis=ax)
    lane1 = cat(state.lane1).astype(np.int64)
    sub1 = cat(state.sub1).astype(np.int64)
    val1 = cat(state.val1).astype(np.float64)
    win1 = cat(state.win1).astype(np.int64)
    if lane1.shape[0] == 0:
        return COOMatrix.from_triplets(state.n_row, state.n_col, [], [], [],
                                       sort=True)
    cols_grid = (win1[:, None] + sub1) * LANES + lane1    # (H1, 128)

    lane2 = cat(state.lane2).astype(np.int64)
    sub2 = cat(state.sub2).astype(np.int64)
    win2 = cat(state.win2).astype(np.int64)
    hm2 = cat(state.hm2).astype(np.int64)
    idx2 = cat(state.idx2, ax=1).astype(np.int64)
    u_base = np.cumsum([0] + list(state.chunk_nb[:-1])) * G_GRP
    uids = np.concatenate([np.asarray(u).astype(np.int64) + b
                           for u, b in zip(state.uids2, u_base)])
    cs = np.concatenate([np.asarray(c).astype(np.int64)
                         for c in state.cs2])
    bucket_ids = np.asarray(state.bucket_ids).astype(np.int64)
    h2 = lane2.shape[0]
    scope = state.planes * LANES

    # rows: σ-plane ends + backward run propagation (as slab.to_coo)
    step_of = np.repeat(np.arange(h2 // state.t2), state.t2)
    rows = np.full((h2, LANES), -1, np.int64)
    for sigma in range(state.span * state.planes):
        e = idx2[sigma]
        valid = e >= 0
        sr_i, l_i = np.nonzero(valid)
        end_lane = e[sr_i, l_i]
        cb = uids[step_of[sr_i]] + sigma // state.planes
        rr = (bucket_ids[cb] * scope
              + (sigma % state.planes) * LANES + l_i)
        rows[sr_i, end_lane] = rr
    for j in range(LANES - 2, -1, -1):
        unset = rows[:, j] < 0
        same_run = hm2[:, j + 1] != j
        rows[same_run & unset, j] = rows[same_run & unset, j + 1]

    # src product position per pass-2 slot -> (col, val) via pass-1 grid
    src_row = cs[step_of][:, None] * state.p1 + win2[:, None] + sub2
    src = src_row * LANES + lane2
    mask = rows >= 0
    src_m = src[mask]
    cols = cols_grid.reshape(-1)[src_m]
    vals = val1.reshape(-1)[src_m]
    keep = vals != 0
    return COOMatrix.from_triplets(
        state.n_row, state.n_col,
        rows[mask][keep], cols[keep], vals[keep], sort=True)
