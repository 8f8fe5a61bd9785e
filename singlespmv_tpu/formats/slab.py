"""SLAB — ragged-free windowed stream-row format for the fused slab kernel.

The scattered-class formats of rounds 1-2 (bkt/bkt_g, ellg) all pay layout
taxes that the fused kernel (ops/pallas/slab.py) was built to remove: bucket
grids pad every bucket to one global depth, products round-trip HBM between
stages, and multi-level cascades leave residues on slow paths.  SLAB packs the
whole matrix — any structure, any row length — into one stream:

  nonzeros sorted by (row-unit, window, row, col); a *window* is ``m`` aligned
  col-blocks (m·128 columns); each (unit, window) group chops into 128-slot
  stream rows; each unit's stream rows pad to a multiple of the grid step T.

Padding is therefore ≤ one stream row per (unit, window) group plus T-alignment
per unit — no global depth.  One kernel pass computes the entire y: runs are
(row × stream-row) contiguous by construction, routed to the unit's (8, 128)
output block by 8 static σ-planes of int8 end-lanes — collision-free for any
row mix, since (σ, lane) ↔ row is bijective inside a unit and a stream row
holds one run per row.

Choosing m trades window fill (larger windows catch more of a unit's columns
in one stream row) against select cost (m-way one-hot) and VMEM; ``estimate``
simulates the exact slot count for each candidate m and T from the measured
per-step cost model and picks the cheapest.

Hyper-sparse giants (webbase/ASIC class) defeat plain windows: high-degree
*hub columns* appear in nearly every unit, so every (unit, window) group holds
a few lonely slots.  The planner then relabels hubs into a dense **appendix**
region of the x table (appendix windows pack hub nnz tightly; the residual's
windows regain locality).  The per-spmv cost is one small gather
``x[hub_cols]`` into the appendix.

Reference parity: this is the repo's answer to CSR5's tiled layout
(/root/reference/opt/Benchmark_SpMV_using_CSR5/CSR5_avx2/detail/avx2/
csr5_spmv_avx2.h:47-267) — tile descriptors become route planes, the
empty-row/segmented machinery becomes host-side run packing.
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..core import hostmem as hm
from ..core.types import COOMatrix, cdiv
from .base import device_put, pytree_dataclass

LANES = 128
STATE_REV = 3               # aligned-m + refit blk route model (r4)
UNIT_ROWS = 1024           # y rows per unit: 8 sublanes × 128 lanes
M_CANDS = (1, 8, 16, 32)   # window sizes are f32-sublane-aligned: pl.ds
#                              with a non-multiple-of-8 size takes Mosaic's
#                              unaligned path, ~3x slower per slot (r4 probe:
#                              m=4 ran SLOWER than m=8); m=1 is a fast
#                              special case
T_CANDS = (32, 64, 128, 192, 256)   # large T halves step-fixed cost;
#                                 the m*T<=1536 working-set cap keeps the
#                                 select pipeline out of its >=2048-row cliff
SPAN_CANDS = (1, 2)        # unit mode: units per output block (8/16 σ-planes)
BLK_PLANES = (8, 16, 32)   # blk mode: 128-row blocks per output block
PAD_LIMIT = 16.0           # slots / nnz refusal bound — generous: even a
#                            pad-12 slab runs ~10× the csr gather fallback;
#                            auto's cost model arbitrates, this only guards
SLOT_MEM_CAP = 10 << 30    # bytes of slot arrays a state may allocate —
#                            v5e has 16 GB HBM; r3's circuit5M (59.5 M nnz,
#                            pad ~6) needs an 8.2 GB unit-mode state and fell
#                            to the 0.11 GFLOPS csr fallback under the old
#                            6 GB cap
# measured per-grid-step cost model — fitted on the σ-plane kernel across
# the 8-plane and 16-plane bench runs (scripts/bench_slab.py), route
# constants re-fitted r3 on the stomach blk-k grid (results in git log):
# step ≈ FIXED + slots·(BASE + route + SEL·m), route per mode below.
# r4: constants come from core/chipconst (results/chip_constants.json when
# harness.calibrate has run on the attached chip; v5e literals otherwise).
from ..core import chipconst as _cc

STEP_FIXED_S = _cc.get("step_fixed_s")
BASE_SLOT_S = _cc.get("base_slot_s")
ROUTE_SLOT_S = _cc.get("route_slot_s")   # unit mode, per σ-plane
SEL_SLOT_S = _cc.get("sel_slot_s")       # per window member (one-hot select)
SEL_ENTRY_S = _cc.get("sel_entry_s")     # select entry cost, any m > 1
BLK_ROUTE_S = _cc.get("blk_route_s")     # blk mode, per kblk plane
BLK_FIXED_S = _cc.get("blk_fixed_s")     # blk mode, per-slot fixed route
BLK_MXU_S = 0.0003e-9      # blk mode, per span plane (MXU one-hot width)


@pytree_dataclass(meta=("n_row", "n_col", "nnz", "m", "t_step", "planes",
                        "mode", "n_units", "cb_pad", "n_slots", "hub_off",
                        "chunk_nu", "pg"))
class SlabState:
    n_row: int
    n_col: int
    nnz: int
    m: int                 # col-blocks per window
    t_step: int            # stream rows per grid step
    planes: int            # σ-planes (unit) / block span (blk)
    mode: str              # "unit" (σ-plane route) | "blk" (MXU route)
    n_units: int           # compact (nonempty) units
    cb_pad: int            # x-table col-blocks (window-aligned)
    n_slots: int
    hub_off: int           # appendix col offset (0 = no hub relabeling)
    chunk_nu: tuple        # compact units covered per stream chunk (static);
    #                        stream arrays below are PER-CHUNK tuples so each
    #                        pallas_call's win prefetch fits the 1 MB SMEM
    uids: object           # k × (n_steps_c,) int32 — chunk-local unit per step
    win: object            # k × (H_c,) int32 — window base per stream row
    lane: object           # k × (H_c, 128) int8
    sub: object            # k × (H_c, 128) int8
    val: object            # k × (H_c, 128) values
    hm1: object            # k × (H_c, 128) int8
    idx: object            # k × (16, H_c, 128) int8 — σ-plane end-lanes
    unit_ids: object       # (n_units,) int32 — original unit/block ids
    lo_mask: object = None  # (n_units, 1) value-dtype — 0 where the unit's
    #                         own block is never a step's first (tiny units
    #                         fully inside a straddling step: their out block
    #                         is unwritten garbage; contributions arrive via
    #                         the previous block's hi half)
    hub_cols: object = None  # (n_hub,) int32 — appendix source columns
    sig: object = None     # blk mode: (H, 128) int8 — per stream row its
    #                        block offset from the step's first block
    sg0: object = None     # unit mode: k × (n_steps_c,) int32 — first
    sg1: object = None     # /last (inclusive) active σ plane per step;
    #                        slots are row-sorted so the range is contiguous
    #                        and the kernel prunes plane groups outside it
    pg: int = 2            # plane-group granularity for the pruned route;
    #                        pg == planes collapses to one branch (the
    #                        convert sets this when nearly all planes are
    #                        active anyway — measured 5% overhead otherwise)
    val_lo: object = None  # df64 (dtype=float64): k × (H_c, 128) f32 lo
    #                        plane; val then holds the hi plane and spmv
    #                        runs the compensated unit kernel (slab_spmv_df)


# ----------------------------------------------------------------- packing ---

def _walk(cols_s, unit_starts, m):
    """Greedy per-unit walk over col-sorted slots: cut a stream row at 128
    slots or when the next col leaves the current unaligned m-block range.

    Adaptive ranges beat aligned windows decisively: a diagonal-following
    column cluster (3-D stencils, block bands) crosses every aligned window
    boundary but fits one moving range (measured: stomach pad 2.26 aligned
    → ~1.1 adaptive at m=4).

    Vectorized frontier walk: every iteration advances *all* still-active
    units by one stream row (one 128-slot window scan per unit), so the
    Python-level loop count is max(stream rows per unit), not total stream
    rows — the r2 scalar loop was the 10–255 s convert-time hotspot flagged
    in VERDICT.md §3 (cage15's 99 M nnz now walks in seconds).

    Returns (sizes, bases, urows): slots and base block per stream row
    (unit-major order), stream rows per (nonempty) unit.
    """
    n_units = len(unit_starts) - 1
    block_lim = m << 7
    n_total = len(cols_s)
    starts = np.asarray(unit_starts[:-1], np.int64)
    ends = np.asarray(unit_starts[1:], np.int64)
    cur = starts.copy()
    active = np.flatnonzero(cur < ends)
    ar = hm.arange(LANES)
    sizes_l, bases_l, units_l = [], [], []
    while active.size:
        i = cur[active]
        e = ends[active]
        base = cols_s[i] >> 7
        w_idx = i[:, None] + ar[None, :]
        w = cols_s[np.minimum(w_idx, n_total - 1)]
        inside = (w_idx < e[:, None]) & (w < ((base << 7) + block_lim)[:, None])
        cnt = inside.sum(axis=1)          # ≥ 1: cols_s[i] is inside its range
        sizes_l.append(cnt)
        bases_l.append(base)
        units_l.append(active)
        j = i + cnt
        cur[active] = j
        active = active[j < e]
    if not sizes_l:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(n_units, np.int64)
    units_cat = np.concatenate(units_l)
    order = hm.argsort_keys(units_cat)             # iteration-major → unit-major
    sizes = np.concatenate(sizes_l)[order]
    bases = np.concatenate(bases_l)[order]
    urows = np.bincount(units_cat, minlength=n_units).astype(np.int64)
    return sizes, bases, urows


def _pad_units(urows, t, span):
    """Pad stream-row counts for the output-block span.

    span=1 (8 σ-planes): every step stays inside one unit — ceil-align each
    unit's row count to t.
    span=2 (16 σ-planes): steps may straddle ONE unit boundary — pad only
    when a second boundary would fall inside the same step (a third unit).
    Returns per-unit padded counts; total is a multiple of t."""
    if span == 1:
        return (-(-urows // t)) * t
    pads = np.zeros(len(urows), np.int64)
    cur = 0
    last_inner_step = -1
    for u, r in enumerate(urows):
        end = cur + int(r)
        if end % t != 0:
            s = end // t
            if s == last_inner_step:
                pads[u] = t - (end % t)
                end += pads[u]
            else:
                last_inner_step = s
        cur = end
    if cur % t:
        pads[-1] += t - (cur % t)
    return urows + pads


def _pad_blocks(urows, t, planes):
    """blk mode: pad stream-row counts so every grid step touches at most
    ``planes`` consecutive compact 128-row blocks (the output block's span).
    Returns per-block padded counts; total is a multiple of t."""
    pads = np.zeros(len(urows), np.int64)
    cur = 0
    f = 0                 # first block of the step containing `cur`
    s_prev = 0
    for b, r in enumerate(urows):
        s = cur // t
        if cur % t == 0:
            f = b
        elif b > 0 and s != s_prev:
            f = b - 1     # the step started inside the previous block
        if b - f >= planes:
            pad = t - (cur % t)
            pads[b - 1] += pad
            cur += pad
            f = b
            s = cur // t
        s_prev = s
        cur += int(r)
    if cur % t:
        pads[-1] += t - (cur % t)
    return urows + pads


def _mode_cost(mode, planes, m, h, slots, t, extra_s, kblk=1):
    if mode == "unit":
        route = planes * ROUTE_SLOT_S
        bps = 7 + planes
    else:
        # r4 refit (driver-grade best-of-5 on the kblk 1/2/4 grid):
        # route = fixed + kblk*(per + planes*mxu); the old pure-linear model
        # underpriced kblk=1 3x and overpriced kblk=4
        route = BLK_FIXED_S + kblk * (BLK_ROUTE_S + planes * BLK_MXU_S)
        bps = 8 + kblk
    dma = slots * bps / _cc.get("hbm_bps")   # HBM stream floor
    sel = (SEL_ENTRY_S if m > 1 else 0.0) + m * SEL_SLOT_S
    compute = slots * (BASE_SLOT_S + route + sel)
    return extra_s + (h // t) * STEP_FIXED_S + max(dma, compute)


DF_COST = 6.0   # df64 kernel per-slot multiplier vs f32 (two planes,
#                 Dekker products, compensated trees instead of the MXU)


def _estimate_cols(rows0, cols0, nnz, extra_s=0.0, fixed=None,
                   mem_scale=1, unit_only=False) -> dict:
    """Pick (mode, m, T, planes) by the measured step-cost model; exact slot
    accounting.  One lexsort per scope (unit / 128-row block); each window
    candidate m re-walks the sorted stream (the walk is T-independent).

    ``fixed``: restrict to one (mode, kblk, m, t, planes) candidate — used by
    convert to materialize the exact layout after a SAMPLED estimate chose
    the winner.  ``mem_scale``: multiply slots for the memory-cap check when
    estimating on a 1/mem_scale row-unit sample."""
    best = None
    best_by_fam = {}
    nnz = len(rows0)
    # giant guard: each extra m candidate re-walks the (vectorized) stream;
    # past 60 M nnz trim the grid to the empirically-winning ms
    m_cands = M_CANDS if nnz <= 60_000_000 else (1, 8, 16)
    t_cands = T_CANDS
    mode_cands = (("unit", 10, 1), ("blk", 7, 1),
                  ("blk", 8, 2), ("blk", 9, 4))
    if unit_only:
        mode_cands = (("unit", 10, 1),)
    if fixed is not None:
        mode_cands = tuple(mc for mc in mode_cands
                           if mc[0] == fixed["mode"] and
                           mc[2] == fixed.get("kblk", 1))
        m_cands = (fixed["m"],)
        t_cands = (fixed["t"],)
    # blk kblk>1: stream rows span kblk aligned 128-row blocks (scope
    # 256/512 rows) — the mid-locality/scattered fill unlock (r3)
    for mode, shift, kblk in mode_cands:
        scope0 = rows0 >> shift
        # single-key stable sort (native parallel radix when available);
        # tight multiplier instead of << 33 so the radix touches fewer bytes
        cmult = int(cols0.max()) + 1 if nnz else 1
        o0 = hm.argsort_keys(scope0 * cmult + cols0)
        cols_s = cols0[o0]
        scope_s = scope0[o0]
        sb = np.flatnonzero(np.concatenate([[True],
                                            scope_s[1:] != scope_s[:-1]]))
        scope_starts = np.append(sb, len(cols_s))
        # density guard: skip walks that cannot half-fill rows even with
        # perfect ranges (slots per (scope, block) × m bounds the row fill)
        blocks = cols_s >> 7
        chg = np.concatenate([[True], (scope_s[1:] != scope_s[:-1])
                              | (blocks[1:] != blocks[:-1])])
        spb = len(cols_s) / max(int(chg.sum()), 1)
        for m in m_cands:
            if fixed is None and spb * m < 12 and m != m_cands[-1]:
                continue
            sizes, bases, urows = _walk(cols_s, scope_starts, m)
            cands = [("unit", 8 * s) for s in SPAN_CANDS] if mode == "unit" \
                else [("blk", p) for p in BLK_PLANES]
            if fixed is not None:
                cands = [c for c in cands if c[1] == fixed["planes"]]
            for t in t_cands:
                if m * t > 1536:
                    # select working set (T·m·128 f32 ×3 buffers) past ~2MB
                    # serializes the pipeline (measured r4: twotone m16 T128
                    # = 2048 rows ran 0.142 ns/slot vs the 0.099 model; same
                    # cliff as xch's M2_CAP.  1024 rows measured clean;
                    # 1536 is the probe-backed boundary)
                    continue
                for _, planes in cands:
                    if mode == "blk" and planes % kblk:
                        continue
                    if mode == "unit":
                        upad = _pad_units(urows, t, planes // 8)
                    else:
                        upad = _pad_blocks(urows, t, planes // kblk)
                    h = int(upad.sum())
                    # a single unit larger than the stream-chunk cap would
                    # make convert's _chunk_cuts raise (ADVICE r3): refuse
                    # the candidate here, at estimate time, by replaying the
                    # exact cut condition (max gap between new-first-unit
                    # steps must fit one chunk)
                    max_steps = max(CHUNK_ROWS // t, 1)
                    if h // t > max_steps:
                        bounds = np.cumsum(upad)
                        uc = np.searchsorted(
                            bounds, np.arange(h // t, dtype=np.int64) * t,
                            side="right")
                        marks = np.flatnonzero(
                            np.concatenate([[True], uc[1:] != uc[:-1]]))
                        if int(np.diff(np.append(marks, h // t)).max(
                                initial=0)) > max_steps:
                            continue
                    slots = h * LANES
                    bps = (7 + planes) if mode == "unit" else 8 + kblk
                    if slots > PAD_LIMIT * nnz + (1 << 16) or \
                            slots * bps * mem_scale > SLOT_MEM_CAP:
                        continue
                    sec = _mode_cost(mode, planes, m, h, slots, t, extra_s,
                                     kblk)
                    cand = {"feasible": True, "est_s": sec,
                            "slots": slots, "m": m, "t": t,
                            "planes": planes, "mode": mode, "order": o0,
                            "sizes": sizes, "bases": bases,
                            "urows": urows, "kblk": kblk,
                            "unit_ids": scope_s[sb].astype(np.int32)}
                    if best is None or sec < best["est_s"]:
                        best = cand
                    # runner-up of the OTHER route family (unit vs blk, or
                    # m==1 vs windowed): the model's unit/blk and m=1/m>1
                    # calls are only good to ~8%, so auto's measured trial
                    # gets both (r4: torso1 unit vs blk-k4 is a real 8% gap
                    # the model cannot rank; raefsky3 m=1 is 2x m=8)
                    fam = (mode, m == 1)
                    if (fam not in best_by_fam
                            or sec < best_by_fam[fam]["est_s"]):
                        best_by_fam[fam] = cand
    if best is None:
        return {"feasible": False, "est_s": float("inf"), "slots": 0,
                "m": 1, "t": 32, "planes": 8, "mode": "unit", "kblk": 1}
    alts = [c for fam, c in best_by_fam.items()
            if (c["mode"], c["m"], c["t"], c["planes"], c["kblk"])
            != (best["mode"], best["m"], best["t"], best["planes"],
                best["kblk"])]
    if alts:
        best["alt"] = min(alts, key=lambda c: c["est_s"])
    return best


HUB_DEG = 32               # column degree to qualify as a hub
HUB_MAX = 16384            # appendix capacity (128 col-blocks)
HUB_GATHER_RATE = 0.14e9   # XLA gather rate for the per-spmv appendix build


def _hub_relabel(cols0, degs, n_col):
    """Pick hub columns, return (hub_cols int32, relabeled cols, appendix
    offset) or (None, cols0, 0) when hubs don't apply."""
    cand = np.flatnonzero(degs >= HUB_DEG)
    if len(cand) < 16:
        return None, cols0, 0
    if len(cand) > HUB_MAX:
        top = np.argsort(degs[cand])[::-1][:HUB_MAX]
        cand = np.sort(cand[top])
    off = cdiv(max(n_col, 1), LANES) * LANES
    rank = hm.full(n_col, -1, np.int64)
    rank[cand] = hm.arange(len(cand))
    r = rank[cols0]
    cols_eff = np.where(r >= 0, off + r, cols0)
    return cand.astype(np.int32), cols_eff, off


X_TABLE_CAP = 96 << 20     # VMEM-resident x table bound (v5e: 128 MB VMEM,
#                            kernel raises Mosaic's scoped limit to ~110 MB)
CHUNK_ROWS = 160_000       # stream rows per pallas_call: the kernel scalar-
#                            prefetches win (one int32 per stream row) into
#                            SMEM (1 MB), so an unchunked giant dies with
#                            Mosaic "would exceed memory (space=smem)" —
#                            r3's ML_Geer wanted a 5.9 MB prefetch.  Streams
#                            split at unit-start steps into ≤640 KB chunks;
#                            per-chunk outputs tile the unit space, so
#                            concatenation reproduces the single-call output
#                            bit-for-bit.


def _chunk_cuts(uids, n_steps: int, t_step: int, n_units: int):
    """Split the step range into chunks of ≤ CHUNK_ROWS stream rows, cutting
    only at steps whose first unit differs from the previous step's (those
    are exactly the cuts where per-chunk outputs stay disjoint).  Returns
    [(s0, s1, u0, nu_c)] with Σ nu_c == n_units."""
    max_steps = max(CHUNK_ROWS // t_step, 1)
    if n_steps <= max_steps:
        return [(0, n_steps, 0, n_units)]
    new_unit = np.flatnonzero(
        np.concatenate([[True], uids[1:] != uids[:-1]]))
    cuts = [0]
    while cuts[-1] + max_steps < n_steps:
        k = np.searchsorted(new_unit, cuts[-1] + max_steps, side="right") - 1
        s = int(new_unit[k])
        if s <= cuts[-1]:
            raise ValueError(
                "slab: a single unit exceeds the stream-chunk cap "
                f"({max_steps} steps of {t_step} rows)")
        cuts.append(s)
    cuts.append(n_steps)
    out = []
    for i in range(len(cuts) - 1):
        s0, s1 = cuts[i], cuts[i + 1]
        u0 = int(uids[s0])
        u_next = int(uids[s1]) if s1 < n_steps else n_units
        out.append((s0, s1, u0, u_next - u0))
    return out


SAMPLE_NNZ = 6_000_000      # estimate on a 1/s row-unit sample past this —
#                             r3's full-grid estimate (16 sorted walks) was
#                             the 146-916 s convert-time hotspot on giants
#                             (r5: 16 M samples still cost 20 s/call at
#                             cage15 scale through hyb's residual recursion)


def estimate(coo: COOMatrix, cfg: Config) -> dict:
    # f64 runs the df64 unit kernel: unit mode only, ~DF_COST x per slot
    unit_only = cfg.dtype == "float64"
    if coo.nnz == 0 or coo.n_row == 0:
        return {"feasible": False, "est_s": 0.0, "slots": 0, "m": 1, "t": 32,
                "hub_cols": None, "cols_eff": None, "hub_off": 0}
    if cdiv(coo.n_col, LANES) * LANES * np.dtype(cfg.dtype).itemsize \
            > X_TABLE_CAP:
        return {"feasible": False, "est_s": float("inf"), "slots": 0,
                "m": 1, "t": 32, "hub_cols": None, "cols_eff": None,
                "hub_off": 0}
    rows0 = hm.astype(coo.row, np.int64)
    cols0 = hm.astype(coo.col, np.int64)
    s = max(-(-coo.nnz // SAMPLE_NNZ), 1)
    if s > 1:
        sel = (rows0 >> 10) % s == 0      # every s-th 1024-row unit: keeps
        rows_e = rows0[sel]               # per-unit structure exactly
    else:
        sel = None
        rows_e = rows0

    def _est(cols_full, extra_s=0.0):
        cols_e = cols_full[sel] if s > 1 else cols_full
        if len(cols_e) == 0:
            return {"feasible": False, "est_s": float("inf"), "slots": 0,
                    "m": 1, "t": 32, "mode": "unit", "planes": 8, "kblk": 1}
        p = _estimate_cols(rows_e, cols_e, len(cols_e), extra_s=extra_s,
                           mem_scale=s, unit_only=unit_only)
        if s > 1 and p["feasible"]:
            for q in (p,) + ((p["alt"],) if p.get("alt") else ()):
                q["est_s"] = s * (q["est_s"] - extra_s) + extra_s
                q["slots"] = s * q["slots"]
                q["sampled"] = s
                for k in ("order", "sizes", "bases", "urows", "unit_ids"):
                    q.pop(k, None)        # sample-only layout: convert redoes
        if p.get("alt"):
            p["alt"].update(feasible=True, hub_cols=None, cols_eff=None,
                            hub_off=0)
        return p

    def _df_scale(pp):
        if unit_only and pp.get("feasible"):
            pp["est_s"] = pp["est_s"] * DF_COST
            if pp.get("alt"):
                pp["alt"]["est_s"] = pp["alt"]["est_s"] * DF_COST
        return pp

    plan = _est(cols0)
    plan.update(hub_cols=None, cols_eff=None, hub_off=0)
    if plan["feasible"] and plan["slots"] <= 1.8 * coo.nnz:
        return _df_scale(plan)
    degs = np.bincount(cols0, minlength=coo.n_col)
    hub_cols, cols_eff, off = _hub_relabel(cols0, degs, coo.n_col)
    if hub_cols is None:
        return _df_scale(plan)
    plan2 = _est(cols_eff, extra_s=len(hub_cols) / HUB_GATHER_RATE)
    if plan2["feasible"] and plan2["est_s"] < plan["est_s"]:
        plan2.update(hub_cols=hub_cols, cols_eff=cols_eff, hub_off=off)
        return _df_scale(plan2)
    return _df_scale(plan)


def convert(coo: COOMatrix, cfg: Config, plan: dict = None) -> SlabState:
    if plan is None:
        plan = estimate(coo, cfg)
    if not plan["feasible"]:
        if coo.nnz == 0:
            return _empty_state(coo, cfg)
        raise ValueError("slab: padding/collision bounds exceeded "
                         f"(slots={plan['slots']}, nnz={coo.nnz})")
    if plan.get("sampled"):
        # the estimate ran on a row-unit sample: materialize the exact layout
        # for the winning candidate only (one sort + one walk)
        rows0 = hm.astype(coo.row, np.int64)
        cols_x = plan["cols_eff"] if plan.get("cols_eff") is not None \
            else hm.astype(coo.col, np.int64)
        fixed = {"mode": plan["mode"], "m": plan["m"], "t": plan["t"],
                 "planes": plan["planes"], "kblk": plan.get("kblk", 1)}
        full = _estimate_cols(rows0, cols_x, coo.nnz, fixed=fixed)
        if not full["feasible"]:
            raise ValueError("slab: sampled plan infeasible at full scale "
                             f"(slots={full.get('slots')}, nnz={coo.nnz})")
        for k in ("hub_cols", "cols_eff", "hub_off"):
            full[k] = plan.get(k)
        full["hub_off"] = plan.get("hub_off", 0)
        plan = full
    m, t_step = plan["m"], plan["t"]
    mode, planes = plan["mode"], plan["planes"]
    kblk = plan.get("kblk", 1)
    dtype = cfg.np_dtype

    o = plan["order"]
    sizes, bases = plan["sizes"], plan["bases"]
    urows, unit_ids = plan["urows"], plan["unit_ids"]
    rows = hm.astype(coo.row, np.int64)
    cols = plan["cols_eff"] if plan.get("cols_eff") is not None \
        else hm.astype(coo.col, np.int64)
    hub_cols, hub_off = plan.get("hub_cols"), plan.get("hub_off", 0)
    n_col_eff = (hub_off + len(hub_cols)) if hub_cols is not None \
        else coo.n_col
    rows, cols = rows[o], cols[o]
    vals = hm.astype(coo.val, dtype)[o]

    # pad scopes for the block span; map walk rows → final rows
    n_units = len(urows)
    rows_pad = _pad_units(urows, t_step, planes // 8) if mode == "unit" \
        else _pad_blocks(urows, t_step, planes // kblk)
    h = int(rows_pad.sum())
    ustart = np.concatenate([[0], np.cumsum(rows_pad)[:-1]])
    wstart = np.concatenate([[0], np.cumsum(urows)[:-1]])
    ur = np.repeat(hm.arange(n_units), urows)      # unit per walk row
    final_row = ustart[ur] + (hm.arange(len(sizes)) - wstart[ur])

    # per-slot stream row (walk order = col-sorted), then re-sort slots by
    # (stream row, y row) so each y row is one contiguous run; stable sort
    # keeps the walk's col order inside each run
    sr0 = final_row[np.repeat(hm.arange(len(sizes)), sizes)]
    o2 = hm.argsort_keys(sr0 * np.int64(coo.n_row) + rows)
    rows, cols, vals, sr = rows[o2], cols[o2], vals[o2], sr0[o2]
    new_row_b = np.concatenate([[True], sr[1:] != sr[:-1]])
    starts = np.flatnonzero(new_row_b)
    li = hm.arange(len(rows)) - starts[np.cumsum(new_row_b) - 1]

    lane = hm.zeros((h, LANES), np.int8)
    sub = hm.zeros((h, LANES), np.int8)
    val = hm.zeros((h, LANES), dtype)
    hm1 = hm.zeros((h, LANES), np.int8)
    win_b = hm.zeros(h, np.int32)

    win_b[final_row] = bases.astype(np.int32)
    cb = cols >> 7
    lane[sr, li] = (cols & (LANES - 1)).astype(np.int8)
    sub[sr, li] = (cb - win_b[sr]).astype(np.int8)
    val[sr, li] = vals

    # runs: contiguous per (stream row, y row) by the sort
    new_run = hm.zeros(len(rows), np.bool_)
    new_run[0] = True
    new_run[1:] = (rows[1:] != rows[:-1]) | (sr[1:] != sr[:-1])
    q = sr * LANES + li
    head_q = np.maximum.accumulate(np.where(new_run, q, -1))
    hm1[sr, li] = (head_q - sr * LANES - 1).astype(np.int8)

    end = hm.zeros(len(rows), np.bool_)
    end[:-1] = new_run[1:]
    end[-1] = True
    r_run, sr_run, e_lane = rows[end], sr[end], li[end]

    # steps: first unit per step = unit of the step's first stream row
    n_steps = h // t_step
    unit_of_frow = np.repeat(hm.arange(n_units),
                             rows_pad.astype(np.int64))
    uids = unit_of_frow[::t_step].astype(np.int32)
    assert len(uids) == n_steps

    ur_run = unit_of_frow[sr_run]
    first_run = uids[sr_run // t_step].astype(np.int64)
    off = ur_run - first_run
    l_run = r_run & (LANES - 1)
    sig = None
    sg0_s = sg1_s = None
    pg_route = 2
    if mode == "unit":
        # σ ∈ [0, planes): span-local sublane — offset 8 per unit past first
        assert off.min(initial=0) >= 0 and \
            off.max(initial=0) <= planes // 8 - 1, \
            "slab: a grid step spans more units than the block covers"
        sigma = ((r_run & (UNIT_ROWS - 1)) >> 7) + 8 * off
        # σ-planes never collide: (σ, l) ↔ row inside the block span, one
        # run per row per stream row (slots row-sorted within stream rows)
        idx = hm.full((planes, h, LANES), -1, np.int8)
        idx[sigma, sr_run, l_run] = e_lane.astype(np.int8)
        # per-step active σ range (kernel plane-group pruning); run ends
        # are stream-row-sorted so reduceat segments are contiguous
        sg0_s = hm.zeros(n_steps, np.int32)
        sg1_s = hm.full(n_steps, -1, np.int32)
        if len(sr_run):
            s_of = (sr_run // t_step).astype(np.int64)
            bnd = np.flatnonzero(
                np.concatenate([[True], s_of[1:] != s_of[:-1]]))
            sg0_s[s_of[bnd]] = np.minimum.reduceat(sigma, bnd).astype(
                np.int32)
            sg1_s[s_of[bnd]] = np.maximum.reduceat(sigma, bnd).astype(
                np.int32)
            # plane-group granularity: when nearly every plane is active on
            # a typical step (scattered units: window groups restart rows
            # per stream row), pruning can't fire — collapse to one branch
            # (pg = planes) to avoid the measured ~5% multi-branch overhead
            act_mean = float(np.mean(np.maximum(
                sg1_s - sg0_s + 1, 0))) if n_steps else 0.0
            pg_route = planes if act_mean >= 0.7 * planes else 2
    else:
        # plane j of idx holds runs destined to the group's j-th 128-row
        # block (rows inside one block are lane-distinct); σ per STREAM ROW
        # = group offset · kblk, routed through kblk MXU one-hot matmuls
        assert off.min(initial=0) >= 0 and \
            off.max(initial=0) < planes // kblk, \
            "slab: a grid step spans more block-groups than the output covers"
        j_run = (r_run >> 7) & np.int64(kblk - 1) if kblk > 1 \
            else np.zeros(len(r_run), np.int64)
        idx = hm.full((kblk, h, LANES), -1, np.int8)
        idx[j_run, sr_run, l_run] = e_lane.astype(np.int8)
        sig_row = hm.zeros(h, np.int8)
        sig_row[final_row] = (
            (ur - uids[(final_row // t_step).astype(np.int64)]) * kblk
        ).astype(np.int8)
        sig = np.broadcast_to(sig_row[:, None], (h, LANES)).copy()

    if mode == "blk" and kblk > 1:
        # out slabs / y scatter are per 128-row BLOCK-SLOT (kblk per group)
        uids = (uids.astype(np.int64) * kblk).astype(np.int32)
        unit_ids = (unit_ids.astype(np.int64)[:, None] * kblk
                    + np.arange(kblk)).ravel().astype(np.int32)
        n_units = n_units * kblk

    # units never first in any step get their (unwritten) lo block masked
    written = hm.zeros(n_units, np.bool_)
    written[uids.astype(np.int64)] = True
    lo_mask = written.astype(dtype).reshape(n_units, 1)

    # x table must cover every (base + m) range end
    cb_tot = cdiv(max(n_col_eff, 1), LANES)
    cb_pad = cb_tot + m

    # split the stream into SMEM-prefetch-sized chunks (one pallas_call each)
    is_df = cfg.dtype == "float64"
    cz = _chunk_cuts(uids, n_steps, t_step, n_units)
    u_t, w_t, la_t, su_t, va_t, hm_t, ix_t, sg_t = \
        [], [], [], [], [], [], [], []
    s0_t, s1_t = [], []
    vl_t = []
    for s0, s1, u0, _nu in cz:
        r0, r1 = s0 * t_step, s1 * t_step
        u_t.append(device_put((uids[s0:s1] - u0).astype(np.int32)))
        w_t.append(device_put(win_b[r0:r1]))
        la_t.append(device_put(lane[r0:r1]))
        su_t.append(device_put(sub[r0:r1]))
        if is_df:
            from ..ops.df64 import df_from_f64

            vhi, vlo = df_from_f64(val[r0:r1])
            va_t.append(device_put(vhi))
            vl_t.append(device_put(vlo))
        else:
            va_t.append(device_put(val[r0:r1]))
        hm_t.append(device_put(hm1[r0:r1]))
        ix_t.append(device_put(idx[:, r0:r1]))
        if sig is not None:
            sg_t.append(device_put(sig[r0:r1]))
        if sg0_s is not None:
            s0_t.append(device_put(sg0_s[s0:s1]))
            s1_t.append(device_put(sg1_s[s0:s1]))

    return SlabState(
        n_row=coo.n_row, n_col=coo.n_col, nnz=coo.nnz, m=m, t_step=t_step,
        planes=planes, mode=mode, n_units=n_units, cb_pad=cb_pad,
        n_slots=h * LANES,
        hub_off=hub_off if hub_cols is not None else 0,
        chunk_nu=tuple(c[3] for c in cz),
        uids=tuple(u_t), win=tuple(w_t),
        lane=tuple(la_t), sub=tuple(su_t), val=tuple(va_t),
        hm1=tuple(hm_t), idx=tuple(ix_t),
        unit_ids=device_put(unit_ids), lo_mask=device_put(lo_mask),
        hub_cols=device_put(hub_cols) if hub_cols is not None else None,
        sig=tuple(sg_t) if sig is not None else None,
        sg0=tuple(s0_t) if sg0_s is not None else None,
        sg1=tuple(s1_t) if sg0_s is not None else None,
        pg=pg_route, val_lo=tuple(vl_t) if is_df else None)


def _empty_state(coo, cfg):
    dtype = cfg.np_dtype
    return SlabState(
        n_row=coo.n_row, n_col=coo.n_col, nnz=0, m=1, t_step=32, planes=8,
        mode="unit", n_units=0, cb_pad=1, n_slots=0, hub_off=0,
        chunk_nu=(0,),
        uids=(device_put(hm.zeros(0, np.int32)),),
        win=(device_put(hm.zeros(0, np.int32)),),
        lane=(device_put(hm.zeros((0, LANES), np.int8)),),
        sub=(device_put(hm.zeros((0, LANES), np.int8)),),
        val=(device_put(hm.zeros((0, LANES), dtype)),),
        hm1=(device_put(hm.zeros((0, LANES), np.int8)),),
        idx=(device_put(hm.full((8, 0, LANES), -1, np.int8)),),
        unit_ids=device_put(hm.zeros(0, np.int32)),
        lo_mask=device_put(hm.zeros((0, 1), dtype)))


# -------------------------------------------------------------------- spmv ---

def spmv(state: SlabState, x):
    import jax.numpy as jnp

    from ..ops import pallas as pallas_pkg
    from ..ops.pallas.slab import slab_spmv

    n = state.n_row
    if state.nnz == 0 or state.n_units == 0:
        return jnp.zeros((n,), x.dtype)
    if state.val_lo is not None and x.dtype == jnp.float64:
        return _spmv_df(state, x)
    if not pallas_pkg.supports(x.dtype):
        raise TypeError(
            "slab runs Pallas kernels: use float32/bfloat16 on TPU (f64 is "
            "Mosaic-unsupported; pick csr/ss for an f64 XLA path)")
    xp = jnp.zeros((state.cb_pad * LANES,), x.dtype)
    xp = xp.at[: state.n_col].set(x)
    if state.hub_cols is not None:
        app = jnp.take(x, state.hub_cols, axis=0)
        xp = xp.at[state.hub_off: state.hub_off + app.shape[0]].set(app)
    xp = xp.reshape(state.cb_pad, LANES)
    if state.mode == "blk":
        from ..ops.pallas.slab import slab_spmv_blk

        outs = [
            slab_spmv_blk(u, w, la, su, va, h1, ix, sg, xp,
                          nu_c, state.m, state.planes, state.t_step)
            for u, w, la, su, va, h1, ix, sg, nu_c in zip(
                state.uids, state.win, state.lane, state.sub, state.val,
                state.hm1, state.idx, state.sig, state.chunk_nu)]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        outv = out.reshape(state.n_units, state.planes, LANES)
        ok = (state.lo_mask > 0)[:, None, :]
        outv = jnp.where(ok, outv, jnp.zeros((), x.dtype))
        # diagonal shift-add: out block f row j → compact block f + j
        yb = outv[:, 0, :]
        for j in range(1, min(state.planes, state.n_units)):
            yb = yb + jnp.concatenate(
                [jnp.zeros((j, LANES), yb.dtype), outv[:-j, j, :]], axis=0)
        nb_tot = cdiv(max(n, 1), LANES)
        y2 = jnp.zeros((nb_tot, LANES), x.dtype)
        y2 = y2.at[state.unit_ids].set(yb, mode="drop", unique_indices=True)
        return y2.reshape(-1)[:n]
    sg0s = state.sg0 or tuple(jnp.zeros_like(u) for u in state.uids)
    sg1s = state.sg1 or tuple(jnp.full_like(u, state.planes - 1)
                              for u in state.uids)
    outs = [
        slab_spmv(u, s0, s1, w, la, su, va, h1, ix, xp, nu_c, state.m,
                  state.t_step, getattr(state, "pg", 2) or 2)
        for u, s0, s1, w, la, su, va, h1, ix, nu_c in zip(
            state.uids, sg0s, sg1s, state.win, state.lane, state.sub,
            state.val, state.hm1, state.idx, state.chunk_nu)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if state.planes == 8:
        yu = out.reshape(state.n_units, UNIT_ROWS)
    else:
        # pair-block overlap-add: block u rows 0-7 → unit u, 8-15 → unit u+1
        out3 = out.reshape(state.n_units, 2, UNIT_ROWS)
        ok = state.lo_mask > 0
        zero = jnp.zeros((), x.dtype)
        yu = jnp.where(ok, out3[:, 0, :], zero)  # unwritten blocks: garbage
        hi = jnp.where(ok, out3[:, 1, :], zero)  # (NaN · 0 would stay NaN)
        yu = yu + jnp.concatenate(
            [jnp.zeros((1, UNIT_ROWS), yu.dtype), hi[:-1]], axis=0)
    nu_tot = cdiv(max(n, 1), UNIT_ROWS)
    y2 = jnp.zeros((nu_tot, UNIT_ROWS), x.dtype)
    y2 = y2.at[state.unit_ids].set(yu, mode="drop", unique_indices=True)
    return y2.reshape(-1)[:n]


def _spmv_df(state: SlabState, x):
    """df64 unit-mode SpMV: real f64 semantics on f32 hardware.

    The value/x planes ride as (hi, lo) f32 pairs through the compensated
    kernel (ops/pallas/slab.slab_spmv_df); the only f64 (XLA-emulated) work
    is the final dense hi+lo assembly over n_row elements.  Reference f64
    contract: src/util.h:7-39."""
    import jax.numpy as jnp

    from ..ops.df64 import df_split_device
    from ..ops.pallas.slab import slab_spmv_df

    n = state.n_row
    xp = jnp.zeros((state.cb_pad * LANES,), x.dtype)
    xp = xp.at[: state.n_col].set(x)
    if state.hub_cols is not None:
        app = jnp.take(x, state.hub_cols, axis=0)
        xp = xp.at[state.hub_off: state.hub_off + app.shape[0]].set(app)
    xh, xl = df_split_device(xp)
    xh = xh.reshape(state.cb_pad, LANES)
    xl = xl.reshape(state.cb_pad, LANES)
    sg0s = state.sg0 or tuple(jnp.zeros_like(u) for u in state.uids)
    sg1s = state.sg1 or tuple(jnp.full_like(u, state.planes - 1)
                              for u in state.uids)
    pairs = [
        slab_spmv_df(u, s0, s1, w, la, su, vh, vl, h1, ix, xh, xl, nu_c,
                     state.m, state.t_step, getattr(state, "pg", 2) or 2)
        for u, s0, s1, w, la, su, vh, vl, h1, ix, nu_c in zip(
            state.uids, sg0s, sg1s, state.win, state.lane, state.sub,
            state.val, state.val_lo, state.hm1, state.idx, state.chunk_nu)]
    oh = (pairs[0][0] if len(pairs) == 1
          else jnp.concatenate([p[0] for p in pairs], axis=0))
    ol = (pairs[0][1] if len(pairs) == 1
          else jnp.concatenate([p[1] for p in pairs], axis=0))
    out = oh.astype(x.dtype) + ol.astype(x.dtype)
    if state.planes == 8:
        yu = out.reshape(state.n_units, UNIT_ROWS)
    else:
        out3 = out.reshape(state.n_units, 2, UNIT_ROWS)
        ok = state.lo_mask > 0
        zero = jnp.zeros((), x.dtype)
        yu = jnp.where(ok, out3[:, 0, :], zero)
        hi = jnp.where(ok, out3[:, 1, :], zero)
        yu = yu + jnp.concatenate(
            [jnp.zeros((1, UNIT_ROWS), yu.dtype), hi[:-1]], axis=0)
    nu_tot = cdiv(max(n, 1), UNIT_ROWS)
    y2 = jnp.zeros((nu_tot, UNIT_ROWS), x.dtype)
    y2 = y2.at[state.unit_ids].set(yu, mode="drop", unique_indices=True)
    return y2.reshape(-1)[:n]


PANEL_B_MAX = 32           # unit-mode panel kernel: unrolls B in-kernel


def spmm(state: SlabState, X):
    """SpMM panel path (unit mode): one kernel pass reads the index/value
    streams once for all B columns (a vmap re-streams ~15 B/slot per column
    and pays the per-step fixed cost B times).  blk mode / oversized panels
    fall back to the vmap."""
    import jax
    import jax.numpy as jnp

    from ..ops import pallas as pallas_pkg

    B = X.shape[1]
    table_bytes = state.cb_pad * LANES * X.dtype.itemsize
    if (state.mode != "unit" or state.nnz == 0 or state.n_units == 0
            or B < 2 or B > PANEL_B_MAX
            or B * table_bytes > X_TABLE_CAP
            or not pallas_pkg.supports(X.dtype)):
        return jax.vmap(spmv, in_axes=(None, 1), out_axes=1)(state, X)
    from ..ops.pallas.slab import slab_spmm

    xp = jnp.zeros((B, state.cb_pad * LANES), X.dtype)
    xp = xp.at[:, : state.n_col].set(X.T)
    if state.hub_cols is not None:
        app = jnp.take(X, state.hub_cols, axis=0)          # (n_hub, B)
        xp = xp.at[:, state.hub_off: state.hub_off + app.shape[0]].set(app.T)
    xp = xp.reshape(B, state.cb_pad, LANES)

    outs = [slab_spmm(u, w, la, su, va, h1, ix, xp, nu_c, state.m,
                      state.t_step)
            for u, w, la, su, va, h1, ix, nu_c in zip(
                state.uids, state.win, state.lane, state.sub, state.val,
                state.hm1, state.idx, state.chunk_nu)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    outv = out.reshape(state.n_units, B, state.planes * LANES)
    if state.planes == 8:
        yu = outv                                          # (nu, B, 1024)
    else:
        out4 = outv.reshape(state.n_units, B, 2, UNIT_ROWS)
        ok = (state.lo_mask > 0)[:, None, :]               # (nu, 1, 1)
        zero = jnp.zeros((), X.dtype)
        yu = jnp.where(ok, out4[:, :, 0, :], zero)
        hi = jnp.where(ok, out4[:, :, 1, :], zero)
        yu = yu + jnp.concatenate(
            [jnp.zeros((1, B, UNIT_ROWS), yu.dtype), hi[:-1]], axis=0)
    nu_tot = cdiv(max(state.n_row, 1), UNIT_ROWS)
    y2 = jnp.zeros((nu_tot, B, UNIT_ROWS), X.dtype)
    y2 = y2.at[state.unit_ids].set(yu, mode="drop", unique_indices=True)
    return y2.transpose(0, 2, 1).reshape(-1, B)[: state.n_row]


# ----------------------------------------------------------------- reports ---

def report_fields(state: SlabState, cfg: Config) -> dict:
    return {"WindowBlocks": state.m, "StepRows": state.t_step,
            "RoutePlanes": state.planes,
            "PadFactor": round(state.n_slots / max(state.nnz, 1), 3)}


def traffic_bytes(state: SlabState, cfg: Config) -> int:
    vsz = np.dtype(cfg.dtype).itemsize
    if state.mode == "blk":
        per_slot = vsz + 4 + state.idx[0].shape[0]   # lane/sub/hm1/sig + kblk
    else:
        per_slot = vsz + 3 + state.planes
    return (state.n_slots * per_slot + state.n_row * vsz
            + state.cb_pad * LANES * vsz)


def to_coo(state: SlabState) -> COOMatrix:
    # reassemble the chunked stream (host-side; inverse of _chunk_cuts)
    cat = lambda t, ax=0: np.concatenate([np.asarray(a) for a in t], axis=ax)
    lane = cat(state.lane).astype(np.int64)
    sub = cat(state.sub).astype(np.int64)
    val = cat(state.val).astype(np.float64)
    win = cat(state.win).astype(np.int64)
    hm1 = cat(state.hm1).astype(np.int64)
    idx = cat(state.idx, ax=1).astype(np.int64)  # stream axis 1 (both modes)
    u_base = np.cumsum([0] + list(state.chunk_nu[:-1]))
    uids = np.concatenate(
        [np.asarray(u).astype(np.int64) + b
         for u, b in zip(state.uids, u_base)])
    unit_ids = np.asarray(state.unit_ids).astype(np.int64)
    h = lane.shape[0]
    if h == 0:
        return COOMatrix.from_triplets(state.n_row, state.n_col, [], [], [],
                                       sort=True)
    # recover per-slot rows from the route planes: walk runs per stream row
    first_cu = uids[np.repeat(np.arange(h // state.t_step), state.t_step)]
    cols = win[:, None] * LANES + sub * LANES + lane
    if state.hub_cols is not None:
        hub = np.asarray(state.hub_cols).astype(np.int64)
        is_app = cols >= state.hub_off
        cols = np.where(is_app, hub[np.minimum(cols - state.hub_off,
                                               len(hub) - 1)], cols)
    rows = hm.full((h, LANES), -1, np.int64)
    if state.mode == "blk":
        sig = cat(state.sig)[:, 0].astype(np.int64)
        for j in range(idx.shape[0]):       # idx: (kblk, H, 128)
            valid = idx[j] >= 0
            sr_i, l_i = np.nonzero(valid)
            end_lane = idx[j][sr_i, l_i]
            blk = unit_ids[first_cu[sr_i] + sig[sr_i] + j]
            rows[sr_i, end_lane] = blk * LANES + l_i
    else:
        for sigma in range(idx.shape[0]):
            e = idx[sigma]
            valid = e >= 0
            sr_i, l_i = np.nonzero(valid)
            end_lane = e[sr_i, l_i]
            cu = first_cu[sr_i] + (sigma >= 8)
            rr = unit_ids[cu] * UNIT_ROWS + (sigma % 8) * LANES + l_i
            rows[sr_i, end_lane] = rr
    # propagate row ids backward across each run (ends carry the id);
    # slot j+1 heads a new run iff hm1[j+1] == j, i.e. its run head is j+1
    for j in range(LANES - 2, -1, -1):
        unset = rows[:, j] < 0
        same_run = hm1[:, j + 1] != j
        carry = same_run & unset
        rows[carry, j] = rows[carry, j + 1]
    mask = (rows >= 0) & (val != 0)
    return COOMatrix.from_triplets(
        state.n_row, state.n_col,
        rows[mask], cols[mask], val[mask], sort=True)


def attainable_seconds(state: SlabState, cfg: Config) -> float:
    """Per-plan attainable bound (r5 VERDICT #8): the fitted step-cost model
    evaluated at the CONVERTED state's own (mode, m, t, planes, kblk) and
    real slot count — the engine-specific speed of light, as opposed to the
    HBM roofline (which windowed gather engines cannot reach: their floor is
    the measured select/route VPU rates, not streaming)."""
    if state.n_slots == 0:
        return 0.0
    kblk = state.idx[0].shape[0] if (state.mode == "blk" and state.idx) else 1
    h = state.n_slots // LANES
    sec = _mode_cost(state.mode, state.planes, state.m, h, state.n_slots,
                     state.t_step, 0.0, kblk=kblk)
    if cfg.dtype == "float64":
        sec *= DF_COST
    # x table residency + y writeback
    sec += (state.cb_pad * LANES + 2 * state.n_row) * 4 / _cc.get("hbm_bps")
    return float(sec)
