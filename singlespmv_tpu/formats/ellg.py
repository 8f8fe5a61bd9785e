"""ELLG — row-positional ELL with group-select lane gather: the light-row path.

The natural-suite killer class is *light local rows* (2-16 nnz/row, columns
near the diagonal: circuit/econ/FEM meshes — ASIC_680ks, mac_econ, twotone).
Bucketed bkt pays bucket padding that explodes as rows get lighter, and CSR
pays the 0.14 G elem/s XLA gather.  ELLG instead gives EVERY row a fixed
t-slot window in natural row order:

  slots[r·t .. (r+1)·t) = row r's first entries (col-sorted), zero-padded.

- **Gather**: the stream is (H, 128) stage-A rows of 128/t matrix rows each;
  each stage-A row carries up to m member col-blocks (the same
  ops.pallas.bucket.block_gather_mul m-way-select kernel as bkt) — locality
  makes ≤ m col-blocks per 128-slot window the common case.
- **Combine**: y = prod.reshape(n_pad, t).sum(axis=1) — a single minor-axis
  XLA reduction.  No stage B, no routing tables, no scatter.
- **Rest**: entries beyond t per row, or beyond the m-member budget per
  window, convert into an internal rest engine (bkt grouped — heavy rows are
  exactly bkt's sweet spot — with csr as the last resort); y adds are
  full-length vector adds, never scatters.

No reference analog as a format; the row-windowing discipline mirrors the
reference ELL's K-padding (/root/reference/src/opt_ell.cpp:27-59) with the
padding bounded per-row instead of by the global max.
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..core import hostmem as hm
from ..core.types import COOMatrix, cdiv, round_up
from .base import device_put, pytree_dataclass

LANES = 128
W_A = 1024
M_MEMBERS = 8          # member col-blocks per stage-A sublane row
T_MAX = 128            # largest per-row window (t is a power of two ≤ this)
PAD_LIMIT = 8.0        # slots/nnz bound (beyond: too little captured)


def plan_t(degrees: np.ndarray, nnz: int) -> tuple:
    """Pick the window size t: minimize total cost ≈ ellg slots + 3× rest nnz
    (the rest engine's padded-slot cost per entry, measured ballpark)."""
    best = None
    for t in (2, 4, 8, 16, 32, 64, 128):
        light = np.minimum(degrees, t)
        captured = int(light.sum())
        rest = nnz - captured
        cost = len(degrees) * t + 3 * rest
        if best is None or cost < best[0]:
            best = (cost, t, captured)
    return best[1], best[2]


def estimate(coo: COOMatrix, cfg: Config) -> dict:
    """Convert-free plan for formats.auto — including the exact member-budget
    spill (the 2%-locality assumption mispriced stripe matrices by 50x:
    Hamrle3's random-offset stripes spill most windows past M members)."""
    n, nnz = coo.n_row, coo.nnz
    if nnz == 0:
        return {"t": 2, "slots": 0, "rest_nnz": 0, "feasible": False}
    rows = coo.row.astype(np.int64)
    deg = np.bincount(rows, minlength=n)
    t, captured = plan_t(deg, nnz)
    slots = round_up(n, max(1, LANES // t)) * t
    # exact spill: rank (window, col-block) pairs by count, keep top M
    win = rows // (W_A // t)
    pair = win * ((coo.n_col >> 7) + 1) + (coo.col.astype(np.int64) // LANES)
    up, cnt = np.unique(pair, return_counts=True)
    w = up // ((coo.n_col >> 7) + 1)
    o = np.lexsort((-cnt, w))
    wfirst = np.empty(len(o), dtype=bool)
    if len(o):
        wfirst[0] = True
        wfirst[1:] = w[o][1:] != w[o][:-1]
    rank = np.arange(len(o)) - np.maximum.accumulate(
        np.where(wfirst, np.arange(len(o)), -1))
    spill = int(cnt[o][rank >= M_MEMBERS].sum())
    rest = (nnz - captured) + spill
    feasible = (slots <= PAD_LIMIT * nnz + (1 << 16)
                and captured >= nnz // 4 and rest <= nnz // 2)
    return {"t": t, "slots": slots, "rest_nnz": rest, "feasible": feasible}


@pytree_dataclass(meta=("n_row", "n_col", "nnz", "t", "n_pad", "n_slots",
                        "rest_fmt", "rest_nnz", "m"))
class ELLGState:
    n_row: int
    n_col: int
    nnz: int
    t: int            # slots per row
    n_pad: int        # rows incl. padding to whole stage-A rows
    n_slots: int
    rest_fmt: str     # "" | "bkt_g" | "csr"
    rest_nnz: int
    m: int
    members: object   # (H·8·m,) int32 — member col-blocks per sublane row
    lane: object      # (H, W_A) int8 — in-block column
    src: object       # (H, W_A) int8 — member index per slot
    val: object       # (H, W_A) values
    rest_state: object = None


def convert(coo: COOMatrix, cfg: Config) -> ELLGState:
    n_row, n_col, nnz = coo.n_row, coo.n_col, coo.nnz
    CB = cdiv(max(n_col, 1), LANES)

    rows = hm.astype(coo.row, np.int64)
    cols = hm.astype(coo.col, np.int64)
    deg = np.bincount(rows, minlength=n_row) if nnz else \
        np.zeros(n_row, np.int64)
    t, _ = plan_t(deg, max(nnz, 1))
    rpa = LANES // t                     # matrix rows per 128-slot window
    n_pad = round_up(max(n_row, 1), rpa * 8 * (W_A // LANES))
    N = n_pad * t

    # within-row order: by column (keeps each window's col-blocks clustered)
    order = np.lexsort((cols, rows)) if nnz else np.zeros(0, np.int64)
    r_s = rows[order]
    c_s = cols[order]
    v_s = hm.astype(coo.val, cfg.np_dtype)[order]
    within = hm.arange(nnz)
    row_start = hm.zeros(n_row + 1, np.int64)
    np.cumsum(deg, out=row_start[1:])
    within = within - row_start[r_s]
    fits = within < t

    # member budget per stage-A sublane row (W_A slots = W_A/t matrix rows):
    # keep the M most loaded col-blocks of the window (locality makes ≤ M the
    # common case; the tail spills to the rest engine)
    slot = r_s * t + within
    win = slot // W_A
    cb = c_s // LANES
    n_win = N // W_A
    keep = fits.copy()
    members = hm.zeros((n_win, M_MEMBERS), np.int32)
    src_of = hm.zeros(max(nnz, 1), np.int8)
    if nnz:
        # rank (window, cb) pairs by count, assign up to M members per window
        pair = win[fits] * CB + cb[fits]
        up, cnt = np.unique(pair, return_counts=True)
        o = np.lexsort((-cnt, up // CB))      # per window: heaviest cb first
        up_r = up[o]
        wfirst = np.empty(len(up_r), dtype=bool)
        if len(up_r):
            wfirst[0] = True
            wfirst[1:] = (up_r[1:] // CB) != (up_r[:-1] // CB)
        rank = np.arange(len(up_r)) - np.maximum.accumulate(
            np.where(wfirst, np.arange(len(up_r)), -1))
        ok = rank < M_MEMBERS
        members[up_r[ok] // CB, rank[ok]] = (up_r[ok] % CB).astype(np.int32)
        # map each kept entry to its member slot (or spill to the rest engine)
        so = np.argsort(up_r[ok], kind="stable")
        lut_keys = up_r[ok][so]
        lut_vals = rank[ok][so]
        keep_idx = np.nonzero(fits)[0]
        match = np.zeros(len(pair), dtype=bool)
        src_fit = np.zeros(len(pair), np.int8)
        if len(lut_keys):
            pos = np.clip(np.searchsorted(lut_keys, pair), 0,
                          len(lut_keys) - 1)
            match = lut_keys[pos] == pair
            src_fit[match] = lut_vals[pos[match]].astype(np.int8)
        keep[keep_idx[~match]] = False
        src_of[keep_idx] = src_fit

    # ---- slot arrays ---------------------------------------------------------
    lane_a = hm.zeros(N, np.int8)
    src_a = hm.zeros(N, np.int8)
    val_a = hm.zeros(N, cfg.np_dtype)
    ks = keep & fits
    lane_a[slot[ks]] = (c_s[ks] % LANES).astype(np.int8)
    src_a[slot[ks]] = src_of[ks]
    val_a[slot[ks]] = v_s[ks]

    members_flat = hm.astype(members.reshape(-1), np.int32)

    # ---- rest: overflow + member spills --------------------------------------
    rest = ~ks
    rest_fmt = ""
    rest_state = None
    rest_nnz = int(rest.sum())
    if rest_nnz:
        rcoo = COOMatrix.from_triplets(
            n_row, n_col, r_s[rest], c_s[rest],
            np.asarray(coo.val)[order][rest], sort=True)
        from . import bkt as bkt_mod
        from . import csr as csr_mod

        try:
            rest_state = bkt_mod.convert(
                rcoo, cfg.replace(format="bkt", bkt_row_group=1024))
            rest_fmt = "bkt_g"
        except (ValueError, TypeError):
            if rest_nnz > max(nnz // 20, 1 << 14):
                # a large rest on the 0.14 G elem/s XLA-gather csr path would
                # dominate the whole SpMV — let auto pick something else
                raise ValueError(
                    f"ellg: rest {rest_nnz}/{nnz} entries would ride the "
                    "csr gather path; structure unsuited to ellg")
            rest_state = csr_mod.convert(rcoo, cfg)
            rest_fmt = "csr"

    return ELLGState(
        n_row=n_row, n_col=n_col, nnz=nnz, t=t, n_pad=n_pad, n_slots=N,
        rest_fmt=rest_fmt, rest_nnz=rest_nnz, m=M_MEMBERS,
        members=device_put(members_flat),
        lane=device_put(lane_a.reshape(N // W_A, W_A)),
        src=device_put(src_a.reshape(N // W_A, W_A)),
        val=device_put(val_a.reshape(N // W_A, W_A)),
        rest_state=rest_state,
    )


def spmv(state: ELLGState, x):
    import jax.numpy as jnp

    from ..ops import pallas as pallas_pkg

    if not pallas_pkg.supports(x.dtype):
        raise TypeError("ellg runs Pallas kernels: use float32/bfloat16")
    from ..ops.pallas.bucket import block_gather_mul

    CB = cdiv(max(state.n_col, 1), LANES)
    xp = jnp.zeros((CB * LANES,), x.dtype).at[: state.n_col].set(x)
    prod = block_gather_mul(state.members, state.lane, state.src, state.val,
                            xp.reshape(CB, LANES), state.m)
    y = prod.reshape(state.n_pad, state.t).sum(axis=1)[: state.n_row]
    if state.rest_fmt:
        from . import bkt as bkt_mod
        from . import csr as csr_mod

        mod = bkt_mod if state.rest_fmt == "bkt_g" else csr_mod
        y = y + mod.spmv(state.rest_state, x)
    return y


def spmm(state: ELLGState, X):
    import jax

    return jax.vmap(spmv, in_axes=(None, 1), out_axes=1)(state, X)


def report_fields(state: ELLGState, cfg: Config) -> dict:
    return {"WindowT": state.t, "RestFormat": (state.rest_fmt or "none").upper(),
            "RestNnz": state.rest_nnz,
            "PadFactor": round(state.n_slots / max(state.nnz, 1), 3)}


def traffic_bytes(state: ELLGState, cfg: Config) -> int:
    vsz = np.dtype(cfg.dtype).itemsize
    main = state.n_slots * (2 + 2 * vsz) + state.n_row * vsz
    if state.rest_fmt == "bkt_g":
        from . import bkt as bkt_mod

        return main + bkt_mod.traffic_bytes(state.rest_state, cfg)
    if state.rest_fmt == "csr":
        return main + state.rest_nnz * (vsz + 4)
    return main


def to_coo(state: ELLGState) -> COOMatrix:
    val = np.asarray(state.val).reshape(-1)
    lane = np.asarray(state.lane).reshape(-1).astype(np.int64)
    src = np.asarray(state.src).reshape(-1).astype(np.int64)
    mem = np.asarray(state.members).reshape(-1, state.m).astype(np.int64)
    N = state.n_slots
    win = np.arange(N) // W_A
    col = mem[win, src] * LANES + lane
    rows = np.arange(N) // state.t
    keep = val != 0
    rows, col, val = rows[keep], col[keep], val[keep]
    if state.rest_fmt:
        from . import bkt as bkt_mod
        from . import csr as csr_mod

        mod = bkt_mod if state.rest_fmt == "bkt_g" else csr_mod
        rc = mod.to_coo(state.rest_state)
        rows = np.concatenate([rows, rc.row.astype(rows.dtype)])
        col = np.concatenate([col, rc.col.astype(col.dtype)])
        val = np.concatenate([val, rc.val])
    return COOMatrix.from_triplets(state.n_row, state.n_col, rows, col, val,
                                   sort=True, sum_duplicates=True)
