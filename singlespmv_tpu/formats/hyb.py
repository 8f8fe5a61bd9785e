"""HYB — dense-diagonal peel + scattered residual (the natural-suite workhorse).

Most of the reference's 26 SuiteSparse matrices are *mixtures*: dense or
near-dense diagonal stripes (3-D stencils, circuit diagonals, spectral bands,
Jacobian coupling stripes) carrying 20-100% of the nnz, plus a scattered
remainder.  On CPU the stripes and the scatter cost the same (cache-served
gathers, reference `opt_dia.cpp` vs `opt_crs.cpp`); on TPU they differ by ~50x:
a dense diagonal streams with *zero index arrays* (dia: measured 176-190
GFLOPS) while scattered nnz ride the bucketed lane-gather path (bkt: 2-8
GFLOPS).  So the structure-adaptive move is to split the matrix by diagonal
density and give each part its optimal engine:

- every diagonal offset whose nnz count clears a cost-model threshold is
  peeled into a DIA table (``formats.dia`` — static shifted slices of x);
- the residual rides the best scattered format (slab / bkt / bkt_g / bsr /
  css / ellg, chosen by the same cost model ``formats.auto`` uses).

This is the TPU analog of the classic GPU HYB (ELL+COO) split, re-cut along
the axis that matters on this hardware: streaming vs lane-gather, not row
regularity.  Reference context: DIA kernel `src/opt_dia.cpp:75-92`, format
sweep `script/gen_todo.sh` (the reference benchmarks formats one at a time;
the hybrid is this rebuild's own contribution).
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..core.types import COOMatrix, round_up
from . import dia as dia_mod
from .base import pytree_dataclass

# Cost-model constants (TPU v5e, measured — see PERFORMANCE.md):
HBM_BPS = 700e9          # streamed bytes/s achieved
DIA_BYTES_PER_SLOT = 8   # diag element + x element (f32)
RESID_SEC_PER_NNZ = 0.5e-9   # scattered-path marginal cost (bkt_g ~2-4 GFLOPS)
MAX_PEEL_ELEMENTS = 1 << 28  # respect dia's density guard (1 GiB of f32)


def _diag_histogram(coo: COOMatrix):
    """Offset histogram of col-row; returns (offsets, counts) sorted by count
    descending."""
    if not coo.nnz:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    offs = coo.col.astype(np.int64) - coo.row.astype(np.int64)
    uniq, counts = np.unique(offs, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    return uniq[order], counts[order]


def plan_peel(coo: COOMatrix, cfg: Config):
    """Greedy diagonal selection: peel offsets (densest first) while the DIA
    stream cost of one more diagonal is below the scattered-path cost of its
    nnz, within dia's memory guard.  Returns (peel_offsets, peel_nnz)."""
    uniq, counts = _diag_histogram(coo)
    n_row_pad = round_up(max(coo.n_row, 1), cfg.lane_width)
    dia_sec_per_diag = n_row_pad * DIA_BYTES_PER_SLOT / HBM_BPS
    max_diags = max(0, int(MAX_PEEL_ELEMENTS // max(n_row_pad, 1)))
    gain = counts * RESID_SEC_PER_NNZ
    keep = gain > dia_sec_per_diag
    n_keep = min(int(keep.sum()), max_diags)
    return uniq[:n_keep], int(counts[:n_keep].sum())


def estimate(coo: COOMatrix, cfg: Config) -> dict:
    """Convert-free cost probe for formats.auto: seconds per SpMV if hyb is
    chosen, or infeasible when no diagonal clears the peel threshold."""
    peel_offs, peel_nnz = plan_peel(coo, cfg)
    resid_nnz = coo.nnz - peel_nnz
    feasible = peel_offs.size > 0 and peel_nnz >= max(coo.nnz // 8, 1)
    n_row_pad = round_up(max(coo.n_row, 1), cfg.lane_width)
    dia_sec = peel_offs.size * n_row_pad * DIA_BYTES_PER_SLOT / HBM_BPS
    return {"feasible": feasible, "n_diag": int(peel_offs.size),
            "peel_nnz": peel_nnz, "resid_nnz": int(resid_nnz),
            "dia_sec": dia_sec}


def _split(coo: COOMatrix, peel_offs: np.ndarray, cfg: Config):
    offs = coo.col.astype(np.int64) - coo.row.astype(np.int64)
    on_diag = np.isin(offs, peel_offs)
    dia_coo = COOMatrix.from_triplets(
        coo.n_row, coo.n_col, coo.row[on_diag], coo.col[on_diag],
        coo.val[on_diag], index_bits=cfg.index_bits, sort=True)
    rest_coo = COOMatrix.from_triplets(
        coo.n_row, coo.n_col, coo.row[~on_diag], coo.col[~on_diag],
        coo.val[~on_diag], index_bits=cfg.index_bits, sort=True)
    return dia_coo, rest_coo


@pytree_dataclass(meta=("n_row", "n_col", "nnz", "rest_fmt", "peel_nnz"))
class HYBState:
    n_row: int
    n_col: int
    nnz: int
    rest_fmt: str        # "" when the residual is empty
    peel_nnz: int
    dia_state: object    # DIAState
    rest_state: object   # scattered-format state or None


def _rest_modules():
    # ellg excluded for the same measured-domination reason as in
    # formats.auto.estimate_costs (slab beats it on every r2-suite overlap)
    from . import bkt as bkt_mod
    from . import bsr as bsr_mod
    from . import css as css_mod
    from . import slab as slab_mod
    from . import xch as xch_mod

    return {"bkt": bkt_mod, "bkt_g": bkt_mod, "bsr": bsr_mod, "css": css_mod,
            "slab": slab_mod, "xch": xch_mod}


def convert(coo: COOMatrix, cfg: Config) -> HYBState:
    peel_offs, peel_nnz = plan_peel(coo, cfg)
    if peel_offs.size == 0 and coo.nnz:
        # Stay valid on any input (the planner decides when hyb is *smart*):
        # peel the densest offset so the DIA part is never empty.
        uniq, counts = _diag_histogram(coo)
        peel_offs, peel_nnz = uniq[:1], int(counts[0])
    dia_coo, rest_coo = _split(coo, peel_offs, cfg)
    dia_state = dia_mod.convert(dia_coo, cfg)
    if rest_coo.nnz == 0:
        return HYBState(n_row=coo.n_row, n_col=coo.n_col, nnz=coo.nnz,
                        rest_fmt="", peel_nnz=peel_nnz,
                        dia_state=dia_state, rest_state=None)
    # Residual: pick the cheapest scattered engine with auto's cost model
    # (dia/dense/hyb excluded — the residual has no dense stripes left).
    from .auto import estimate_costs

    costs = estimate_costs(rest_coo, cfg)
    mods = _rest_modules()
    last_err = None
    for name in sorted((k for k in costs if k in mods), key=costs.get):
        ccfg = cfg.replace(bkt_row_group=1024) if name == "bkt_g" else cfg
        try:
            rest_state = mods[name].convert(rest_coo, ccfg)
            return HYBState(n_row=coo.n_row, n_col=coo.n_col, nnz=coo.nnz,
                            rest_fmt=name, peel_nnz=peel_nnz,
                            dia_state=dia_state, rest_state=rest_state)
        except (ValueError, TypeError) as e:
            last_err = e
    raise last_err if last_err else ValueError("hyb: no viable residual format")


def spmv(state: HYBState, x):
    y = dia_mod.spmv(state.dia_state, x)
    if state.rest_fmt:
        y = y + _rest_modules()[state.rest_fmt].spmv(state.rest_state, x)
    return y


def spmm(state: HYBState, X):
    import jax

    y = jax.vmap(dia_mod.spmv, in_axes=(None, 1), out_axes=1)(state.dia_state, X)
    if state.rest_fmt:
        mod = _rest_modules()[state.rest_fmt]
        native = getattr(mod, "spmm", None)
        if native is not None:
            y = y + native(state.rest_state, X)
        else:
            y = y + jax.vmap(mod.spmv, in_axes=(None, 1), out_axes=1)(
                state.rest_state, X)
    return y


def report_fields(state: HYBState, cfg: Config) -> dict:
    out = {"PeelDiags": state.dia_state.n_diag, "PeelNnz": state.peel_nnz,
           "RestFormat": (state.rest_fmt or "none").upper(),
           "RestNnz": state.nnz - state.peel_nnz}
    if state.rest_fmt:
        fn = getattr(_rest_modules()[state.rest_fmt], "report_fields", None)
        if fn:
            out.update({f"Rest{k}": v
                        for k, v in fn(state.rest_state, cfg).items()})
    return out


def traffic_bytes(state: HYBState, cfg: Config) -> int:
    total = dia_mod.traffic_bytes(state.dia_state, cfg)
    if state.rest_fmt:
        fn = getattr(_rest_modules()[state.rest_fmt], "traffic_bytes", None)
        if fn:
            total += int(fn(state.rest_state, cfg))
    return total


def to_coo(state: HYBState) -> COOMatrix:
    dia_coo = dia_mod.to_coo(state.dia_state)
    if not state.rest_fmt:
        return dia_coo
    rest = _rest_modules()[state.rest_fmt].to_coo(state.rest_state)
    return COOMatrix.from_triplets(
        state.n_row, state.n_col,
        np.concatenate([dia_coo.row, rest.row.astype(dia_coo.row.dtype)]),
        np.concatenate([dia_coo.col, rest.col.astype(dia_coo.col.dtype)]),
        np.concatenate([dia_coo.val, rest.val]),
        sort=True, sum_duplicates=True)
