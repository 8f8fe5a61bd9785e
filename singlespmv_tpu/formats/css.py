"""CSS — cache(-VMEM)-blocked segmented-scan format.

Reference: /root/reference/src/opt_css.cpp — columns split into N_BLOCK blocks so the
gathered x window stays cache-resident (:33-45); per-block SS structures with
per-block log-trees, y accumulated across blocks (:198-303).

TPU-native design: the nnz stream is reordered by (column-block, row, col) and runs
through the same SS machinery (formats.ss.build_stream) — run boundaries fall at
block boundaries automatically because the sort key changes.  Each (block, row) run
is combined into y by the final scatter, which sums a row's per-block partials; this
replaces the reference's per-block tree + cross-block accumulation.  The x-locality
payoff on TPU is VMEM residency of the x window in the Pallas variant: each block's
gather touches only n_col/N_BLOCK entries of x.
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..core.types import COOMatrix, cdiv
from . import ss
from .base import pytree_dataclass


@pytree_dataclass(meta=("n_row", "n_col", "nnz", "w", "h", "r_max", "variant",
                        "n_step", "step_counts", "sorted_combine",
                        "n_block", "block_cols"))
class CSSState(ss.SSState):
    n_block: int = 1
    block_cols: int = 0


def convert(coo: COOMatrix, cfg: Config) -> CSSState:
    n_block = max(1, cfg.n_block)
    block_cols = cdiv(max(coo.n_col, 1), n_block)
    blk = coo.col // block_cols
    order = np.lexsort((coo.col, coo.row, blk))
    base = ss.build_stream(
        coo, cfg,
        rows=coo.row[order], cols=coo.col[order], vals=coo.val[order],
        sorted_combine=False,  # rows are sorted within a block, not globally
    )
    d = {f: getattr(base, f) for f in (
        "n_row", "n_col", "nnz", "w", "h", "r_max", "variant", "n_step",
        "step_counts", "sorted_combine", "col", "val", "heads", "end_pos",
        "rank_rows")}
    return CSSState(n_block=n_block, block_cols=block_cols, **d)


mul = ss.mul
scan = ss.scan
reduce = ss.reduce
spmv = ss.spmv
phases = ss.phases
traffic_bytes = ss.traffic_bytes


def report_fields(state: CSSState, cfg: Config) -> dict:
    out = ss.report_fields(state, cfg)
    out["N_BLOCK"] = state.n_block
    return out
