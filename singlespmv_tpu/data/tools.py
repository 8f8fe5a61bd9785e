"""Matrix inspection tools.

Analogs of /root/reference/matrix/script/visualizer.cpp (32×32 downsampled ASCII spy
plot) and counter.cpp (row/col nnz stats — see core.types.matrix_stats).
"""
from __future__ import annotations

import numpy as np

from ..core.types import COOMatrix


def spy_plot(coo: COOMatrix, size: int = 32) -> str:
    """ASCII density plot, downsampled to size×size cells.

    The reference prints '#' for occupied cells (visualizer.cpp); we grade density
    into ' .:*#' quintiles so structure is visible on large matrices too.
    """
    size_r = min(size, max(coo.n_row, 1))
    size_c = min(size, max(coo.n_col, 1))
    grid = np.zeros((size_r, size_c), dtype=np.int64)
    if coo.nnz:
        r = (coo.row.astype(np.int64) * size_r) // max(coo.n_row, 1)
        c = (coo.col.astype(np.int64) * size_c) // max(coo.n_col, 1)
        np.add.at(grid, (np.minimum(r, size_r - 1), np.minimum(c, size_c - 1)), 1)
    cell_cap = max(
        1.0,
        (coo.n_row / size_r) * (coo.n_col / size_c),
    )
    shades = " .:*#"
    lines = [f"% {coo.n_row} x {coo.n_col}, nnz={coo.nnz}"]
    for i in range(size_r):
        row = ""
        for j in range(size_c):
            d = grid[i, j] / cell_cap
            level = 0 if grid[i, j] == 0 else min(4, 1 + int(d * 4))
            row += shades[level]
        lines.append(row)
    return "\n".join(lines)
