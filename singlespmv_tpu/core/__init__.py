from .types import COOMatrix, cdiv, matrix_stats, pad_to, round_up
from .mmio import load_matrix, read_matrix_market, write_matrix_market
from .oracle import reference_spmv, tolerance_for, verify_result
from .rng import create_random_matrix, create_random_vector
from .timing import PhaseProfile, Timer, block, now

__all__ = [
    "COOMatrix", "cdiv", "matrix_stats", "pad_to", "round_up",
    "load_matrix", "read_matrix_market", "write_matrix_market",
    "reference_spmv", "tolerance_for", "verify_result",
    "create_random_matrix", "create_random_vector",
    "PhaseProfile", "Timer", "block", "now",
]
