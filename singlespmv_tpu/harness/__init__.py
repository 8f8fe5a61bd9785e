"""Benchmark harness — driver, report block, roofline model, sweep runner."""
from .driver import BenchResult, run_benchmark
from .report import format_block, parse_blocks, get_basename

__all__ = ["BenchResult", "run_benchmark", "format_block", "parse_blocks",
           "get_basename"]
