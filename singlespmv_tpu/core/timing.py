"""Timing + phase profiling.

The reference uses ``gettimeofday`` (/root/reference/src/util.cpp:21-25) and
compile-time ``PROF_BEGIN/PROF_END`` macros accumulating per-phase seconds into
``g_profile`` (/root/reference/src/util.h:59-65).  Here: a monotonic wall clock that
forces JAX completion (``block_until_ready``), and a ``PhaseProfile`` that formats'
spmv implementations can fill when profiling is on (phases run as separate jitted
calls — XLA fuses everything otherwise, so an un-fused profile mode is the only
honest per-phase measurement).
"""
from __future__ import annotations

import time
from typing import Dict, List


def now() -> float:
    return time.perf_counter()


def block(x):
    """Block on a pytree of device arrays; returns it."""
    import jax

    return jax.block_until_ready(x)


class PhaseProfile:
    """Accumulates per-phase seconds, like g_profile (util.cpp:16-18)."""

    def __init__(self):
        self.phases: Dict[str, float] = {}
        self.step_count: List[int] = []   # SS tree-step work counts (main.cpp:159-162)
        self.step_time: List[float] = []  # -DMEASURE_STEP_TIME analog

    def reset(self):
        self.phases.clear()
        self.step_time = [0.0] * len(self.step_time)

    def add(self, name: str, seconds: float):
        self.phases[name] = self.phases.get(name, 0.0) + seconds

    def copy(self) -> "PhaseProfile":
        p = PhaseProfile()
        p.phases = dict(self.phases)
        p.step_count = list(self.step_count)
        p.step_time = list(self.step_time)
        return p


class Timer:
    def __enter__(self):
        self.t0 = now()
        return self

    def __exit__(self, *exc):
        self.seconds = now() - self.t0
        return False
