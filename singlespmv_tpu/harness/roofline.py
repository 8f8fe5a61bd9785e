"""Roofline (speed-of-light) model.

The reference's CSR5 harness reports GB/s from the traffic model
``(m+1+nnz)·sizeof(idx) + (2·nnz+m)·sizeof(val)``
(/root/reference/opt/Benchmark_SpMV_using_CSR5/CSR5_avx2/detail/utils.h:10-14);
BASELINE.md uses it as the roofline basis.  SpMV is bandwidth-bound, so the roofline
for a chip is ``peak_HBM_bytes_per_s / bytes_per_flop``.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float        # HBM bandwidth, GB/s
    f32_tflops: float      # peak dense f32 (MXU)
    bf16_tflops: float
    vmem_mib: float = 16.0


# Public chip numbers (cloud.google.com/tpu docs).
CHIPS = {
    "TPU v4": ChipSpec("TPU v4", 1228.0, 137.5, 275.0, 16),
    "TPU v5 lite": ChipSpec("TPU v5e", 819.0, 98.5, 197.0, 16),
    "TPU v5e": ChipSpec("TPU v5e", 819.0, 98.5, 197.0, 16),
    "TPU v5": ChipSpec("TPU v5p", 2765.0, 229.5, 459.0, 16),
    "TPU v5p": ChipSpec("TPU v5p", 2765.0, 229.5, 459.0, 16),
    "TPU v6 lite": ChipSpec("TPU v6e", 1640.0, 459.0, 918.0, 32),
    "TPU v6e": ChipSpec("TPU v6e", 1640.0, 459.0, 918.0, 32),
    "cpu": ChipSpec("host CPU", 50.0, 1.0, 1.0, 0),
}


def detect_chip() -> ChipSpec:
    import jax

    kind = jax.devices()[0].device_kind
    for key, spec in CHIPS.items():
        if key.lower() in kind.lower() or kind.lower() in key.lower():
            return spec
    if jax.default_backend() == "cpu":
        return CHIPS["cpu"]
    return ChipSpec(kind, 819.0, 98.5, 197.0, 16)  # conservative default


def roofline(traffic_bytes: int, nnz: int, seconds: float, chip: ChipSpec) -> dict:
    """Achieved GB/s + % of the bandwidth roofline for one SpMV application."""
    gbps = traffic_bytes / seconds / 1e9 if seconds > 0 else 0.0
    sol_seconds = traffic_bytes / (chip.hbm_gbps * 1e9)
    return {
        "Bandwidth(GB/s)": gbps,
        "RooflinePct": 100.0 * gbps / chip.hbm_gbps,
        "SolTime(s)": sol_seconds,
        "SolGFLOPS": 2.0 * nnz / sol_seconds / 1e9 if sol_seconds > 0 else 0.0,
        "Chip": chip.name,
    }
