"""Headline benchmark — prints ONE JSON line.

Runs the flagship CSR5-style tiled SpMV on a representative generated suite
(band / dense / unbalanced / power-law, the shapes of the reference's artificial
suite, /root/reference/matrix/artificial/generator.cpp) on the available device and
reports the median GFLOPS.  vs_baseline compares against the reference's own
measured north-star: the vendored CSR5 AVX2 median over its natural SuiteSparse
suite, ~11.5 GFLOPS on a 24-thread Xeon (BASELINE.md).
"""
import json
import sys

BASELINE_GFLOPS = 11.5  # CSR5 AVX2 median, 26 natural matrices (BASELINE.md)


def main():
    import numpy as np

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.generators import generate, powerlaw
    from singlespmv_tpu.harness.driver import run_benchmark

    suite = [
        ("band-16384", lambda: generate("band", 16384, 64, seed=1)),
        ("dense-2048", lambda: generate("dense", 2048, seed=2)),
        ("unbalance-16384", lambda: generate("unbalance", 16384, seed=3)),
        ("powerlaw-32768", lambda: powerlaw(32768, 32768 * 32, seed=4)),
    ]
    cfg = Config(format="auto", dtype="float32", sigma=0,
                 calibrate_seconds=0.5, n_trials=5)

    results = {}
    roofline_pct = {}
    for name, build in suite:
        coo = build()
        res = run_benchmark(coo, cfg, name=name,
                            log=lambda m: print(m, file=sys.stderr))
        results[name] = res.gflops
        roofline_pct[name] = float(res.report.get("RooflinePct", 0.0))
        print(res.block, file=sys.stderr)

    med = float(np.median(list(results.values())))
    line = {
        "metric": "spmv_gflops_median",
        "value": round(med, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(med / BASELINE_GFLOPS, 3),
        "detail": {k: round(v, 3) for k, v in results.items()},
        "roofline_pct": {k: round(v, 1) for k, v in roofline_pct.items()},
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
