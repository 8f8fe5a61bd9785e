"""One-process r5 TPU campaign: the FULL 26-matrix natural suite.

r5: the xch v4 blk-routed exchange (band peel + long-row fast-track +
one-hot MXU route) serves the hyper-sparse giant class; bkt estimation is
scale-guarded, auto's quick-bench is median-based, and the route-rate
constants come from the r5 on-device marginal probe.  Rows append to results/r5_tpu_suite.tsv; re-runs
skip completed rows.  State caching is ON for sub-giant matrices only (the
giant states are GBs and the tunnel readback is the fragile path).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CACHE_NNZ_CAP = 20_000_000


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.structgen import RECIPES
    from singlespmv_tpu.harness.suite import run_suite, summarize

    t0 = time.time()
    float(np.asarray(jax.numpy.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    names = sys.argv[1:] or sorted(RECIPES, key=lambda n: RECIPES[n][1])
    small = [n for n in names if RECIPES[n][1] <= CACHE_NNZ_CAP]
    big = [n for n in names if RECIPES[n][1] > CACHE_NNZ_CAP]
    cfg = Config(format="auto", dtype="float32", verify=True,
                 calibrate_seconds=0.4, n_trials=5)
    rows = run_suite(small, cfg=cfg, out="results/r5_tpu_suite.tsv",
                     append=True, cache_dir="results/state_cache", log=log)
    # r5: the big-matrix cache is PRE-WARMED on the CPU backend (picks are
    # trial-free above 20M nnz) — giants load their states instead of
    # reconverting; a miss still converts + saves (readback of a GB-scale
    # state through the tunnel is the fragile path, but hits dominate).
    rows += run_suite(big, cfg=cfg, out="results/r5_tpu_suite.tsv",
                      append=True, cache_dir="results/state_cache", log=log)
    log(f"suite summary: {summarize(rows)}")


if __name__ == "__main__":
    main()
