"""r5 f64 campaign: the FULL 26-matrix suite at dtype=float64.

Every reference kernel is double precision (src/util.h:7-39); r4 covered 10
mid matrices at median 0.46x.  r5 runs all 26 through the auto planner
(slab-df64/css-df64 carry the windowed classes; giants take the best
available engine and their rows are reported honestly) and appends
results/r5_f64_suite.tsv.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    import jax

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.structgen import RECIPES
    from singlespmv_tpu.harness.suite import run_suite, summarize

    t0 = time.time()
    float(np.asarray(jax.numpy.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    names = sys.argv[1:] or sorted(RECIPES, key=lambda n: RECIPES[n][1])
    cfg = Config(format="auto", dtype="float64", verify=True,
                 calibrate_seconds=0.4, n_trials=5)
    rows = run_suite(names, cfg=cfg, out="results/r5_f64_suite.tsv",
                     append=True, log=log)
    log(f"f64 summary: {summarize(rows)}")


if __name__ == "__main__":
    main()
