"""One-process r3 TPU campaign: the FULL 26-matrix natural suite.

r2 capped the suite at 20 M nnz and crashed on Freescale1/rajat31
(VERDICT.md "What's missing" 1-2).  r3 removes the cap: the slab walk is
vectorized, the Mosaic scoped-VMEM limit is raised for >16 MB x tables, and
the driver retries with the failed candidate excluded.  Small matrices run
first (nnz order) so partial results land early; rows append to
results/r3_tpu_suite.tsv and re-runs skip completed rows.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def stage_suite(names=None):
    from singlespmv_tpu.config import Config
    from singlespmv_tpu.core import native
    from singlespmv_tpu.data.structgen import RECIPES
    from singlespmv_tpu.harness.suite import run_suite, summarize

    t0 = time.time()
    n = native.npalloc_prefault(10 << 30)
    log(f"npalloc prefault: {n} blocks in {time.time() - t0:.0f}s")

    names = names or sorted(RECIPES, key=lambda n: RECIPES[n][1])
    cfg = Config(format="auto", dtype="float32", verify=True,
                 calibrate_seconds=0.4, n_trials=5)
    rows = run_suite(names, cfg=cfg, out="results/r3_tpu_suite.tsv",
                     append=True, log=log)
    log(f"suite summary: {summarize(rows)}")


if __name__ == "__main__":
    stage_suite(sys.argv[1:] or None)
