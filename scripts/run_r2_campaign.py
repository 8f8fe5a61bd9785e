"""One-process r2 TPU campaign: suite benchmark -> microbench -> sweep.

A fresh process pays ~4-5 min of device-open latency through the axon tunnel,
so everything TPU-bound runs in this single process.  Each stage writes its
results file as it goes; re-running skips completed work (suite appends with
--append semantics, sweep has its manifest).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def stage_suite(small_only=False):
    from singlespmv_tpu.config import Config
    from singlespmv_tpu.core import native
    from singlespmv_tpu.harness.suite import run_suite, summarize
    from singlespmv_tpu.data.structgen import RECIPES

    t0 = time.time()
    n = native.npalloc_prefault(10 << 30)
    log(f"npalloc prefault: {n} blocks in {time.time() - t0:.0f}s")

    names = sorted(RECIPES, key=lambda n: RECIPES[n][1])
    if small_only:
        names = [n for n in names if RECIPES[n][1] < 20_000_000]
    cfg = Config(format="auto", dtype="float32", verify=True,
                 calibrate_seconds=0.4, n_trials=5)
    rows = run_suite(names, cfg=cfg, out="results/r2_tpu_suite.tsv",
                     append=True, log=log)
    log(f"suite summary: {summarize(rows)}")


def stage_micro():
    from singlespmv_tpu.harness import microbench

    microbench.run(out="results/r2_microbench.tsv", log=log)


def stage_sweep():
    import scripts.run_chip_sweep as sw

    sw.main()


if __name__ == "__main__":
    stages = sys.argv[1:] or ["suite", "micro", "sweep"]
    for s in stages:
        log(f"##### stage {s} #####")
        try:
            {"suite": stage_suite, "micro": stage_micro,
             "sweep": stage_sweep}[s]()
        except Exception as e:
            log(f"stage {s} FAILED: {type(e).__name__}: {e}")
            import traceback
            traceback.print_exc(file=sys.stderr)
    log("campaign done")
