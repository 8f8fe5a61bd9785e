"""r4 giant campaign: the 8 hyper-sparse giants through the xch engine.

The whole r4 round per the verdict: circuit5M 0.09x .. cage15 0.43x must
become >= 0.8x.  Runs smallest-first, appends to results/r4_giant_xch.tsv,
skips completed rows (idempotent).  format=auto so the planner's pick is on
record (cage15 should flip to dia under the raised cap).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

OUT = "results/r4_giant_xch.tsv"
GIANTS = ["ASIC_680ks", "webbase-1M", "Hamrle3", "Freescale1", "rajat31",
          "FullChip", "circuit5M", "cage15"]


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    import jax

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.harness.suite import run_suite

    t0 = time.time()
    float(np.asarray(jax.numpy.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    names = sys.argv[1:] or GIANTS
    fmt = os.environ.get("GIANT_FORMAT", "auto")
    cfg = Config(format=fmt, dtype="float32", verify=True,
                 calibrate_seconds=0.4, n_trials=5)
    run_suite(names, cfg=cfg, out=OUT, append=True,
              cache_dir="results/state_cache", log=log)


if __name__ == "__main__":
    main()
