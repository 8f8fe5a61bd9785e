"""r4 f64 campaign: the reference's all-f64 contract, measured on-chip.

Every reference kernel is double precision (src/util.h:7-39; GFLOPS =
2·nnz f64, src/main.cpp:196).  r3 built the df64 (2×f32) css kernel but
committed no on-chip f64 number (VERDICT r3 missing #1).  This runs the
mid suite at dtype=float64 through the auto planner (which prices css-df64
vs the XLA-emulated fallbacks) and appends results/r4_f64_suite.tsv; the
"done" bar is Verify PASS at >= 25% of the matrix's f32 suite number.
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
    from singlespmv_tpu.harness.suite import run_suite, summarize

    t0 = time.time()
    float(np.asarray(jax.numpy.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    names = sys.argv[1:] or ["g7jac200sc", "lhr34", "twotone", "raefsky3",
                             "sme3Dc", "laminar_duct3D", "stomach",
                             "Chebyshev4", "torso1", "xenon2"]
    cfg = Config(format="auto", dtype="float64", verify=True,
                 calibrate_seconds=0.4, n_trials=5)
    rows = run_suite(names, cfg=cfg, out="results/r4_f64_suite.tsv",
                     append=True, log=log)
    log(f"f64 summary: {summarize(rows)}")


if __name__ == "__main__":
    main()
