"""r5 artificial-suite campaign (VERDICT r4 #7): band/dense/unbalance/
random x 512..32768 on the CURRENT engines, vs BASELINE.md's artificial
table (CSR5_avx2/cpu-15-10-01-21-09.tsv).  PERFORMANCE.md's format table
refreshes from results/r5_artificial_suite.tsv.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


# reference artificial numbers (CSR5 AVX2, cpu-15-10-01-21-09.tsv via
# BASELINE.md): GFLOPS per (shape, n)
BASE = {
    ("band", 512): 0.816, ("band", 1024): 1.305, ("band", 2048): 9.165,
    ("band", 4096): 15.421, ("band", 8192): 24.616, ("band", 16384): 22.009,
    ("dense", 512): 19.762, ("dense", 1024): 31.175,
    ("dense", 2048): 33.664, ("dense", 4096): 11.317,
    ("random", 512): 0.100, ("random", 1024): 0.203,
    ("random", 8192): 1.284, ("random", 16384): 2.215,
    ("unbalance", 512): 1.998, ("unbalance", 1024): 3.847,
    ("unbalance", 2048): 5.616, ("unbalance", 4096): 9.985,
    ("unbalance", 8192): 12.888, ("unbalance", 16384): 17.130,
}


def main():
    import jax

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.generators import generate
    from singlespmv_tpu.harness.driver import run_benchmark

    t0 = time.time()
    float(np.asarray(jax.numpy.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    out = "results/r5_artificial_suite.tsv"
    done = set()
    if os.path.exists(out):
        done = {l.split("\t")[0] for l in open(out).read().splitlines()[1:]}
    else:
        with open(out, "w") as f:
            f.write("Matrix\tnNnz\tChosenFormat\tGFLOPS\tBaselineGFLOPS\t"
                    "vsBaseline\tAttainPct\tOptimizeTimeS\tVerify\n")
    cfg = Config(format="auto", dtype="float32", verify=True,
                 calibrate_seconds=0.4, n_trials=5)
    for (shape, n), base in sorted(BASE.items()):
        label = f"{shape}-{n}"
        if label in done:
            log(f"{label}: done, skipping")
            continue
        coo = generate(shape, n, artificial=True, seed=3)
        try:
            res = run_benchmark(coo, cfg, name=label, log=log)
            r = res.report
            with open(out, "a") as f:
                f.write(f"{label}\t{r['nNnz']}\t"
                        f"{r.get('ChosenFormat', r['MatrixFormat'])}\t"
                        f"{res.gflops:.3f}\t{base}\t"
                        f"{res.gflops / base:.3f}\t"
                        f"{r.get('AttainablePct', 0):.1f}\t"
                        f"{r['OptimizeTime(s)']:.2f}\t{r['Verify']}\n")
            log(f"{label}: {res.gflops:.2f} GFLOPS (x{res.gflops/base:.2f})"
                f" [{r.get('ChosenFormat', '?')}]")
        except Exception as e:  # noqa: BLE001
            log(f"{label}: FAILED {type(e).__name__}: {e}")
            with open(out, "a") as f:
                f.write(f"{label}\t\t\t\t{base}\t\t\t\t"
                        f"ERROR:{type(e).__name__}\n")


if __name__ == "__main__":
    main()
