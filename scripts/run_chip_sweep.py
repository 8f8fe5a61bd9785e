"""On-chip tunable-format sweep (VERDICT #4): the gen_todo.sh analog run on
the real TPU — SS widths, CSS blocking, CSR5 sigma, plus every fixed format —
over three 16384-row artificial matrices (band / random / unbalance, the
reference's artificial classes).  Emits results/r2_sweep.tsv.

Run from the repo root:  python scripts/run_chip_sweep.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from singlespmv_tpu.core.mmio import write_matrix_market
from singlespmv_tpu.data.generators import generate
from singlespmv_tpu.harness.sweep import run_sweep

TODO = "\n".join(
    ["prefix,format,variant,segment_width,n_block,sigma,calibrate_seconds,n_trials"]
    + [f"{f},{f},optimized,,,,0.3,3"
       for f in ("csr", "coo", "ell", "jds", "dia", "dense", "bsr", "bkt",
                 "slab", "auto")]
    + [f"ss-opt-{w},ss,optimized,{w},,,0.3,3" for w in (256, 1024, 4096, 16384)]
    + [f"ss-simple-{w},ss,simple,{w},,,0.3,3" for w in (1024, 16384)]
    + [f"css-opt,css,optimized,2048,,,0.3,3"]
    + [f"css-simple-{nb},css,simple,2048,{nb},,0.3,3" for nb in (1, 4, 16)]
    + [f"csr5-s{s},csr5,optimized,,,{s},0.3,3" for s in (0, 4, 16, 32)]
) + "\n"

MATS = ["band-16384", "random-16384", "unbalance-16384"]


def main():
    mdir = "/tmp/sweep_matrices"
    os.makedirs(mdir, exist_ok=True)
    paths = []
    for name in MATS:
        kind, n = name.rsplit("-", 1)
        p = os.path.join(mdir, f"{name}.mtx")
        if not os.path.exists(p):
            write_matrix_market(p, generate(kind, int(n), artificial=True,
                                            seed=3))
        paths.append(p)

    out_dir = "results/r2_sweep_logs"
    failures = run_sweep(TODO, paths, out_dir=out_dir)

    # aggregate all jsonl rows into one TSV
    rows = []
    for fn in sorted(os.listdir(out_dir)):
        if fn.endswith(".jsonl"):
            with open(os.path.join(out_dir, fn)) as f:
                for line in f:
                    r = json.loads(line)
                    rows.append((fn[:-6], r))
    cols = ("Matrix", "MatrixFormat", "Variant", "SEGMENT_WIDTH(byte)",
            "N_BLOCK", "Sigma", "Performance(GFLOPS)", "Bandwidth(GB/s)",
            "RooflinePct", "Verify")
    with open("results/r2_sweep.tsv", "w") as f:
        f.write("prefix\t" + "\t".join(cols) + "\n")
        for prefix, r in rows:
            f.write(prefix + "\t"
                    + "\t".join(str(r.get(c, "")) for c in cols) + "\n")
    print(f"sweep done, failures={failures}, rows={len(rows)}")


if __name__ == "__main__":
    main()
