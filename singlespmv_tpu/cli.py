"""Command-line interface.

The reference builds one binary per (arch × format × params) configuration and runs
``./bin/<prefix>-spmv.<arch> <matrix.mtx>`` (/root/reference/Makefile:10-21,
src/main.cpp:17). Here one runtime CLI covers the whole configuration space:

    python -m singlespmv_tpu bench matrix.mtx --format=csr5 --dtype=float32
    python -m singlespmv_tpu sweep --todo=todo.csv --matrices dir/*.mtx --out log/
    python -m singlespmv_tpu formats
    python -m singlespmv_tpu info matrix.mtx          # counter.cpp analog
    python -m singlespmv_tpu spy matrix.mtx           # visualizer.cpp analog
    python -m singlespmv_tpu gen band 1024 --out m.mtx
    python -m singlespmv_tpu format-logs run.log      # log/format.cpp analog
"""
from __future__ import annotations

import argparse
import os
import sys

from .config import Config


def _add_config_args(p: argparse.ArgumentParser):
    p.add_argument("--format", default="csr", help="storage format (see `formats`)")
    p.add_argument("--variant", default="optimized", choices=["simple", "optimized"])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64", "bfloat16"])
    p.add_argument("--segment-width", type=int, default=2048)
    p.add_argument("--n-block", type=int, default=1)
    p.add_argument("--omega", type=int, default=128)
    p.add_argument("--sigma", type=int, default=0, help="0 = auto-tune from nnz/row")
    p.add_argument("--row-block", type=int, default=8)
    p.add_argument("--index-bits", type=int, default=32, choices=[32, 64])
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--profiling", action="store_true")
    p.add_argument("--calibrate-seconds", type=float, default=1.0)
    p.add_argument("--trials", type=int, default=10)
    p.add_argument("--quick", action="store_true",
                   help="skip calibration: 1 trial x 3 iterations")


def _config_from(args) -> Config:
    return Config(
        format=args.format, variant=args.variant, dtype=args.dtype,
        segment_width=args.segment_width, n_block=args.n_block,
        omega=args.omega, sigma=args.sigma, row_block=args.row_block,
        index_bits=args.index_bits, verify=not args.no_verify,
        profiling=args.profiling, calibrate_seconds=args.calibrate_seconds,
        n_trials=args.trials,
    )


def cmd_bench(args) -> int:
    from .harness.driver import run_benchmark

    cfg = _config_from(args)
    res = run_benchmark(args.matrix, cfg, quick=args.quick,
                        trace_dir=args.trace)
    print(res.block)
    if args.jsonl:
        from .harness.report import to_jsonl
        with open(args.jsonl, "a") as f:
            f.write(to_jsonl(res.report) + "\n")
    return 0 if (res.verify_ok or not cfg.verify) else 1


def cmd_formats(args) -> int:
    from .formats import available_formats

    for f in available_formats():
        print(f)
    return 0


def cmd_info(args) -> int:
    from .core.mmio import read_matrix_market
    from .core.types import matrix_stats

    coo = read_matrix_market(args.matrix, sum_duplicates=True)
    for k, v in matrix_stats(coo).items():
        print(f"{k:>12}\t{v}")
    return 0


def cmd_spy(args) -> int:
    from .core.mmio import read_matrix_market
    from .data.tools import spy_plot

    coo = read_matrix_market(args.matrix, sum_duplicates=True)
    print(spy_plot(coo, size=args.size))
    return 0


def cmd_gen(args) -> int:
    from .core.mmio import write_matrix_market
    from .data.generators import generate, powerlaw

    if args.shape == "powerlaw":
        coo = powerlaw(args.n, args.nnz or args.n * 16, seed=args.seed)
    else:
        coo = generate(args.shape, args.n, args.param, seed=args.seed,
                       artificial=args.artificial)
    out = args.out or f"{args.shape}-{args.n}.mtx"
    write_matrix_market(out, coo)
    print(out)
    return 0


def cmd_format_logs(args) -> int:
    from .harness.logfmt import format_logs, sum_gflops

    text = open(args.log).read() if args.log != "-" else sys.stdin.read()
    if args.sum:
        print(f"{sum_gflops(text):.6f}")     # log/sum.sh analog
    else:
        print(format_logs(text, extra_keys=args.keys))
    return 0


def cmd_confirm(args) -> int:
    """Smoke-run every format over the fixture suite (confirm_cpu.sh analog)."""
    from .data import fixtures as fx
    from .data.generators import generate
    from .formats import available_formats
    from .harness.driver import run_benchmark

    mats = [(n, f()) for n, f in fx.ALL_FIXTURES.items()]
    mats.append(("band-64", generate("band", 64, 5, seed=1)))
    fmts = args.formats or [f for f in available_formats() if f != "crs"]
    bad = 0
    for fmt in fmts:
        for name, coo in mats:
            cfg = Config(format=fmt, dtype=args.dtype)
            try:
                res = run_benchmark(coo, cfg, name=name, quick=True,
                                    log=lambda m: None)
                ok = res.verify_ok
            except Exception as e:
                print(f"{fmt:>8} {name:<12} ERROR {e}")
                bad += 1
                continue
            print(f"{fmt:>8} {name:<12} {'PASS' if ok else 'FAIL'}"
                  f"  {res.gflops:.3f} GFLOPS")
            bad += 0 if ok else 1
    print(f"confirm: {'ALL PASS' if bad == 0 else f'{bad} FAILURES'}")
    return 1 if bad else 0


def cmd_suite(args) -> int:
    """Materialize matrix suites (artificial gen.sh / natural download.sh)."""
    import os

    from .core.mmio import write_matrix_market

    os.makedirs(args.out, exist_ok=True)
    if args.suite == "artificial":
        from .data.generators import generate

        sizes = args.sizes or [512, 1024, 2048, 4096, 8192, 16384, 32768]
        for kind in ("band", "unbalance", "random"):
            for n in sizes:
                p = os.path.join(args.out, f"{kind}-{n}.mtx")
                if not os.path.exists(p):
                    write_matrix_market(p, generate(kind, n, artificial=True,
                                                    seed=3))
                    print(p)
        for n in [s for s in (sizes if args.sizes else [512, 1024, 2048, 4096])]:
            p = os.path.join(args.out, f"dense-{n}.mtx")
            if not os.path.exists(p) and n <= 4096:
                write_matrix_market(p, generate("dense", n, artificial=True,
                                                seed=3))
                print(p)
        return 0
    if args.suite == "test":
        from .data import fixtures as fx

        for name, f in fx.ALL_FIXTURES.items():
            p = os.path.join(args.out, f"{name}.mtx")
            write_matrix_market(p, f())
            print(p)
        return 0
    # natural
    from .data.suitesparse import ensure_suite

    status = ensure_suite(args.out, download=not args.no_download,
                          subset=args.only or None)
    for k, v in status.items():
        print(f"{k:>24}  {v}")
    return 0 if all(v in ("present", "extracted") for v in status.values()) else 1


def cmd_sweep(args) -> int:
    from .harness.sweep import run_sweep

    return run_sweep(todo=args.todo, matrices=args.matrices, out_dir=args.out,
                     quick=args.quick)


def _cmd_calibrate():
    from .harness.calibrate import main as cal_main

    cal_main()


def main(argv=None) -> int:
    # Honor JAX_PLATFORMS explicitly: the axon site shim force-registers the
    # TPU plugin for every interpreter and the env var alone is overridden
    # (verify-skill gotcha) — a caller exporting JAX_PLATFORMS=cpu (tests,
    # CI) must actually get the CPU backend, not a surprise TPU session.
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat:
        import jax

        jax.config.update("jax_platforms", plat)
    ap = argparse.ArgumentParser(prog="singlespmv_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("bench", help="benchmark one (matrix, config)")
    p.add_argument("matrix")
    _add_config_args(p)
    p.add_argument("--jsonl", help="append result to JSONL file")
    p.add_argument("--trace", help="write a jax.profiler trace to this dir")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("formats", help="list available formats")
    p.set_defaults(fn=cmd_formats)

    p = sub.add_parser("info", help="matrix stats (counter.cpp analog)")
    p.add_argument("matrix")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("spy", help="ASCII spy plot (visualizer.cpp analog)")
    p.add_argument("matrix")
    p.add_argument("--size", type=int, default=32)
    p.set_defaults(fn=cmd_spy)

    p = sub.add_parser("gen", help="generate a test/artificial matrix")
    p.add_argument("shape", choices=["band", "dense", "unbalance",
                                     "random_unbalance", "random", "powerlaw"])
    p.add_argument("n", type=int)
    p.add_argument("param", type=int, nargs="?", default=None,
                   help="shape parameter (band width / nnz / ...)")
    p.add_argument("--nnz", type=int, default=None)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--artificial", action="store_true", help="val=1.0 variant")
    p.add_argument("--out")
    p.set_defaults(fn=cmd_gen)

    p = sub.add_parser("format-logs", help="report blocks -> TSV (log/format.cpp)")
    p.add_argument("log", help="log file, or - for stdin")
    p.add_argument("--keys", nargs="*", default=None,
                   help="extra report keys to include as columns")
    p.add_argument("--sum", action="store_true",
                   help="print total GFLOPS instead of the table (log/sum.sh)")
    p.set_defaults(fn=cmd_format_logs)

    p = sub.add_parser("confirm", help="smoke-run all formats (confirm_cpu.sh)")
    p.add_argument("--formats", nargs="*", default=None)
    p.add_argument("--dtype", default="float32")
    p.set_defaults(fn=cmd_confirm)

    p = sub.add_parser("suite", help="materialize a matrix suite")
    p.add_argument("suite", choices=["test", "artificial", "natural"])
    p.add_argument("--out", default="matrices")
    p.add_argument("--sizes", nargs="*", type=int, default=None)
    p.add_argument("--only", nargs="*", default=None,
                   help="natural: subset of matrix names")
    p.add_argument("--no-download", action="store_true")
    p.set_defaults(fn=cmd_suite)

    p = sub.add_parser("calibrate",
                       help="measure chip constants -> chip_constants.json")
    p.set_defaults(fn=lambda a: (_cmd_calibrate(), 0)[1])

    p = sub.add_parser("sweep", help="run a configuration sweep (eval_sbatch analog)")
    p.add_argument("--todo", required=True, help="sweep table CSV")
    p.add_argument("--matrices", nargs="+", required=True)
    p.add_argument("--out", default="log")
    p.add_argument("--quick", action="store_true")
    p.set_defaults(fn=cmd_sweep)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
