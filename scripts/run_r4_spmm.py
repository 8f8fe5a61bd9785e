"""r4 SpMM campaign: panel throughput vs SpMV, SpMM-aware auto planning.

The r3 verdict bar: SpMM >= 4x SpMV throughput at B=8 on raefsky3 (SURVEY
§7.6 "x→(nCol,B) panel — MXU path").  raefsky3 is 8x8-block FEM: the MXU
panel format is bsr, which the SpMM-aware planner (Config.spmm_b) now picks;
the slab unit-mode panel kernel covers the scattered class (streams read
once for all B columns).  Output: results/r4_tpu_spmm.txt.
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
    from singlespmv_tpu.data.generators import generate, powerlaw
    from singlespmv_tpu.data.structgen import synthesize_structured
    from singlespmv_tpu.formats import convert, get_format, spmm_fn, spmv_fn
    from singlespmv_tpu.harness.driver import make_chained_runner, sync

    # canary
    t0 = time.time()
    float(np.asarray(jax.numpy.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    def time_chained(fn, state, arg, cal_s=0.35, trials=5):
        # driver-grade: calibrate the loop count to >=cal_s windows, then
        # best-of-N marginal (sub-50ms windows are tunnel-noise-dominated)
        import jax.numpy as jnp
        runner = make_chained_runner(fn, arg)
        sync(runner(state, arg, jnp.int32(1)))
        loop = 1
        while loop < (1 << 20):
            t0 = time.time()
            sync(runner(state, arg, jnp.int32(loop)))
            if time.time() - t0 >= cal_s:
                break
            loop *= 2
        best = float("inf")
        for _ in range(trials):
            half = max(loop // 2, 1)
            t0 = time.time()
            sync(runner(state, arg, jnp.int32(half)))
            t1 = time.time()
            sync(runner(state, arg, jnp.int32(loop)))
            t2 = time.time()
            margin = (t2 - t1) - (t1 - t0)
            per = margin / (loop - half) if margin > 0 else \
                (t2 - t0) / (loop + half)
            best = min(best, per)
        return best

    cases = [
        ("synth-raefsky3", lambda: synthesize_structured("raefsky3", seed=0),
         (8, 32)),
        ("unbalance-16384", lambda: generate("unbalance", 16384, None,
                                             seed=1), (8, 32)),
        ("powerlaw-32768", lambda: powerlaw(32768, 786432, seed=2), (8,)),
        ("synth-torso1", lambda: synthesize_structured("torso1", seed=0),
         (8,)),
    ]

    lines = ["SpMM Y = A @ X, f32, TPU v5e (flops = 2*nnz*B); chained "
             "on-device loop, marginal-difference timing.",
             "",
             f"{'matrix':<18} {'plan':<10} {'B':>4} {'us/iter':>9} "
             f"{'GFLOPS':>8} {'vs spmv x':>9}"]
    for name, make, bs in cases:
        coo = make()
        # SpMV reference through the spmv-planned auto format
        cfg0 = Config(format="auto", dtype="float32")
        st0 = convert(coo, cfg0)
        sec0 = time_chained(spmv_fn(cfg0), st0,
                            jax.numpy.asarray(
                                np.random.default_rng(3).uniform(
                                    size=coo.n_col).astype(np.float32)))
        gf0 = 2 * coo.nnz / sec0 / 1e9
        lines.append(f"{name:<18} {'spmv:' + st0.chosen:<10} {1:>4} "
                     f"{sec0 * 1e6:>9.1f} {gf0:>8.1f} {'':>9}")
        log(lines[-1])
        del st0
        for b in bs:
            cfg = Config(format="auto", dtype="float32", spmm_b=b)
            st = convert(coo, cfg)
            X = jax.numpy.asarray(np.random.default_rng(3).uniform(
                size=(coo.n_col, b)).astype(np.float32))
            sec = time_chained(spmm_fn(cfg), st, X)
            gf = 2 * coo.nnz * b / sec / 1e9
            # throughput ratio vs spmv: (nnz*B/sec) / (nnz/sec0)
            ratio = (b / sec) * sec0
            lines.append(f"{name:<18} {'spmm:' + st.chosen:<10} {b:>4} "
                         f"{sec * 1e6:>9.1f} {gf:>8.1f} {ratio:>9.2f}")
            log(lines[-1])
            del st
    # raefsky3 is 8x8-block FEM: the MXU path wants 16-row blocks (2 FEM
    # blocks per MXU tile row).  Measured r4: rb=16 B=8 hits 214 GFLOPS =
    # 4.2x the best SpMV (blk-m1 slab, 58.9 us) — the SURVEY §7.6 panel bar.
    from singlespmv_tpu.formats import bsr as bsr_mod

    coo = synthesize_structured("raefsky3", seed=0)
    cfg16 = Config(format="bsr", dtype="float32", row_block=16)
    st16 = bsr_mod.convert(coo, cfg16)
    sec0 = None
    for line in lines:
        if line.startswith("synth-raefsky3") and "spmv:" in line:
            sec0 = float(line.split()[3]) * 1e-6
    for b in (8, 32):
        X = jax.numpy.asarray(np.random.default_rng(3).uniform(
            size=(coo.n_col, b)).astype(np.float32))
        sec = time_chained(bsr_mod.spmm, st16, X)
        gf = 2 * coo.nnz * b / sec / 1e9
        ratio = (b / sec) * sec0 if sec0 else float("nan")
        lines.append(f"{'synth-raefsky3':<18} {'spmm:bsr16':<10} {b:>4} "
                     f"{sec * 1e6:>9.1f} {gf:>8.1f} {ratio:>9.2f}")
        log(lines[-1])

    txt = "\n".join(lines) + "\n"
    with open("results/r4_tpu_spmm.txt", "w") as f:
        f.write(txt)
    print(txt)


if __name__ == "__main__":
    main()
