"""r5 SpMM campaign: the scattered class gets panels (VERDICT r4 #9).

r4 measured MXU panels only where the matrix is blocked (bsr rb=16) and the
slab panel saved 2-5% — the scattered class had nothing.  r5 adds the xch v4
panel kernel (pass-1 products widen to (B, H, 128); pass 2 streams the index
arrays ONCE for all B columns), so hyper-sparse matrices amortize their
routing metadata across the panel.  Bar: scattered-class SpMM >= 2x its SpMV
GFLOPS at B=8.  Output: results/r5_tpu_spmm.txt.
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
    import jax.numpy as jnp

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.structgen import synthesize_structured
    from singlespmv_tpu.data.generators import generate
    from singlespmv_tpu.formats.base import convert, spmv_fn, spmm_fn

    t0 = time.time()
    float(np.asarray(jnp.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    def time_chained(fn, st, x, budget=0.4):
        """Median-of-3 marginal-difference chained-loop seconds/iter."""
        call = jax.jit(lambda s, v: fn(s, v))
        r = call(st, x)
        jax.block_until_ready(r)
        loop = 8
        while True:
            t0 = time.perf_counter()
            for _ in range(loop):
                r = call(st, x)
            jax.block_until_ready(r)
            if time.perf_counter() - t0 >= budget or loop >= 8192:
                break
            loop *= 2
        pers = []
        for _ in range(3):
            half = max(loop // 2, 1)
            t0 = time.perf_counter()
            for _ in range(half):
                r = call(st, x)
            jax.block_until_ready(r)
            t_half = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(loop):
                r = call(st, x)
            jax.block_until_ready(r)
            t_full = time.perf_counter() - t0
            pers.append((t_full - t_half) / (loop - half))
        return float(np.median(pers))

    # scattered class: xch's home matrices + a power-law generator
    cases = [
        ("synth-webbase-1M", lambda: synthesize_structured("webbase-1M",
                                                           seed=0), "xch"),
        ("synth-ASIC_680ks", lambda: synthesize_structured("ASIC_680ks",
                                                           seed=0), "xch"),
        ("unbalance-16384", lambda: generate("unbalance", 16384, None,
                                             seed=1), "auto"),
    ]
    rng = np.random.default_rng(3)
    lines = ["SpMM Y = A @ X, f32, TPU v5e (flops = 2*nnz*B); chained "
             "on-device loop, median-of-3 marginal-difference timing.",
             "r5: xch v4 panel kernel serves the scattered class.",
             "",
             f"{'matrix':<18} {'plan':<10} {'B':>4} {'us/iter':>9} "
             f"{'GFLOPS':>8} {'vs spmv x':>9}"]
    for name, make, fmt in cases:
        coo = make()
        cfg0 = Config(format=fmt, dtype="float32")
        st0 = convert(coo, cfg0)
        x = jnp.asarray(rng.uniform(size=coo.n_col).astype(np.float32))
        sec0 = time_chained(spmv_fn(cfg0), st0, x)
        gf0 = 2 * coo.nnz / sec0 / 1e9
        lines.append(f"{name:<18} {'spmv:' + getattr(st0, 'chosen', fmt):<10}"
                     f" {1:>4} {sec0 * 1e6:>9.1f} {gf0:>8.1f} {'':>9}")
        log(lines[-1])
        del st0
        for b in (8, 32):
            cfg = Config(format=fmt, dtype="float32", spmm_b=b)
            st = convert(coo, cfg)
            X = jnp.asarray(rng.uniform(
                size=(coo.n_col, b)).astype(np.float32))
            sec = time_chained(spmm_fn(cfg), st, X)
            gf = 2 * coo.nnz * b / sec / 1e9
            ratio = (b / sec) * sec0
            lines.append(f"{name:<18} "
                         f"{'spmm:' + getattr(st, 'chosen', fmt):<10} "
                         f"{b:>4} {sec * 1e6:>9.1f} {gf:>8.1f} "
                         f"{ratio:>9.2f}")
            log(lines[-1])
            del st
    txt = "\n".join(lines) + "\n"
    with open("results/r5_tpu_spmm.txt", "w") as f:
        f.write(txt)
    print(txt)


if __name__ == "__main__":
    main()
