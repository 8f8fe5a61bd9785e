"""r5 distributed-flagship measurements (parallel/xchd.DistXch).

Two parts:
  --chip : real-TPU 1-device-mesh overhead of the sharded operator vs the
           bare single-chip xch spmv (target < 10%).
  --mesh : 8-virtual-device CPU mesh scaling table (oversubscribed host —
           relative throughput only) vs the r4 SS-based operators.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench_call(fn, sync, loop0=8, budget=0.35):
    loop = loop0
    fn()
    while True:
        t0 = time.time()
        for _ in range(loop):
            r = fn()
        sync(r)
        if time.time() - t0 > budget or loop >= 4096:
            break
        loop *= 2
    pers = []
    for _ in range(3):
        half = max(loop // 2, 1)
        t0 = time.time()
        for _ in range(half):
            r = fn()
        sync(r)
        t1 = time.time()
        for _ in range(loop):
            r = fn()
        sync(r)
        t2 = time.time()
        d = (t2 - t1) - (t1 - t0)
        pers.append(d / (loop - half) if d > 0 else (t2 - t0) / (loop + half))
    return float(np.median(pers))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--mesh", action="store_true")
    args = ap.parse_args()

    if args.mesh:
        # BEFORE the jax import: the axon plugin would otherwise open (and
        # hold) the single TPU tunnel even though we only compute on CPU —
        # wedging any concurrent real-chip run (r5 incident)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
    import jax

    if args.mesh:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.core.rng import create_random_vector
    from singlespmv_tpu.data.generators import generate, powerlaw
    from singlespmv_tpu.formats import xch
    from singlespmv_tpu.parallel import DistXch, make_mesh

    def sync(v):
        return float(jax.device_get(jnp.ravel(v)[0]))

    cfg = Config(format="xch", dtype="float32")
    mats = [("powerlaw-100k", powerlaw(100_000, 1_500_000, seed=4)),
            ("band-65536", generate("band", 65_536, 17, seed=1)),
            ("random-50k", powerlaw(50_000, 2_000_000, seed=9))]

    if args.chip:
        from singlespmv_tpu.harness.driver import make_chained_runner
        from singlespmv_tpu.harness.driver import sync as dsync

        def bench_chained(fn, state, xd):
            run_n = make_chained_runner(fn, xd)
            dsync(run_n(state, xd, jnp.int32(1)))
            loop = 4
            while loop < (1 << 15):
                t0 = time.time()
                dsync(run_n(state, xd, jnp.int32(loop)))
                if time.time() - t0 >= 0.35:
                    break
                loop *= 2
            pers = []
            for _ in range(3):
                half = max(loop // 2, 1)
                t0 = time.time()
                dsync(run_n(state, xd, jnp.int32(half)))
                t1 = time.time()
                dsync(run_n(state, xd, jnp.int32(loop)))
                t2 = time.time()
                d = (t2 - t1) - (t1 - t0)
                pers.append(d / (loop - half) if d > 0
                            else (t2 - t0) / (loop + half))
            return float(np.median(pers))

        log("=== real-chip: DistXch(R=1) overhead vs bare xch ===")
        # Two controls: (a) the fully-tuned single-chip xch (auto plan with
        # band peel / long-row fast-track / measured t2) — the headline
        # engine; (b) bare xch forced to DistXch's COMMON plan (no_long /
        # no_peel, fixed knobs) — isolates the shard_map + x-assemble cost
        # from the plan-generality cost (structure peels are per-shard
        # layout-divergent and not yet common-planned).
        for name, coo in mats:
            x = create_random_vector(coo.n_col).astype(np.float32)
            xd = jnp.asarray(x)
            st = xch.convert(coo, cfg)
            t_bare = bench_chained(xch.spmv, st, xd)
            log(f"{name}: tuned bare converted+timed")
            est = xch.estimate_v4(coo, cfg, no_long=True)
            m2c = xch._align8(max(int(est.get("m2_hint", 8)), 1),
                              xch.M2_CAP)
            common = {"feasible": True, "route_v": 4,
                      "k_slots": int(max(coo.nnz, 16 * 128)),
                      "kblk": int(est.get("kblk", 8)), "kblk_fix": True,
                      "p_oh": min(int(est.get("p_oh", 16)), 64),
                      "p_oh_fix": min(int(est.get("p_oh", 16)), 64),
                      "gb": 64, "gb_fix": True, "m2_fix": m2c,
                      "t1_fix": 128, "t2_fix": 64,
                      "no_long": True, "no_peel": True, "no_refine": True}
            stc = xch._convert_v4(coo, cfg, common)
            t_ctrl = bench_chained(xch.spmv, stc, xd)
            log(f"{name}: common-plan control converted+timed")
            mesh = make_mesh((("row", 1),))
            op = DistXch.convert(coo, cfg, mesh)
            t_dist = bench_chained(
                lambda s, a: op._jitted(s, a), op.arrays, xd)
            g = 2 * coo.nnz / 1e9
            log(f"{name}: tuned {t_bare*1e6:.0f} us ({g/t_bare:.2f} GF) | "
                f"common-plan {t_ctrl*1e6:.0f} us ({g/t_ctrl:.2f} GF) | "
                f"dist R=1 {t_dist*1e6:.0f} us ({g/t_dist:.2f} GF) | "
                f"shard overhead {100*(t_dist/t_ctrl-1):+.1f}% | "
                f"plan generality {100*(t_ctrl/t_bare-1):+.1f}%")

    if args.mesh:
        log("=== 8-device CPU mesh scaling (oversubscribed host) ===")
        rows = []
        for name, coo in mats:
            x = create_random_vector(coo.n_col).astype(np.float32)
            xd = jnp.asarray(x)
            base = None
            for R in (1, 2, 4, 8):
                mesh = make_mesh((("row", R),))
                op = DistXch.convert(coo, cfg, mesh)
                sync(op(xd))
                t = bench_call(lambda: op(xd), sync, budget=0.25)
                if base is None:
                    base = t
                eff = base / t / R
                rows.append((name, R, t, base / t, eff))
                log(f"{name} R={R}: {t*1e3:.2f} ms speedup {base/t:.2f}x "
                    f"eff {eff*100:.0f}%")
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results", "r5_cpu_mesh_scaling.txt")
        with open(out, "w") as f:
            f.write("# DistXch (xch v4 under shard_map) on 8 virtual CPU "
                    "devices, one oversubscribed host.\n"
                    "# Relative numbers only: all R share the same physical "
                    "cores, so ideal scaling is flat time, not R x.\n"
                    "matrix\tR\tms\tspeedup\teff\n")
            for name, R, t, sp, eff in rows:
                f.write(f"{name}\t{R}\t{t*1e3:.3f}\t{sp:.3f}\t{eff:.3f}\n")
        log(f"wrote {out}")


if __name__ == "__main__":
    main()
