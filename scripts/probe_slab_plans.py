"""Driver-grade timing of slab plan variants on the regressed mid matrices.

The quick 2-window marginal probe showed 2.5x same-plan swings and negative
times — tunnel noise dominates sub-50ms windows.  This uses the driver's
method: calibrate loop count to >=0.35 s windows, best-of-5 marginal.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench_state(spmv, st, x, cal_s=0.35, trials=5):
    import jax
    import jax.numpy as jnp

    from singlespmv_tpu.harness.driver import make_chained_runner, sync

    run_n = make_chained_runner(lambda s, a: spmv(s, a), x)
    sync(run_n(st, x, jnp.int32(1)))
    loop = 1
    while loop < (1 << 20):
        t0 = time.perf_counter()
        sync(run_n(st, x, jnp.int32(loop)))
        if time.perf_counter() - t0 >= cal_s:
            break
        loop *= 2
    best = float("inf")
    for _ in range(trials):
        half = max(loop // 2, 1)
        t0 = time.perf_counter()
        sync(run_n(st, x, jnp.int32(half)))
        t1 = time.perf_counter()
        sync(run_n(st, x, jnp.int32(loop)))
        t2 = time.perf_counter()
        margin = (t2 - t1) - (t1 - t0)
        per = margin / (loop - half) if margin > 0 else (t2 - t0) / (loop + half)
        best = min(best, per)
    return best


def main():
    import jax.numpy as jnp

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.structgen import synthesize_structured
    import singlespmv_tpu.formats.slab as S

    cfg = Config(format="slab", dtype="float32")
    names = sys.argv[1:] or ["twotone", "xenon2", "thermomech_dK", "lhr34",
                             "laminar_duct3D"]
    for name in names:
        coo = synthesize_structured(name, seed=0)
        x = jnp.asarray(np.random.default_rng(3).uniform(
            -1, 1, coo.n_col).astype(np.float32))
        st = S.convert(coo, cfg)
        t = bench_state(S.spmv, st, x)
        log(f"{name} AUTO mode={st.mode} m={st.m} t={st.t_step} "
            f"planes={st.planes} pg={st.pg} hub={st.hub_off > 0} "
            f"pad={st.n_slots / coo.nnz:.2f} -> {2 * coo.nnz / t / 1e9:.2f} GF")
        for fx in (dict(mode="blk", kblk=2, m=8, t=128, planes=8),
                   dict(mode="blk", kblk=4, m=8, t=128, planes=16),
                   dict(mode="blk", kblk=1, m=8, t=128, planes=8),
                   dict(mode="unit", kblk=1, m=8, t=128, planes=8)):
            try:
                p = S._estimate_cols(np.asarray(coo.row, np.int64),
                                     np.asarray(coo.col, np.int64),
                                     coo.nnz, fixed=fx)
                if not p["feasible"]:
                    log(f"  {fx} infeasible")
                    continue
                p.update(hub_cols=None, cols_eff=None, hub_off=0)
                st2 = S.convert(coo, cfg, plan=p)
                t2 = bench_state(S.spmv, st2, x)
                log(f"  {fx['mode']} kblk={fx['kblk']} m={st2.m} t={st2.t_step} "
                    f"planes={st2.planes} pg={st2.pg} "
                    f"pad={st2.n_slots / coo.nnz:.2f} "
                    f"-> {2 * coo.nnz / t2 / 1e9:.2f} GF")
            except Exception as e:  # noqa: BLE001
                log(f"  {fx} ERROR {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
