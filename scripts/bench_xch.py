"""XCH parameter probe on the real chip: sweep (planes, k_slots, m2, t2),
time the Mul and Route passes separately, print a table.

Usage: python scripts/bench_xch.py [matrix-name] [--quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def time_fn(fn, state, arg, loop=64):
    import jax

    from singlespmv_tpu.harness.driver import make_chained_runner, sync

    runner = make_chained_runner(fn, arg)
    sync(runner(state, arg, 1))
    half = loop // 2
    t0 = time.time()
    sync(runner(state, arg, half))
    t1 = time.time()
    sync(runner(state, arg, loop))
    t2 = time.time()
    margin = (t2 - t1) - (t1 - t0)
    return margin / (loop - half) if margin > 0 else (t2 - t0) / (loop + half)


def main():
    import jax

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.core.oracle import verify_result
    from singlespmv_tpu.data.structgen import synthesize_structured
    from singlespmv_tpu.formats import xch

    name = sys.argv[1] if len(sys.argv) > 1 else "webbase-1M"
    coo = synthesize_structured(name, seed=0)
    log(f"{name}: nnz={coo.nnz} n={coo.n_row}")
    x = np.random.default_rng(3).uniform(size=coo.n_col).astype(np.float32)
    cfg = Config(format="xch", dtype="float32")

    base = xch.estimate(coo, cfg)
    log(f"plan: {base}")

    grids = []
    for planes in (8, 16):
        for ksc in (1.0, 8.0):
            for t2 in (32, 64):
                grids.append(dict(planes=planes,
                                  k_slots=int(base["k_slots"] * ksc),
                                  t2=t2, m2_fix=None))
    # plus explicit small-m2 probes at the default geometry
    for m2 in (8, 16, 32):
        grids.append(dict(planes=16, k_slots=base["k_slots"], t2=32,
                          m2_fix=m2))

    rows = []
    for g in grids:
        p = dict(base)
        p.update({k: v for k, v in g.items() if v is not None})
        try:
            t0 = time.time()
            st = xch.convert(coo, cfg, plan=p)
            st = jax.block_until_ready(st)
            conv_s = time.time() - t0
            spmv = jax.jit(xch.spmv)
            y = np.asarray(spmv(st, x))
            ok, det = verify_result(coo, x, y, dtype=np.float32)
            mul_s = time_fn(xch._mul_phase, st, x)
            prod = jax.block_until_ready(jax.jit(xch._mul_phase)(st, x))
            route_s = time_fn(xch._route_phase, st, prod)
            tot = time_fn(xch.spmv, st, x)
            gf = 2 * coo.nnz / tot / 1e9
            pad = (st.n_slots1 + st.n_slots2) / (2 * coo.nnz)
            row = (f"planes={st.planes} k={p['k_slots']} t2={st.t2} "
                   f"m1={st.m1} m2={st.m2} pad={pad:.2f} "
                   f"conv={conv_s:.1f}s mul={mul_s*1e3:.2f}ms "
                   f"route={route_s*1e3:.2f}ms tot={tot*1e3:.2f}ms "
                   f"GF={gf:.2f} verify={'PASS' if ok else 'FAIL'}")
            rows.append(row)
            log(row)
            del st
        except Exception as e:  # noqa: BLE001
            log(f"{g}: ERROR {type(e).__name__}: {e}")
    log("==== summary ====")
    for r in rows:
        print(r, flush=True)


if __name__ == "__main__":
    main()
