"""On-chip slab benchmark across the natural-suite stand-ins.

Prints per matrix: plan (m, T, K, pad), convert time, spmv GFLOPS, and the
current suite row's number for comparison.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax.numpy as jnp

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.core import native, verify_result
    from singlespmv_tpu.data.structgen import synthesize_structured
    from singlespmv_tpu.harness.microbench import _chained, _time
    from singlespmv_tpu.formats import slab

    native.npalloc_prefault(8 << 30)
    cfg = Config(format="slab", dtype="float32")

    names = sys.argv[1:] or [
        "g7jac200sc", "lhr34", "twotone", "mac_econ_fwd500", "raefsky3",
        "ASIC_680ks", "thermomech_dK", "stomach", "webbase-1M", "sme3Dc",
        "laminar_duct3D", "xenon2", "Chebyshev4", "Hamrle3", "torso1",
    ]
    for name in names:
        coo = synthesize_structured(name)
        t0 = time.time()
        try:
            plan = slab.estimate(coo, cfg)
            if not plan["feasible"]:
                log(f"{name}: slab refuses (slots={plan['slots']})")
                continue
            st = slab.convert(coo, cfg, plan=plan)
        except (ValueError, TypeError) as e:
            log(f"{name}: {e}")
            continue
        tconv = time.time() - t0
        x = jnp.asarray(np.random.default_rng(3).standard_normal(
            coo.n_col).astype(np.float32))

        def body(c, tiny, st):
            y = slab.spmv(st, c)
            return c * (1.0 + y[0] * tiny)

        y = np.asarray(slab.spmv(st, x))
        ok, det = verify_result(coo, np.asarray(x), y, dtype=np.float32)
        # state passed as a jit arg, NOT a closure capture: captured arrays
        # embed as HLO constants and blow the remote-compile payload limit
        sec = _time(_chained(body), x, (st,))
        gf = 2 * coo.nnz / sec / 1e9
        log(f"{name}: m={st.m} T={st.t_step} "
            f"pad={st.n_slots/coo.nnz:.2f} conv={tconv:.1f}s "
            f"spmv={sec*1e6:.0f}us {gf:.2f} GFLOPS "
            f"verify={'PASS' if ok else 'FAIL ' + str(det)}")


if __name__ == "__main__":
    main()
