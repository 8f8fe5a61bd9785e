"""On-chip spot benchmark of the ellg v2 level cascade vs CSR5/AVX2 baselines."""
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(m, flush=True)


def main(names=None):
    import jax.numpy as jnp

    from singlespmv_tpu.core import native
    native.npalloc_prefault(8 << 30)
    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.structgen import synthesize_structured
    from singlespmv_tpu.formats import ellg
    from singlespmv_tpu.harness.microbench import _chained, _time
    from singlespmv_tpu.harness.suite import BASELINE_AVX2

    todo = names or ["stomach", "mac_econ_fwd500", "xenon2", "torso1",
                     "twotone", "raefsky3", "para-4", "g7jac200sc",
                     "thermomech_dK", "lhr34", "sme3Dc", "ohne2", "PR02R",
                     "laminar_duct3D", "Chebyshev4", "Hamrle3",
                     "ASIC_680ks", "webbase-1M"]
    for name in todo:
        base = BASELINE_AVX2.get(name, float("nan"))
        coo = synthesize_structured(name, seed=0)
        cfg = Config(format="ellg", dtype="float32")
        try:
            t1 = time.time()
            st = ellg.convert(coo, cfg)
            tconv = time.time() - t1
        except Exception as e:  # noqa: BLE001
            log(f"{name}: convert REFUSED {type(e).__name__}: {str(e)[:140]}")
            continue
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(coo.n_col), jnp.float32)

        def body(c, tiny, st=st):
            y = ellg.spmv(st, c)
            return c * (1.0 + y[0] * tiny)

        sec = _time(_chained(body), x)
        gf = 2 * coo.nnz / sec / 1e9
        log(f"{name}: {gf:.1f} GFLOPS (x{gf / base:.2f} vs {base}) "
            f"conv={tconv:.1f}s {ellg.report_fields(st, cfg)}")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
