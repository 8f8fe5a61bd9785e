"""Diagnose the catastrophic ELLG picks on the hyper-sparse giants.

For each of synth-{ASIC_680ks, webbase-1M, Hamrle3}: convert with ellg and
bkt_g, time each on chip (chained runner), and break ellg down per pass.
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
    from singlespmv_tpu.core import native
    from singlespmv_tpu.data.structgen import synthesize_structured
    from singlespmv_tpu.harness.microbench import _chained, _time
    from singlespmv_tpu.formats import ellg, bkt

    native.npalloc_prefault(6 << 30)

    for name in ("ASIC_680ks", "webbase-1M", "Hamrle3"):
        coo = synthesize_structured(name)
        log(f"{name}: n={coo.n_row} nnz={coo.nnz}")
        x = jnp.asarray(np.random.default_rng(3).standard_normal(
            coo.n_col).astype(np.float32))
        cfg = Config(format="ellg", dtype="float32")

        t0 = time.time()
        try:
            st = ellg.convert(coo, cfg)
        except ValueError as e:
            log(f"  ellg refuses: {e}")
            st = None
        if st is not None:
            log(f"  ellg convert {time.time()-t0:.1f}s; levels="
                f"{[(p.t, p.m, p.n_blocks, p.full) for p in st.passes]} "
                f"slots={st.n_slots} pad={st.n_slots/coo.nnz:.2f} "
                f"rest={st.rest_fmt}:{st.rest_nnz}")

            def body(c, tiny, st=st):
                y = ellg.spmv(st, c)
                return c * (1.0 + y[0] * tiny)

            sec = _time(_chained(body), x, ())
            log(f"  ellg spmv {sec*1e6:.0f} us = "
                f"{2*coo.nnz/sec/1e9:.2f} GFLOPS")

            # per-pass: time partial states with only pass k
            import dataclasses
            for k, p in enumerate(st.passes):
                st1 = dataclasses.replace(st, passes=(p,), rest_fmt="",
                                          rest_state=None)

                def body1(c, tiny, st1=st1):
                    y = ellg.spmv(st1, c)
                    return c * (1.0 + y[0] * tiny)

                s1 = _time(_chained(body1), x, ())
                log(f"    pass{k} t={p.t} m={p.m} nb={p.n_blocks} "
                    f"full={p.full} slots={p.n_blocks*128*p.t}: "
                    f"{s1*1e6:.0f} us")
            if st.rest_fmt:
                str_ = dataclasses.replace(st, passes=())

                def bodyr(c, tiny, str_=str_):
                    y = ellg.spmv(str_, c)
                    return c * (1.0 + y[0] * tiny)

                sr = _time(_chained(bodyr), x, ())
                log(f"    rest {st.rest_fmt} nnz={st.rest_nnz}: "
                    f"{sr*1e6:.0f} us")

        # bkt_g comparison
        t0 = time.time()
        try:
            stg = bkt.convert(coo, cfg.replace(format="bkt",
                                               bkt_row_group=1024))
            log(f"  bkt_g convert {time.time()-t0:.1f}s")

            def bodyg(c, tiny, stg=stg):
                y = bkt.spmv(stg, c)
                return c * (1.0 + y[0] * tiny)

            sg = _time(_chained(bodyg), x, ())
            log(f"  bkt_g spmv {sg*1e6:.0f} us = "
                f"{2*coo.nnz/sg/1e9:.2f} GFLOPS")
        except Exception as e:
            log(f"  bkt_g fails: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
