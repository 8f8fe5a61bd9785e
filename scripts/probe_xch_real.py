"""Dissect xch on a REAL giant: layout stats + per-pass on-chip timing.

The synthetic route probe runs 0.17-0.36 ns/slot; real giants run ~1.1.
This prints the convert's chosen plan, the per-step layout distributions
(steps per bucket / G-group / chunk-switch, active-plane histogram), then
times mul and route separately on the chip, per call chunk.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

NAME = sys.argv[1] if len(sys.argv) > 1 else "Hamrle3"


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from singlespmv_tpu.config import Config
    from singlespmv_tpu.data.structgen import synthesize_structured
    from singlespmv_tpu.formats import cache as fcache
    from singlespmv_tpu.formats import xch as fx

    t0 = time.time()
    float(np.asarray(jnp.ones((8,)))[0])
    log(f"canary ok {time.time() - t0:.1f}s")

    coo = synthesize_structured(NAME, seed=0)
    cfg = Config(format="xch", dtype="float32")
    t0 = time.time()
    st = fcache.convert_cached(coo, cfg, "results/state_cache",
                               f"synth-{NAME}")
    log(f"state ready in {time.time() - t0:.1f}s")
    log(f"plan: m1={st.m1} m2={st.m2} t1={st.t1} t2={st.t2} "
        f"planes={st.planes} span={st.span} chunks={st.n_chunks} "
        f"p1={st.p1} buckets={st.n_buckets} "
        f"slots1={st.n_slots1} ({st.n_slots1 / coo.nnz:.2f}/nnz) "
        f"slots2={st.n_slots2} ({st.n_slots2 / coo.nnz:.2f}/nnz)")

    # layout distributions per call chunk
    for k, (u, g, c) in enumerate(zip(st.uids2, st.gids2, st.cs2)):
        u = np.asarray(u); g = np.asarray(g); c = np.asarray(c)
        n_steps = len(u)
        gsw = int(np.count_nonzero(g[1:] != g[:-1])) + 1
        csw = int(np.count_nonzero(c[1:] != c[:-1])) + 1
        usw = int(np.count_nonzero(u[1:] != u[:-1])) + 1
        s0 = np.asarray(st.sg0_2[k]); s1 = np.asarray(st.sg1_2[k])
        act = np.maximum(s1 - s0 + 1, 0)
        log(f"chunk{k}: steps={n_steps} bkt-switch={usw} "
            f"G-switch={gsw} chunk-switch={csw} "
            f"steps/G={n_steps / gsw:.1f} steps/chunkblk={n_steps / csw:.1f} "
            f"act-planes p50/p90/max={np.percentile(act, 50):.0f}/"
            f"{np.percentile(act, 90):.0f}/{act.max()}")

    # --- on-chip phase timing (chained on-device loops: the axon tunnel
    # costs 10-25 ms per dispatch round-trip, so per-call timing is junk) ---
    x = jnp.asarray(np.random.default_rng(3).uniform(
        -1, 1, coo.n_col).astype(np.float32))

    def bench_chained(fn, feed, loop=256):
        """time one fn(feed) where the output perturbs feed (serializes)."""
        def run_n(f, n):
            def body(i, f):
                out = fn(f)
                s = jnp.ravel(out)[0] * jnp.asarray(1e-38, out.dtype)
                return f + s.astype(f.dtype)
            return jax.lax.fori_loop(0, n, body, f)

        import jax.numpy as _jnp
        run_j = jax.jit(run_n)          # n traced: one compile for all n
        jax.block_until_ready(run_j(feed, _jnp.int32(1)))
        half = loop // 2
        t0 = time.time()
        jax.block_until_ready(run_j(feed, _jnp.int32(half)))
        t1 = time.time()
        jax.block_until_ready(run_j(feed, _jnp.int32(loop)))
        t2 = time.time()
        return ((t2 - t1) - (t1 - t0)) / (loop - half)

    tm = bench_chained(lambda xx: fx._mul_phase(st, xx), x)
    log(f"mul:   {tm * 1e3:.3f} ms  ({tm / max(st.n_slots1, 1) * 1e9:.3f} "
        f"ns/slot)")
    prod = jax.jit(lambda xx: fx._mul_phase(st, xx))(x)
    tr = bench_chained(lambda p: fx._route_phase(st, p), prod)
    log(f"route: {tr * 1e3:.3f} ms  ({tr / max(st.n_slots2, 1) * 1e9:.3f} "
        f"ns/slot)")


if __name__ == "__main__":
    main()
