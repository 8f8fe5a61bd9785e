"""Bisect the real-matrix xch slowdown: sweep mul/route at REAL shapes.

Real Hamrle3: mul 2.6 ns/slot (CB=11313, H=75776, m1=5, T=128, monotone
windows), route 3.4 (p1=1024, nc=74, planes=16, m2=23, T=32, 3 steps/bkt).
Synthetic probe at toy shapes: mul 0.01-0.13, route 0.2-0.7.  One of the
shape factors must be the cliff.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

DEADLINE = time.time() + float(os.environ.get("PROBE_BUDGET_S", "2400"))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from singlespmv_tpu.ops.pallas.xch import xch_mul, xch_route

    rng = np.random.default_rng(0)
    t0 = time.time()
    float(np.asarray(jnp.ones((8,)))[0])
    log(f"canary ok {time.time() - t0:.1f}s")

    def bench(fn, args, n_slots, loop=128):
        # chained on-device loop, traced n: one compile, no tunnel round-trips
        def run_n(a, n):
            def body(i, a):
                out = fn(*a)
                s = jnp.ravel(out)[0] * jnp.asarray(1e-38, out.dtype)
                a = list(a)
                a[-1] = a[-1] + s.astype(a[-1].dtype)
                return tuple(a)
            return jax.lax.fori_loop(0, n, body, tuple(a))[-1]

        run_j = jax.jit(run_n)
        jax.block_until_ready(run_j(args, jnp.int32(1)))
        half = loop // 2
        t0 = time.time()
        jax.block_until_ready(run_j(args, jnp.int32(half)))
        t1 = time.time()
        jax.block_until_ready(run_j(args, jnp.int32(loop)))
        t2 = time.time()
        return ((t2 - t1) - (t1 - t0)) / (loop - half) / n_slots * 1e9

    def mul_case(CB, H, m, T, win_mode):
        if win_mode == "mono":
            win = np.minimum((np.arange(H, dtype=np.int64) * max(CB - m, 1))
                             // max(H, 1), CB - m).astype(np.int32)
        else:
            win = rng.integers(0, max(CB - m, 1), H).astype(np.int32)
        lane = rng.integers(0, 128, (H, 128)).astype(np.int8)
        sub = rng.integers(0, m, (H, 128)).astype(np.int8)
        val = rng.uniform(-1, 1, (H, 128)).astype(np.float32)
        xt = rng.uniform(-1, 1, (CB, 128)).astype(np.float32)
        args = [jnp.asarray(a) for a in (win, lane, sub, val, xt)]
        fn = jax.jit(lambda *a: xch_mul(*a, m, T))
        return bench(fn, args, H * 128)

    log("=== mul: real-shape bisect (base = real Hamrle3) ===")
    cases = [
        ("real(CB11k,H75k,m5,T128,mono)", dict(CB=11313, H=75776, m=5,
                                               T=128, win_mode="mono")),
        ("CB=4096", dict(CB=4096, H=75776, m=5, T=128, win_mode="mono")),
        ("H=16k", dict(CB=11313, H=16384, m=5, T=128, win_mode="mono")),
        ("m=8", dict(CB=11313, H=75776, m=8, T=128, win_mode="mono")),
        ("win=rand", dict(CB=11313, H=75776, m=5, T=128, win_mode="rand")),
        ("toy(CB4096,H16k,m8)", dict(CB=4096, H=16384, m=8, T=128,
                                     win_mode="rand")),
    ]
    for name, kw in cases:
        if time.time() > DEADLINE:
            return
        try:
            ns = mul_case(**kw)
            log(f"{name:<30}: {ns:.4f} ns/slot")
        except Exception as e:  # noqa: BLE001
            log(f"{name:<30}: ERROR {type(e).__name__}: {e}")

    def route_case(p1, nc, planes, spb, T, m, H, G=16):
        n_steps = H // T
        nb = max(n_steps // spb, 1)
        rep = np.sort(np.repeat(np.arange(nb), spb))
        if len(rep) < n_steps:
            rep = np.concatenate([rep, np.full(n_steps - len(rep), nb - 1,
                                               rep.dtype)])
        uids = rep[:n_steps].astype(np.int32)
        gids = (uids // G).astype(np.int32)
        cs = np.minimum((uids.astype(np.int64) * nc) // max(uids[-1], 1),
                        nc - 1).astype(np.int32)
        win = rng.integers(0, max(p1 - m, 1), H).astype(np.int32)
        lane = rng.integers(0, 128, (H, 128)).astype(np.int8)
        sub = rng.integers(0, m, (H, 128)).astype(np.int8)
        hm1 = np.broadcast_to(np.arange(-1, 127, dtype=np.int8),
                              (H, 128)).copy()
        sig = (np.arange(128)[None, :] + np.arange(H)[:, None]) % planes
        idx = np.full((planes, H, 128), -1, np.int8)
        hh = np.repeat(np.arange(H), 128)
        ll = np.tile(np.arange(128), H)
        idx[sig.reshape(-1), hh, ll] = ll.astype(np.int8)
        prod = rng.uniform(-1, 1, (nc, p1, 128)).astype(np.float32)
        ngb = int(gids[-1]) + 1
        sg0 = np.zeros(n_steps, np.int32)
        sg1 = np.full(n_steps, planes - 1, np.int32)
        args = [jnp.asarray(a) for a in (uids, gids, cs, sg0, sg1, win,
                                         lane, sub, hm1, idx, prod)]
        fn = jax.jit(lambda *a: xch_route(*a, ngb, m, planes, T, G))
        return bench(fn, args, H * 128)

    log("=== route: real-shape bisect ===")
    rcases = [
        ("real(p1=1024,nc74,p16,m23,H67k)",
         dict(p1=1024, nc=74, planes=16, spb=3, T=32, m=23, H=67712)),
        ("H=16k", dict(p1=1024, nc=74, planes=16, spb=3, T=32, m=23,
                       H=16384)),
        ("m=8", dict(p1=1024, nc=74, planes=16, spb=3, T=32, m=8, H=67712)),
        ("nc=8", dict(p1=1024, nc=8, planes=16, spb=3, T=32, m=23, H=67712)),
        ("p1=512", dict(p1=512, nc=74, planes=16, spb=3, T=32, m=23,
                        H=67712)),
        ("toy(p1512,nc32,m17,H16k)",
         dict(p1=512, nc=32, planes=16, spb=3, T=32, m=17, H=16384)),
    ]
    for name, kw in rcases:
        if time.time() > DEADLINE:
            return
        try:
            ns = route_case(**kw)
            log(f"{name:<30}: {ns:.4f} ns/slot")
        except Exception as e:  # noqa: BLE001
            log(f"{name:<30}: ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
