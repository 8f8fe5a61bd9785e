"""Factor isolation for the xch route kernel's real-matrix slowdown.

The synthetic microbench ran 0.10-0.27 ns/slot; real giants run 0.9-1.4.
This sweeps one factor at a time from a 'realistic ASIC-like' base:
source-block rows p1, chunk count NC, planes, steps-per-bucket, T, m.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

DEADLINE = time.time() + float(os.environ.get("PROBE_BUDGET_S", "2000"))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from singlespmv_tpu.ops.pallas.xch import xch_route

    t0 = time.time()
    float(np.asarray(jnp.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    H = 16 * 1024
    G = 16

    def sync(x):
        return float(jax.device_get(jax.numpy.ravel(x)[0]))

    def bench(fn, args, n_slots, loop=64):
        def run_n(a, n):
            def body(i, a):
                out = fn(*a)
                s = jnp.ravel(out)[0] * jnp.asarray(1e-38, out.dtype)
                a = list(a)
                a[-1] = a[-1] + s.astype(a[-1].dtype)
                return tuple(a)

            return jax.lax.fori_loop(0, n, body, tuple(a))[-1]

        run_j = jax.jit(run_n)
        sync(run_j(args, 1))
        half = loop // 2
        t0 = time.time()
        sync(run_j(args, half))
        t1 = time.time()
        sync(run_j(args, loop))
        t2 = time.time()
        d = (t2 - t1) - (t1 - t0)
        per = d / (loop - half) if d > 0 else (t2 - t0) / (loop + half)
        return per / n_slots * 1e9

    def build(p1, nc, planes, steps_per_bucket, T, m, cs_mode="real",
              active=1.0):
        n_steps = H // T
        nb = max(int(n_steps / steps_per_bucket), 1)
        if steps_per_bucket != int(steps_per_bucket):
            uids = np.sort(rng.integers(0, nb, n_steps)).astype(np.int32)
        else:
            rep = np.sort(np.repeat(np.arange(nb), int(steps_per_bucket)))
            if len(rep) < n_steps:   # pad so prefetch arrays cover the grid
                rep = np.concatenate(
                    [rep, np.full(n_steps - len(rep), nb - 1, rep.dtype)])
            uids = rep[:n_steps].astype(np.int32)
        uids = np.minimum.accumulate(uids[::-1])[::-1]  # non-decreasing
        uids = np.sort(uids)
        gids = (uids // G).astype(np.int32)
        if cs_mode == "real":       # mostly constant, advancing with rows
            cs = np.minimum((uids.astype(np.int64) * nc) // max(uids[-1], 1),
                            nc - 1).astype(np.int32)
        else:                        # random per bucket (microbench style)
            per_b = rng.integers(0, nc, nb)
            cs = per_b[uids].astype(np.int32)
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
        sg1 = np.full(n_steps, max(int(planes * active), 1) - 1, np.int32)
        args = [jnp.asarray(a) for a in (uids, gids, cs, sg0, sg1, win,
                                         lane, sub, hm1, idx, prod)]
        return args, ngb

    BASE = dict(p1=512, nc=32, planes=32, steps_per_bucket=3, T=32, m=17)
    variants = [
        ("base(ASIC-like)", {}),
        ("act=.5 (span-skip)", {"active": 0.5}),
        ("act=.25", {"active": 0.25}),
        ("planes=16", {"planes": 16, "m": 24}),
        ("p16 act=.5", {"planes": 16, "m": 24, "active": 0.5}),
        ("planes=8", {"planes": 8, "m": 34}),
        ("m=4", {"m": 4}),
        ("p16 m=8", {"planes": 16, "m": 8}),
        ("p16 m=16", {"planes": 16, "m": 16}),
        ("p32 m=8", {"m": 8}),
        ("p8 m=8", {"planes": 8, "m": 8}),
        ("p8 m=16", {"planes": 8, "m": 16}),
        ("T=64", {"T": 64}),
        ("micro-like", {"p1": 2048, "nc": 4, "planes": 16,
                        "steps_per_bucket": 8, "T": 64, "m": 16}),
    ]
    for pg in (4, 8, 16):
        for name, over in variants:
            if time.time() > DEADLINE:
                log("budget exhausted")
                return
            cfg = dict(BASE)
            cfg.update(over)
            args, ngb = build(**cfg)
            try:
                ns = bench(lambda *a, ngb=ngb, c=cfg, pg=pg: xch_route(
                    *a, ngb, c["m"], c["planes"], c["T"], G, pg),
                    args, H * 128)
                log(f"pg={pg:<2} {name:<18}: {ns:.4f} ns/slot")
            except Exception as e:  # noqa: BLE001
                log(f"pg={pg:<2} {name:<18}: ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
