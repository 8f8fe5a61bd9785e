"""Probe the v4 blk-granular route kernel vs the v3 σ-plane route.

ASIC-like base (from the r5 measured convert of the ASIC_680ks stand-in):
24k stream rows, T=64, m2 slice 16 / true span 9, planes 16, p1=512,
41 chunks, 334 buckets.  Questions:
  1. one-hot blk route (kblk picks + (p_oh,T) MXU) vs per-plane VPU route
  2. msel (exact select width) vs m (aligned slice width) decoupling
  3. T scaling of the per-step fixed cost
  4. out-block size / flush economics (steps per group)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

DEADLINE = time.time() + float(os.environ.get("PROBE_BUDGET_S", "1800"))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from singlespmv_tpu.ops.pallas.xch import xch_route, xch_route4

    t0 = time.time()
    float(np.asarray(jnp.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    H = 24 * 1024

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
        while True:
            t0 = time.time()
            sync(run_j(args, loop))
            if time.time() - t0 > 0.35 or loop >= 4096:
                break
            loop *= 2
        pers = []
        for _ in range(3):
            half = loop // 2
            t0 = time.time()
            sync(run_j(args, half))
            t1 = time.time()
            sync(run_j(args, loop))
            t2 = time.time()
            d = (t2 - t1) - (t1 - t0)
            pers.append(d / (loop - half) if d > 0
                        else (t2 - t0) / (loop + half))
        return float(np.median(pers)) / n_slots * 1e9

    def build_v4(T, m, msel, kblk, p_oh, gb, steps_per_grp, p1=512, nc=41):
        n_steps = H // T
        n_grp = max(n_steps // steps_per_grp, 1)
        gids = np.minimum(np.arange(n_steps) // steps_per_grp,
                          n_grp - 1).astype(np.int32)
        off = rng.integers(0, max(gb - p_oh, 1), n_steps).astype(np.int32)
        cs = np.minimum((np.arange(n_steps) * nc) // n_steps,
                        nc - 1).astype(np.int32)
        win = rng.integers(0, max(p1 - m, 1), H).astype(np.int32)
        lane = rng.integers(0, 128, (H, 128)).astype(np.int8)
        sub = rng.integers(0, msel, (H, 128)).astype(np.int8)
        hm1 = np.broadcast_to(np.arange(-1, 127, dtype=np.int8),
                              (H, 128)).copy()
        sig = np.broadcast_to(
            rng.integers(0, max(p_oh - kblk, 1) + 1, (H, 1)).astype(np.int8),
            (H, 128)).copy()
        idx = np.full((kblk, H, 128), -1, np.int8)
        # every slot is its own run end, spread across the kblk planes
        jsel = rng.integers(0, kblk, (H, 128))
        hh = np.repeat(np.arange(H), 128)
        ll = np.tile(np.arange(128), H)
        idx[jsel.reshape(-1), hh, ll] = ll.astype(np.int8)
        prod = rng.uniform(-1, 1, (nc, p1, 128)).astype(np.float32)
        args = [jnp.asarray(a) for a in (gids, off, cs, win, lane, sub,
                                         hm1, sig, idx, prod)]
        return args, n_grp

    def build_v3(T, m, planes, steps_per_bucket, p1=512, nc=41, G=16):
        n_steps = H // T
        nb = max(int(n_steps / steps_per_bucket), 1)
        rep = np.sort(np.repeat(np.arange(nb), int(steps_per_bucket)))
        if len(rep) < n_steps:
            rep = np.concatenate(
                [rep, np.full(n_steps - len(rep), nb - 1, rep.dtype)])
        uids = rep[:n_steps].astype(np.int32)
        gids = (uids // G).astype(np.int32)
        cs = np.minimum((np.arange(n_steps) * nc) // n_steps,
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
        return args, ngb

    # --- v3 baseline at the r5-measured ASIC plan ---
    for (T, m, planes, spb) in [(64, 16, 16, 1.1)]:
        args, ngb = build_v3(T, m, planes, spb)
        ns = bench(lambda *a: xch_route(*a, ngb, m, planes, T, 16, 8),
                   args, H * 128)
        log(f"v3 T={T} m={m} planes={planes}: {ns:.4f} ns/slot")

    # --- v4 sweep ---
    # ASIC-like steps_per_grp: 24k rows / T per group of gb blocks...
    # out coverage: one group = gb 128-row blocks; ASIC residual 5334 blocks.
    variants = [
        dict(T=64, m=16, msel=16, kblk=16, p_oh=16, gb=512, steps_per_grp=96),
        dict(T=64, m=16, msel=9, kblk=16, p_oh=16, gb=512, steps_per_grp=96),
        dict(T=64, m=16, msel=9, kblk=8, p_oh=16, gb=512, steps_per_grp=96),
        dict(T=64, m=16, msel=9, kblk=4, p_oh=16, gb=512, steps_per_grp=96),
        dict(T=64, m=8, msel=8, kblk=8, p_oh=16, gb=512, steps_per_grp=96),
        dict(T=64, m=24, msel=20, kblk=8, p_oh=16, gb=512, steps_per_grp=96),
        dict(T=128, m=16, msel=9, kblk=8, p_oh=16, gb=512, steps_per_grp=48),
        dict(T=32, m=16, msel=9, kblk=8, p_oh=16, gb=512, steps_per_grp=192),
        dict(T=64, m=16, msel=9, kblk=8, p_oh=32, gb=512, steps_per_grp=96),
        dict(T=64, m=16, msel=9, kblk=8, p_oh=8, gb=512, steps_per_grp=96),
        dict(T=64, m=16, msel=9, kblk=8, p_oh=16, gb=2048, steps_per_grp=384),
        dict(T=64, m=16, msel=9, kblk=8, p_oh=16, gb=128, steps_per_grp=24),
        dict(T=64, m=16, msel=9, kblk=8, p_oh=16, gb=512, steps_per_grp=12),
        dict(T=64, m=16, msel=9, kblk=2, p_oh=16, gb=512, steps_per_grp=96),
        dict(T=64, m=16, msel=9, kblk=1, p_oh=16, gb=512, steps_per_grp=96),
        dict(T=128, m=16, msel=9, kblk=4, p_oh=16, gb=1024, steps_per_grp=96),
        dict(T=128, m=8, msel=8, kblk=4, p_oh=16, gb=1024, steps_per_grp=96),
        dict(T=128, m=8, msel=8, kblk=2, p_oh=8, gb=1024, steps_per_grp=96),
    ]
    for v in variants:
        if time.time() > DEADLINE:
            log("budget exhausted")
            return
        args, n_grp = build_v4(**v)
        try:
            ns = bench(lambda *a, v=v, n_grp=n_grp: xch_route4(
                *a, n_grp, v["gb"], v["m"], v["msel"], v["T"], v["p_oh"]),
                args, H * 128)
            log(f"v4 {v}: {ns:.4f} ns/slot")
        except Exception as e:  # noqa: BLE001
            log(f"v4 {v}: ERROR {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
