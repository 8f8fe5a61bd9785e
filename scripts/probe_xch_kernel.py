"""Microbench the xch kernels in isolation on synthetic streams.

Sweeps the window size m and step T for each kernel on a fixed slot count,
printing ns/slot — the real cost surface the planner constants must match.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


DEADLINE = time.time() + float(os.environ.get("PROBE_BUDGET_S", "1500"))


def main():
    import jax
    import jax.numpy as jnp

    from singlespmv_tpu.ops.pallas.xch import xch_mul, xch_route

    # canary: verify the tunnel readback path is alive before real work
    t0 = time.time()
    float(np.asarray(jnp.ones((8,)))[0])
    log(f"canary readback ok in {time.time() - t0:.1f}s")

    H = 32 * 1024               # stream rows -> 4.2 M slots
    CB = 8192                   # x table 4 MB
    rng = np.random.default_rng(0)

    def sync(x):
        return float(jax.device_get(jax.numpy.ravel(x)[0]))

    def bench2(fn, args, n_slots, perturb_idx, loop=64):
        """Chained ON-DEVICE loop (lax.fori_loop, out[0]-perturbed input so
        XLA cannot hoist), marginal-difference timing — a host loop with a
        readback per call measures the ~25 ms tunnel RPC, not the kernel."""

        def run_n(a, n):
            def body(i, a):
                out = fn(*a)
                s = jnp.ravel(out)[0] * jnp.asarray(1e-38, out.dtype)
                a = list(a)
                a[perturb_idx] = a[perturb_idx] + s.astype(
                    a[perturb_idx].dtype)
                return tuple(a)

            return jax.lax.fori_loop(0, n, body, tuple(a))[perturb_idx]

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

    log("=== xch_mul: ns/slot vs (m, T) ===")
    for T in (32, 64, 128):
        for m in (1, 2, 4, 8, 16, 32):
            if time.time() > DEADLINE:
                log("budget exhausted; exiting gracefully")
                return
            win = rng.integers(0, CB - m, H).astype(np.int32)
            lane = rng.integers(0, 128, (H, 128)).astype(np.int8)
            sub = rng.integers(0, m, (H, 128)).astype(np.int8)
            val = rng.uniform(-1, 1, (H, 128)).astype(np.float32)
            xt = rng.uniform(-1, 1, (CB, 128)).astype(np.float32)
            args = [jnp.asarray(a) for a in (win, lane, sub, val, xt)]
            ns = bench2(lambda w, l, s, v, x: xch_mul(w, l, s, v, x, m, T),
                        args, H * 128, perturb_idx=3)
            log(f"mul  T={T:3d} m={m:3d}: {ns:.4f} ns/slot")

    log("=== xch_route: ns/slot vs (m, planes, T) ===")
    NC, P1 = 8, 4096
    for T in (32, 64):
        for planes in (8, 16):
            for m in (1, 4, 8, 16, 32):
                if time.time() > DEADLINE:
                    log("budget exhausted; exiting gracefully")
                    return
                n_steps = H // T
                nb = max(n_steps // 8, 1)       # 8 steps per bucket
                uids = np.repeat(np.arange(nb), 8)[:n_steps].astype(np.int32)
                uids = np.sort(uids)
                cs = rng.integers(0, NC, nb)[uids].astype(np.int32)
                win = rng.integers(0, P1 - m, H).astype(np.int32)
                lane = rng.integers(0, 128, (H, 128)).astype(np.int8)
                sub = rng.integers(0, m, (H, 128)).astype(np.int8)
                # worst case: every slot its own run end (hyper-sparse)
                hm1 = np.broadcast_to(
                    np.arange(-1, 127, dtype=np.int8), (H, 128)).copy()
                sig = (np.arange(128)[None, :] + np.arange(H)[:, None]) \
                    % planes
                idx = np.full((planes, H, 128), -1, np.int8)
                hh = np.repeat(np.arange(H), 128)
                ll = np.tile(np.arange(128), H)
                idx[sig.reshape(-1), hh, ll] = ll.astype(np.int8)
                prod = rng.uniform(-1, 1, (NC, P1, 128)).astype(np.float32)
                args = [jnp.asarray(a) for a in
                        (uids, cs, win, lane, sub, hm1, idx, prod)]
                ns = bench2(
                    lambda u, c, w, l, s, h, i, p, nb=nb, m=m, pp=planes,
                    T=T: xch_route(u, c, w, l, s, h, i, p, nb, m, pp, T),
                    args, H * 128, perturb_idx=7)
                log(f"route T={T:3d} planes={planes:2d} m={m:3d}: "
                    f"{ns:.4f} ns/slot")


if __name__ == "__main__":
    main()
