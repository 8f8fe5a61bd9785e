"""On-chip calibration of the planner cost-model constants.

Measures the rates the format planners price with (core/chipconst keys) on
the attached device and writes ``results/chip_constants.json`` — closing the
r3 loop where ``harness/microbench.py`` measured the same quantities but
nothing recalibrated (VERDICT r3 "what's weak" #7).

Fit strategy (xch_mul/xch_route are the shared slab-family building blocks):
  t(T, m) = (H/T)·step_fixed + H·128·(base + m·sel [+ planes·route])
  - step_fixed from the T=32 vs T=128 delta at m=1;
  - sel from the m=8 vs m=1 delta at T=128;
  - route from the planes=16 vs planes=8 delta;
  - hbm_bps from a big-array reduction; scatter_rate from segment_sum.

Run: ``python -m singlespmv_tpu calibrate`` (or harness.calibrate.main()).
"""
from __future__ import annotations

import sys
import time
from typing import Dict

import numpy as np

from ..core import chipconst


def _sync(x):
    import jax

    return float(jax.device_get(jax.numpy.ravel(x)[0]))


def _bench(fn, args, loop=16):
    """Dispatch-corrected seconds per call: time(loop) − time(loop/2)."""
    import jax

    fn_j = jax.jit(fn)
    _sync(fn_j(*args))
    t0 = time.time()
    for _ in range(loop // 2):
        _sync(fn_j(*args))
    t1 = time.time()
    for _ in range(loop):
        _sync(fn_j(*args))
    t2 = time.time()
    d = (t2 - t1) - (t1 - t0)
    return max(d / (loop - loop // 2), 1e-9)


def _mul_args(rng, H, CB, m):
    import jax.numpy as jnp

    win = rng.integers(0, CB - m, H).astype(np.int32)
    lane = rng.integers(0, 128, (H, 128)).astype(np.int8)
    sub = rng.integers(0, m, (H, 128)).astype(np.int8)
    val = rng.uniform(-1, 1, (H, 128)).astype(np.float32)
    xt = rng.uniform(-1, 1, (CB, 128)).astype(np.float32)
    return [jnp.asarray(a) for a in (win, lane, sub, val, xt)]


def _route_args(rng, H, planes, m, T, NC=4, P1=2048):
    import jax.numpy as jnp

    n_steps = H // T
    nb = max(n_steps // 8, 1)
    uids = np.sort(np.repeat(np.arange(nb), 8)[:n_steps]).astype(np.int32)
    cs = rng.integers(0, NC, nb)[uids].astype(np.int32)
    win = rng.integers(0, P1 - m, H).astype(np.int32)
    lane = rng.integers(0, 128, (H, 128)).astype(np.int8)
    sub = rng.integers(0, m, (H, 128)).astype(np.int8)
    hm1 = np.broadcast_to(np.arange(-1, 127, dtype=np.int8), (H, 128)).copy()
    sig = (np.arange(128)[None, :] + np.arange(H)[:, None]) % planes
    idx = np.full((planes, H, 128), -1, np.int8)
    hh = np.repeat(np.arange(H), 128)
    ll = np.tile(np.arange(128), H)
    idx[sig.reshape(-1), hh, ll] = ll.astype(np.int8)
    prod = rng.uniform(-1, 1, (NC, P1, 128)).astype(np.float32)
    gids = (uids // 16).astype(np.int32)
    sg0 = np.zeros(n_steps, np.int32)
    sg1 = np.full(n_steps, planes - 1, np.int32)   # all planes active
    args = [jnp.asarray(a) for a in (uids, gids, cs, sg0, sg1, win, lane,
                                     sub, hm1, idx, prod)]
    return args, int(gids[-1]) + 1


def measure(log=lambda m: print(m, file=sys.stderr)) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from ..ops.pallas.xch import xch_mul, xch_route

    rng = np.random.default_rng(0)
    out: Dict[str, float] = {}

    # --- streamed bandwidth ---
    big = jnp.asarray(rng.uniform(-1, 1, (64 << 20,)).astype(np.float32))
    sec = _bench(lambda a: jnp.sum(a), [big], loop=8)
    out["hbm_bps"] = float(big.nbytes / sec)
    log(f"hbm_bps            = {out['hbm_bps'] / 1e9:.0f} GB/s")

    # --- slab-family kernel constants ---
    H = 16 * 1024
    CB = 4096
    t_32_1 = _bench(lambda *a: xch_mul(*a, 1, 32), _mul_args(rng, H, CB, 1))
    t_128_1 = _bench(lambda *a: xch_mul(*a, 1, 128), _mul_args(rng, H, CB, 1))
    t_128_8 = _bench(lambda *a: xch_mul(*a, 8, 128), _mul_args(rng, H, CB, 8))
    fixed = max(t_32_1 - t_128_1, 0.0) / (H / 32 - H / 128)
    sel = max(t_128_8 - t_128_1, 0.0) / (H * 128 * 7)
    base = max(t_128_1 - (H / 128) * fixed, 0.0) / (H * 128)
    out["step_fixed_s"] = float(fixed)
    out["sel_slot_s"] = float(sel)
    out["base_slot_s"] = float(base)
    log(f"step_fixed_s       = {fixed * 1e6:.3f} us")
    log(f"base_slot_s        = {base * 1e9:.4f} ns")
    log(f"sel_slot_s         = {sel * 1e9:.4f} ns/member")

    a8, nb8 = _route_args(rng, H, 8, 1, 64)
    a16, nb16 = _route_args(rng, H, 16, 1, 64)
    t_r8 = _bench(lambda *a: xch_route(*a, nb8, 1, 8, 64), a8)
    t_r16 = _bench(lambda *a: xch_route(*a, nb16, 1, 16, 64), a16)
    route = max(t_r16 - t_r8, 0.0) / (H * 128 * 8)
    out["route_slot_s"] = float(route)
    log(f"route_slot_s       = {route * 1e9:.4f} ns/plane")

    # --- XLA scatter (segment_sum) rate ---
    n = 2 << 20
    vals = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    segs = jnp.asarray(rng.integers(0, n // 4, n).astype(np.int32))
    sec = _bench(lambda v, s: jax.ops.segment_sum(v, s, num_segments=n // 4),
                 [vals, segs], loop=8)
    out["scatter_rate"] = float(n / sec)
    log(f"scatter_rate       = {out['scatter_rate'] / 1e9:.3f} G elem/s")

    return out


def main():
    vals = measure()
    p = chipconst.save(vals)
    print(f"wrote {p}")
    print(vals)


if __name__ == "__main__":
    main()
