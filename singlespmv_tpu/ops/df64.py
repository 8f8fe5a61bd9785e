"""Double-float (df64 = 2×f32) arithmetic for f64-semantics SpMV on TPU.

Every kernel in the reference is double precision (/root/reference/src/util.h:7-39,
FLOPs = 2·nnz f64 at src/main.cpp:196), but Mosaic has no f64 and XLA's emulated
f64 gathers run at ~0.02 GFLOPS through the csr/ss fallback.  This module gives
the fast paths real f64 *semantics* on f32 hardware: a value is an unevaluated
pair (hi, lo) with |lo| ≤ ulp(hi)/2, giving ~2⁻⁴⁸ relative precision — far
inside the harness's 1e-6 abs-or-rel verify bar (src/util.cpp:74-77 parity).

The primitives need only round-to-nearest f32 mul/add (no FMA): Dekker's
split/two-product and Knuth's branch-free two-sum [Dekker 1971; Shewchuk 1997].
All functions are plain jnp expressions, usable inside Pallas kernels and in
XLA alike.  "Sloppy" variants skip renormalisation: lo may grow to O(W·eps·hi)
across a W-step accumulation, a ~3e-5 relative bound on the *correction* term —
error after the final renormalise stays O(eps²·W), orders below the bar.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SPLITTER = 4097.0  # 2^12 + 1 splits f32 (24-bit mantissa) into 12+12 bits


def split(a):
    """Dekker split: a == hi + lo with hi/lo having ≤ 12 mantissa bits each."""
    c = a * jnp.asarray(_SPLITTER, a.dtype)
    hi = c - (c - a)
    return hi, a - hi


def two_sum(a, b):
    """Knuth branch-free exact addition: a + b == s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def two_prod(a, b):
    """Dekker exact product: a * b == p + e exactly (no FMA needed)."""
    p = a * b
    ahi, alo = split(a)
    bhi, blo = split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def df_add_sloppy(ahi, alo, bhi, blo):
    """(a + b) without renormalisation — lo absorbs the hi-sum error."""
    s, e = two_sum(ahi, bhi)
    return s, e + alo + blo


def df_renorm(hi, lo):
    """Re-establish |lo| ≤ ulp(hi)/2 (one quick two-sum; |hi| ≥ |lo| holds)."""
    s = hi + lo
    return s, lo - (s - hi)


def df_mul(ahi, alo, bhi, blo):
    """(a · b) to df64 precision: exact hi product + first-order cross terms."""
    p, e = two_prod(ahi, bhi)
    return p, e + (ahi * blo + alo * bhi)


def df_from_f64(a: np.ndarray):
    """Host split of f64 into (hi, lo) f32 planes (lossy only below 2⁻⁴⁸ rel)."""
    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_split_device(x):
    """Device split of an f64 array into (hi, lo) f32 planes (XLA, elementwise)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def df_to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)
