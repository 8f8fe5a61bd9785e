"""Matrix generators.

Reproduces the *distributions* of the reference's two generator CLIs:

- test generator (/root/reference/matrix/test/generator.cpp:13-67): band (dense band
  |i-j| < width), dense, unbalance (first √N rows dense), random_unbalance (N random
  rows made dense, duplicates possible), random (cnt unique uniform positions);
  values uniform(0,1).
- artificial generator (/root/reference/matrix/artificial/generator.cpp:12-63):
  val=1.0 everywhere, default nnz = N·√N; **band rejects |r-c| < width** (off-band
  random — sic, that is what the reference measures as "band-N"), unbalance = first
  ceil(nnz/N) rows dense, random_unbalance = √N random rows dense, random = unique
  uniform positions.

All generation is vectorized numpy with an explicit seed (the reference seeds with
time(NULL); we default to a fixed seed for reproducible benchmarking).
"""
from __future__ import annotations

import math

import numpy as np

from ..core.types import COOMatrix


def _unique_random_positions(rng, n: int, cnt: int, reject=None) -> np.ndarray:
    """cnt unique (r, c) uniform positions in [0,n)². reject: optional mask fn."""
    assert n * n >= cnt, "too many cnt"
    keys = np.empty(0, dtype=np.int64)
    while keys.size < cnt:
        need = int((cnt - keys.size) * 1.3) + 16
        r = rng.integers(0, n, size=need, dtype=np.int64)
        c = rng.integers(0, n, size=need, dtype=np.int64)
        if reject is not None:
            keep = ~reject(r, c)
            r, c = r[keep], c[keep]
        keys = np.unique(np.concatenate([keys, r * n + c]))
    # np.unique sorts; subsample deterministically to exactly cnt
    if keys.size > cnt:
        keys = rng.permutation(keys)[:cnt]
    rr, cc = keys // n, keys % n
    return np.stack([rr, cc], axis=1)


def _vals(rng, k: int, artificial: bool) -> np.ndarray:
    return np.ones(k) if artificial else rng.uniform(0.0, 1.0, size=k)


def generate(kind: str, n: int, param: int | None = None, *, artificial: bool = False,
             seed: int = 12345) -> COOMatrix:
    """Generate an n×n matrix of the given kind.

    kind ∈ {band, dense, unbalance, random_unbalance, random}.
    ``artificial=True`` switches to the artificial generator's semantics
    (val=1.0, default param = n·√n, off-band 'band').
    """
    rng = np.random.default_rng(seed)
    if param is None:
        param = int(n * math.sqrt(n)) if artificial else 10

    if kind == "dense":
        rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        pos = np.stack([rr.ravel(), cc.ravel()], axis=1)
    elif kind == "band":
        if artificial:
            width = max(1, param // n)
            pos = _unique_random_positions(
                rng, n, param, reject=lambda r, c: np.abs(r - c) < width
            )
        else:
            # Build per-diagonal (O(n·width)) — a full meshgrid is O(n²) memory.
            rs, cs = [], []
            for off in range(-(param - 1), param):
                r = np.arange(max(0, -off), min(n, n - off))
                rs.append(r)
                cs.append(r + off)
            pos = np.stack([np.concatenate(rs), np.concatenate(cs)], axis=1)
    elif kind == "unbalance":
        if artificial:
            h = -(-param // n)
            rr = np.repeat(np.arange(h), n)[:param]
            cc = np.tile(np.arange(n), h)[:param]
        else:
            h = int(math.sqrt(n))
            rr = np.repeat(np.arange(h), n)
            cc = np.tile(np.arange(n), h)
        pos = np.stack([rr, cc], axis=1)
    elif kind == "random_unbalance":
        k = int(math.sqrt(n)) if artificial else n
        rows = rng.integers(0, n, size=k)
        rr = np.repeat(rows, n)
        cc = np.tile(np.arange(n), k)
        pos = np.stack([rr, cc], axis=1)
    elif kind == "random":
        pos = _unique_random_positions(rng, n, param)
    else:
        raise ValueError(f"unknown generator kind {kind!r}")

    vals = _vals(rng, pos.shape[0], artificial)
    # test-generator 'random_unbalance' can produce duplicate rows → duplicate
    # positions; keep them (the reference keeps them too) — formats must cope.
    return COOMatrix.from_triplets(n, n, pos[:, 0], pos[:, 1], vals)


ARTIFICIAL_SIZES = (512, 1024, 2048, 4096, 8192, 16384, 32768)  # gen.sh sizes
ARTIFICIAL_DENSE_SIZES = (512, 1024, 2048, 4096)


def artificial_suite(sizes=None, kinds=("band", "unbalance", "random"),
                     dense_sizes=None, seed: int = 12345):
    """Yield (name, COOMatrix) pairs matching matrix/artificial/gen.sh."""
    sizes = ARTIFICIAL_SIZES if sizes is None else sizes
    dense_sizes = ARTIFICIAL_DENSE_SIZES if dense_sizes is None else dense_sizes
    for kind in kinds:
        for n in sizes:
            yield f"{kind}-{n}", generate(kind, n, artificial=True, seed=seed)
    for n in dense_sizes:
        yield f"dense-{n}", generate("dense", n, artificial=True, seed=seed)


def powerlaw(n: int, nnz: int, *, alpha: float = 1.2, seed: int = 12345) -> COOMatrix:
    """Power-law row-degree matrix (SuiteSparse-circuit-like irregularity).

    Stand-in for the natural suite (download needs network; see
    singlespmv_tpu.data.suitesparse) to exercise the load-balancing formats the way
    BASELINE.json's 'power-law natural matrices' config intends.
    """
    rng = np.random.default_rng(seed)
    w = (np.arange(1, n + 1, dtype=np.float64)) ** (-alpha)
    w /= w.sum()
    rows = rng.choice(n, size=nnz, p=w)
    cols = rng.integers(0, n, size=nnz)
    vals = rng.uniform(0.0, 1.0, size=nnz)
    return COOMatrix.from_triplets(n, n, rows, cols, vals, sum_duplicates=True)
