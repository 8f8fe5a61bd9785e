"""Unit tests for the Pallas kernel building blocks (interpret mode on CPU).

The reference's analog is test/ — standalone probes of SIMD/OpenMP semantics
(SURVEY §2.5); here each kernel primitive is checked against a numpy oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def np_segscan(v, heads):
    out = np.zeros_like(v)
    for i in range(v.shape[0]):
        acc = 0.0
        for j in range(v.shape[1]):
            acc = v[i, j] if heads[i, j] else acc + v[i, j]
            out[i, j] = acc
    return out


class TestSegscanKernel:
    @pytest.mark.parametrize("shape", [(8, 128), (16, 256), (24, 512)])
    def test_matches_oracle(self, shape):
        from singlespmv_tpu.ops.pallas.segscan import segmented_scan_tiles

        rng = np.random.default_rng(0)
        v = rng.uniform(-1, 1, size=shape)
        heads = rng.uniform(size=shape) < 0.2
        heads[:, 0] = True
        got = np.asarray(segmented_scan_tiles(jnp.asarray(v),
                                              jnp.asarray(heads)))
        np.testing.assert_allclose(got, np_segscan(v, heads), rtol=1e-12)


class TestBlockGatherScan:
    def test_matches_oracle(self):
        from singlespmv_tpu.ops.pallas.blockgather import block_gather_scan

        rng = np.random.default_rng(1)
        h, w, b = 16, 256, 4
        x = rng.uniform(size=(b, 128))
        # each (8, w) tile reads one x block
        tile_bids = rng.integers(0, b, size=h // 8).astype(np.int32)
        lanes = rng.integers(0, 128, size=(h, w))
        col = lanes + 128 * np.repeat(tile_bids.astype(np.int64), 8)[:, None]
        val = rng.uniform(-1, 1, size=(h, w))
        heads = rng.uniform(size=(h, w)) < 0.3
        heads[:, 0] = True
        got = np.asarray(block_gather_scan(
            jnp.asarray(tile_bids), jnp.asarray(col.astype(np.int32)),
            jnp.asarray(val), jnp.asarray(heads.astype(np.int32)),
            jnp.asarray(x)))
        prod = val * x.reshape(-1)[col]
        np.testing.assert_allclose(got, np_segscan(prod, heads), rtol=1e-12)


class TestBucketKernels:
    def test_block_gather_mul(self):
        from singlespmv_tpu.ops.pallas.bucket import block_gather_mul

        rng = np.random.default_rng(2)
        h, w, b = 16, 256, 4
        x = rng.uniform(size=(b, 128))
        # one col-block per (w-slot) sublane row
        row_cbs = rng.integers(0, b, size=h).astype(np.int32)
        lanes = rng.integers(0, 128, size=(h, w))
        col = lanes + 128 * row_cbs.astype(np.int64)[:, None]
        val = rng.uniform(-1, 1, size=(h, w))
        src = np.zeros((h, w), np.int8)
        got = np.asarray(block_gather_mul(
            jnp.asarray(row_cbs), jnp.asarray(lanes.astype(np.int8)),
            jnp.asarray(src), jnp.asarray(val), jnp.asarray(x)))
        np.testing.assert_allclose(got, val * x.reshape(-1)[col], rtol=1e-12)

    def test_block_gather_mul_grouped(self):
        """m-way member select: each slot gathers from its member's x row."""
        from singlespmv_tpu.ops.pallas.bucket import block_gather_mul

        rng = np.random.default_rng(12)
        h, w, b, m = 16, 256, 8, 4
        x = rng.uniform(size=(b, 128))
        members = rng.integers(0, b, size=(h, m)).astype(np.int32)
        lanes = rng.integers(0, 128, size=(h, w))
        src = rng.integers(0, m, size=(h, w)).astype(np.int8)
        col = (lanes
               + 128 * np.take_along_axis(
                   members.astype(np.int64), src.astype(np.int64), axis=1))
        val = rng.uniform(-1, 1, size=(h, w))
        got = np.asarray(block_gather_mul(
            jnp.asarray(members.reshape(-1)),
            jnp.asarray(lanes.astype(np.int8)), jnp.asarray(src),
            jnp.asarray(val), jnp.asarray(x), m))
        np.testing.assert_allclose(got, val * x.reshape(-1)[col], rtol=1e-12)

    def test_lane_unpermute(self):
        from singlespmv_tpu.ops.pallas.bucket import lane_unpermute

        rng = np.random.default_rng(3)
        rbu = 256
        y = rng.uniform(size=(128, rbu))
        perm = np.stack([rng.permutation(rbu) for _ in range(128)])
        src_lane = (perm % 128).astype(np.int32)
        src_chunk = (perm // 128).astype(np.int32)
        got = np.asarray(lane_unpermute(jnp.asarray(y),
                                        jnp.asarray(src_lane),
                                        jnp.asarray(src_chunk)))
        want = np.take_along_axis(y, perm, axis=1)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_bucket_reduce(self):
        from singlespmv_tpu.ops.pallas.bucket import bucket_reduce

        rng = np.random.default_rng(4)
        rb_pad, g, k = 8, 2, 2
        rows = rb_pad * g
        prod = rng.uniform(-1, 1, size=(rows, 128))
        # every slot its own run: head at every lane -> hm1[l] = l - 1
        hm1 = np.broadcast_to(np.arange(-1, 127, dtype=np.int8),
                              (rows, 128)).copy()
        # route slot (r, l) to bin l (identity), pass 0 only
        idx = np.full((k * rows, 128), -1, dtype=np.int8)
        idx[:rows] = np.arange(128, dtype=np.int8)[None, :]
        got = np.asarray(bucket_reduce(jnp.asarray(prod), jnp.asarray(hm1),
                                       jnp.asarray(idx), rb_pad))
        # j-major interleave: slab s's sublanes are rows s, s+8, ... s+8(g-1)
        want = np.zeros((rb_pad, 128))
        for s in range(rb_pad):
            want[s] = prod[s::8].sum(axis=0)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_run_totals_vs_segscan(self):
        """MXU prefix-sum run totals must match the scan-based definition at
        run ends (runs = maximal same-head segments)."""
        from singlespmv_tpu.ops.pallas.bucket import _run_totals

        rng = np.random.default_rng(7)
        rows = 16
        v = rng.uniform(-1, 1, size=(rows, 128))
        heads = rng.uniform(size=(rows, 128)) < 0.25
        heads[:, 0] = True
        lane = np.arange(128)
        head_lane = np.maximum.accumulate(np.where(heads, lane, -1), axis=1)
        hm1 = (head_lane - 1).astype(np.int8)
        got = np.asarray(_run_totals(jnp.asarray(v), jnp.asarray(hm1)))
        scan = np_segscan(v, heads)
        ends = np.ones_like(heads)
        ends[:, :-1] = heads[:, 1:]
        np.testing.assert_allclose(got[ends.astype(bool)],
                                   scan[ends.astype(bool)], rtol=1e-10)

    @pytest.mark.parametrize("n_chunks", [1, 2])
    def test_bucket_reduce_grouped(self, n_chunks):
        from singlespmv_tpu.ops.pallas.bucket import bucket_reduce_grouped

        rng = np.random.default_rng(5)
        cb, nu = 16, 8              # S = 128 fixed: stream row index = cb
        prod = rng.uniform(-1, 1, size=(cb, nu, 128))
        # every slot its own run: hm1[l] = l - 1
        hm1 = np.broadcast_to(np.arange(-1, 127, dtype=np.int8),
                              (nu, cb, 128)).copy()
        # route slot (row, l) to bin sigma=row%8, lane l  (one pass)
        k = 1
        idx = np.full((nu, k, cb, 128), -1, dtype=np.int16)
        for u in range(nu):
            for r in range(cb):
                idx[u, 0, r] = ((r % 8) * 128
                                + np.arange(128)).astype(np.int16)
        got = np.asarray(bucket_reduce_grouped(
            jnp.asarray(prod), jnp.asarray(hm1), jnp.asarray(idx), nu,
            n_chunks))
        want = np.zeros((nu * 8, 128))
        for u in range(nu):
            for r in range(cb):
                want[u * 8 + r % 8] += prod[r, u, :]
        np.testing.assert_allclose(got, want, rtol=1e-10)
