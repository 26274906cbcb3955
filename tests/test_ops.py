"""Unit tests for the ops layer against brute-force numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kd_pointcloud_tpu import ops


def np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


def np_fps(xyz, m):
    """Oracle mirroring sampling_gpu.cu:93-209: seed 0, argmax of running
    min-distance."""
    B, N, _ = xyz.shape
    out = np.zeros((B, m), dtype=np.int64)
    for b in range(B):
        temp = np.full(N, 1e10)
        last = 0
        for j in range(1, m):
            d = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
            temp = np.minimum(temp, d)
            last = int(np.argmax(temp))
            out[b, j] = last
    return out


class TestSquareDistance:
    def test_matches_numpy(self, rng):
        src = rng.randn(2, 17, 3).astype(np.float32)
        dst = rng.randn(2, 29, 3).astype(np.float32)
        got = np.asarray(ops.square_distance(src, dst))
        np.testing.assert_allclose(got, np_square_distance(src, dst),
                                   rtol=1e-4, atol=1e-4)


class TestKnn:
    @pytest.mark.parametrize("chunk", [None, 16])
    def test_matches_bruteforce(self, rng, chunk):
        xyz = rng.randn(2, 64, 3).astype(np.float32)
        q = rng.randn(2, 32, 3).astype(np.float32)
        k = 5
        idx = np.asarray(ops.knn_point(k, xyz, q, chunk=chunk))
        d = np_square_distance(q, xyz)
        want = np.argsort(d, axis=-1)[..., :k]
        # unsorted contract: compare as sets per query
        assert (np.sort(idx, -1) == np.sort(want, -1)).all()

    def test_dist_values(self, rng):
        xyz = rng.randn(1, 40, 3).astype(np.float32)
        q = rng.randn(1, 10, 3).astype(np.float32)
        d2, idx = ops.knn_point_dist(4, xyz, q)
        d_full = np_square_distance(q, xyz)
        want = np.take_along_axis(d_full, np.asarray(idx), axis=-1)
        np.testing.assert_allclose(np.asarray(d2), want, rtol=1e-4, atol=1e-4)


class TestFps:
    def test_matches_oracle(self, rng):
        xyz = rng.randn(3, 50, 3).astype(np.float32)
        got = np.asarray(ops.furthest_point_sample(xyz, 12))
        want = np_fps(xyz, 12)
        np.testing.assert_array_equal(got, want)

    def test_seed_zero_and_unique(self, rng):
        xyz = rng.randn(2, 100, 3).astype(np.float32)
        idx = np.asarray(ops.furthest_point_sample(xyz, 32))
        assert (idx[:, 0] == 0).all()
        for b in range(2):
            assert len(set(idx[b].tolist())) == 32  # no duplicates

    def test_nested_prefix_property(self, rng):
        """Greedy FPS orderings are nested: a per-level FPS run over an
        FPS-ordered array selects exactly its leading rows, in order — the
        invariant the model's nested_fps prefix sampling relies on
        (nn/pointconv.py _fps_or_prefix)."""
        xyz = rng.randn(2, 512, 3).astype(np.float32) * 10
        l1 = np.asarray(ops.gather_points(
            xyz, ops.furthest_point_sample(xyz, 128)))
        idx2 = np.asarray(ops.furthest_point_sample(l1, 48))
        np.testing.assert_array_equal(
            idx2, np.broadcast_to(np.arange(48, dtype=np.int32), (2, 48)))
        l2 = np.asarray(ops.gather_points(l1, idx2))
        idx3 = np.asarray(ops.furthest_point_sample(l2, 16))
        np.testing.assert_array_equal(
            idx3, np.broadcast_to(np.arange(16, dtype=np.int32), (2, 16)))

    @pytest.mark.parametrize("payload", [False, True])
    @pytest.mark.parametrize("B,N,npoint", [(1, 1024, 256), (2, 2048, 512),
                                            (3, 192, 48)])
    def test_pallas_kernel_interpret_bit_exact(self, rng, B, N, npoint,
                                               payload):
        """The Pallas FPS kernel (both the folded strided layout at
        N % 1024 == 0 and the plain (B, N) layout) matches the numpy oracle
        bit-exactly in interpret mode — pins the lexicographic pair-fold
        argmax/tie-break chain off-TPU (on-chip exactness is selftest
        fps_exact)."""
        from kd_pointcloud_tpu.ops.pallas.fps_pallas import \
            furthest_point_sample_pallas

        xyz = rng.randn(B, N, 3).astype(np.float32) * 10
        got = np.asarray(furthest_point_sample_pallas(
            jnp.asarray(xyz), npoint, interpret=True, payload=payload))
        np.testing.assert_array_equal(got, np_fps(xyz, npoint))

    def test_blocked_matches_per_block_exact(self, rng):
        """furthest_point_sample_blocked = exact FPS per contiguous block,
        orderings interleaved (the serving-preset FPS relaxation)."""
        from kd_pointcloud_tpu.ops.fps import furthest_point_sample_blocked

        xyz = rng.randn(2, 64, 3).astype(np.float32) * 5
        got = np.asarray(furthest_point_sample_blocked(xyz, 16, 4))
        per_block = np.stack([np_fps(xyz[:, b * 16:(b + 1) * 16], 4) + b * 16
                              for b in range(4)], axis=1)   # (B, 4, 4)
        want = np.swapaxes(per_block, 1, 2).reshape(2, 16)  # interleaved
        np.testing.assert_array_equal(got, want)
        # block-balanced prefix: the first `blocks` entries hit every block
        assert ({int(i) // 16 for i in got[0, :4]} == {0, 1, 2, 3})

    def test_blocked_falls_back_to_exact(self, rng):
        from kd_pointcloud_tpu.ops.fps import furthest_point_sample_blocked

        xyz = rng.randn(2, 62, 3).astype(np.float32)  # 62 % 4 != 0
        got = np.asarray(furthest_point_sample_blocked(xyz, 16, 4))
        np.testing.assert_array_equal(
            got, np.asarray(ops.furthest_point_sample(xyz, 16)))

    @pytest.mark.parametrize("restrict_scan", [True, False])
    def test_pruned_kernel_bit_exact(self, rng, restrict_scan):
        """The retired pruned FPS kernel (attic/fps_pruned.py — measured
        ~2x slower on-chip, kept as a documented negative result) selects
        the BIT-IDENTICAL index sequence as reference-semantics FPS:
        pruning only skips provably no-op min-updates and the
        argmax/tie-break machinery rides cached per-sub-block maxima + the
        original-index plane. Interpret mode exercises the full kernel
        logic on CPU; this pin keeps the attic ledger honest."""
        from attic.fps_pruned import furthest_point_sample_pruned

        for B, N, npoint in [(1, 2048, 192), (2, 1024, 160)]:
            # clustered clouds so windows actually prune (uniform noise
            # keeps everything dirty and skips the pruned code path)
            cent = rng.randn(B, 16, 1, 3) * 20
            xyz = (cent + rng.randn(B, 16, N // 16, 3)).reshape(
                B, N, 3).astype(np.float32)
            got = np.asarray(furthest_point_sample_pruned(
                jnp.asarray(xyz), npoint, interpret=True,
                restrict_scan=restrict_scan))
            np.testing.assert_array_equal(got, np_fps(xyz, npoint))

    def test_backend_dispatch_off_tpu(self, rng):
        """Off-TPU every backend routes to the XLA loop (identical indices
        by construction — the Mosaic kernels are TPU-only), so any
        fps_backend choice stays runnable in CPU tests."""
        xyz = rng.randn(2, 96, 3).astype(np.float32)
        want = np.asarray(ops.furthest_point_sample(xyz, 24))
        for be in ("auto", "pallas", "xla"):
            np.testing.assert_array_equal(
                np.asarray(ops.furthest_point_sample(xyz, 24, backend=be)),
                want)


class TestGather:
    def test_gather_points(self, rng):
        pts = rng.randn(2, 20, 7).astype(np.float32)
        idx = rng.randint(0, 20, size=(2, 6))
        got = np.asarray(ops.gather_points(pts, idx))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group_points(self, rng):
        pts = rng.randn(2, 20, 5).astype(np.float32)
        idx = rng.randint(0, 20, size=(2, 6, 4))
        got = np.asarray(ops.group_points(pts, idx))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_gather_grad_is_scatter_add(self, rng):
        """Backward of gather = deterministic segment-sum (SURVEY.md §5)."""
        pts = jnp.asarray(rng.randn(1, 8, 2).astype(np.float32))
        idx = jnp.asarray([[1, 1, 3]])  # duplicate index → grads must add
        g = jax.grad(lambda p: ops.gather_points(p, idx).sum())(pts)
        want = np.zeros((1, 8, 2), np.float32)
        want[0, 1] = 2.0
        want[0, 3] = 1.0
        np.testing.assert_array_equal(np.asarray(g), want)


class TestInterpolate:
    def test_three_nn(self, rng):
        q = rng.randn(1, 10, 3).astype(np.float32)
        ref = rng.randn(1, 30, 3).astype(np.float32)
        dist, idx = ops.three_nn(q, ref)
        d_full = np.sqrt(np_square_distance(q, ref))
        want_idx = np.argsort(d_full, -1)[..., :3]
        assert (np.sort(np.asarray(idx), -1) == np.sort(want_idx, -1)).all()
        want_d = np.take_along_axis(d_full, np.asarray(idx), -1)
        np.testing.assert_allclose(np.asarray(dist), want_d, rtol=1e-4, atol=1e-5)

    def test_upsample_idw_exact_at_source(self, rng):
        """Interpolating a field back onto its own support is identity
        (1/dist weighting degenerates to the nearest point)."""
        xyz = rng.randn(1, 16, 3).astype(np.float32)
        feat = rng.randn(1, 16, 4).astype(np.float32)
        got = np.asarray(ops.upsample_idw(xyz, xyz, feat))
        np.testing.assert_allclose(got, feat, rtol=1e-3, atol=1e-3)

    def test_upsample_idw_weights(self, rng):
        dense = rng.randn(1, 12, 3).astype(np.float32)
        sparse = rng.randn(1, 5, 3).astype(np.float32)
        feat = rng.randn(1, 5, 2).astype(np.float32)
        got = np.asarray(ops.upsample_idw(dense, sparse, feat))
        # numpy oracle
        d = np.sqrt(np_square_distance(dense, sparse))[0]
        idx = np.argsort(d, -1)[:, :3]
        dd = np.maximum(np.take_along_axis(d, idx, -1), 1e-10)
        w = (1 / dd) / (1 / dd).sum(-1, keepdims=True)
        want = (w[..., None] * feat[0][idx]).sum(1)
        np.testing.assert_allclose(got[0], want, rtol=1e-3, atol=1e-4)


class TestWarp:
    def test_zero_flow_identity(self, rng):
        pc1 = rng.randn(1, 20, 3).astype(np.float32)
        pc2 = rng.randn(1, 20, 3).astype(np.float32)
        got = np.asarray(ops.point_warp(pc1, pc2, np.zeros_like(pc1)))
        np.testing.assert_allclose(got, pc2, atol=1e-6)

    def test_none_flow_passthrough(self, rng):
        pc1 = rng.randn(1, 20, 3).astype(np.float32)
        pc2 = rng.randn(1, 20, 3).astype(np.float32)
        got = np.asarray(ops.point_warp(pc1, pc2, None))
        np.testing.assert_array_equal(got, pc2)

    def test_constant_flow_inverts(self, rng):
        """With pc2 = pc1 + c and flow1 = c the warp recovers pc1."""
        pc1 = rng.randn(1, 30, 3).astype(np.float32)
        c = np.float32([0.3, -0.2, 0.1])
        pc2 = pc1 + c
        got = np.asarray(ops.point_warp(pc1, pc2, np.broadcast_to(c, pc1.shape)))
        np.testing.assert_allclose(got, pc1, rtol=1e-4, atol=1e-4)


class TestBallQuery:
    def test_semantics(self, rng):
        xyz = rng.randn(1, 50, 3).astype(np.float32)
        q = rng.randn(1, 8, 3).astype(np.float32)
        r, k = 0.9, 6
        idx = np.asarray(ops.ball_query(r, k, xyz, q))
        d = np_square_distance(q, xyz)[0]
        for s in range(8):
            hits = np.where(d[s] < r * r)[0]
            if len(hits) == 0:
                assert (idx[0, s] == 0).all()
            else:
                want = hits[:k]
                # padding with first hit
                want = np.concatenate([want, np.full(k - len(want), hits[0])])
                np.testing.assert_array_equal(idx[0, s], want)


