"""Fused Pallas kNN kernel tests (interpret mode on CPU; the real-hardware
behavior is additionally exercised by the TPU benchmarks and bench.py).

Also documents the Morton-block kNN negative result: a single space-filling
curve window cannot reach the recall bar on real KITTI clouds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attic.morton import knn_block_dist, morton_codes
from kd_pointcloud_tpu.ops.knn import knn_point_dist
from kd_pointcloud_tpu.ops.pallas.knn_fused import knn_fused


def _recall(idx_a, idx_e):
    idx_a, idx_e = np.asarray(idx_a), np.asarray(idx_e)
    B, S, k = idx_e.shape
    hits = sum(
        len(set(idx_a[b, s].tolist()) & set(idx_e[b, s].tolist()))
        for b in range(B) for s in range(S))
    return hits / (B * S * k)


class TestKnnFused:
    @pytest.mark.parametrize("extract", [True, False])
    def test_recall_vs_exact(self, rng, extract):
        q = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32))
        x = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32))
        _, ie = knn_point_dist(8, x, q, method="exact", precision="highest")
        _, ia = knn_fused(q, x, 8, n_groups=256, tq=128, extract=extract,
                          interpret=True)
        # birthday bound: 1 - k(k-1)/(2G) = 0.986 expected
        assert _recall(ia, ie) > 0.97

    def test_metric_scale_coordinates(self, rng):
        """KITTI-scale coordinates (offsets of tens of meters) must not
        break the packed-distance ordering (regression for the precision
        collapse found on hardware)."""
        q = jnp.asarray((rng.randn(1, 256, 3) * 3 +
                         np.array([5.0, 0.0, 20.0])).astype(np.float32))
        x = q + jnp.asarray(rng.randn(1, 256, 3).astype(np.float32)) * 0.05
        _, ie = knn_point_dist(4, x, q, method="exact", precision="highest")
        _, ia = knn_fused(q, x, 4, n_groups=128, tq=128, interpret=True)
        assert _recall(ia, ie) > 0.95

    def test_distances_match_selected(self, rng):
        """Returned d² agree with true distances of the returned indices to
        the packed-mantissa tolerance (13 masked bits at N2=1024 → ~2e-3
        relative)."""
        q = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))
        x = jnp.asarray(rng.randn(1, 1024, 3).astype(np.float32))
        d, idx = knn_fused(q, x, 4, n_groups=256, tq=128, interpret=True)
        gathered = np.asarray(x)[0][np.asarray(idx)[0]]       # (256, 4, 3)
        true_d = ((np.asarray(q)[0][:, None, :] - gathered) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d)[0], true_d,
                                   rtol=3e-3, atol=1e-5)

    def test_batched(self, rng):
        q = jnp.asarray(rng.randn(3, 256, 3).astype(np.float32))
        x = jnp.asarray(rng.randn(3, 1024, 3).astype(np.float32))
        _, ia = knn_fused(q, x, 8, n_groups=256, tq=128, interpret=True)
        # per-batch results must equal the single-batch runs
        for b in range(3):
            _, ib = knn_fused(q[b:b + 1], x[b:b + 1], 8, n_groups=256,
                              tq=128, interpret=True)
            np.testing.assert_array_equal(np.asarray(ia[b]),
                                          np.asarray(ib[0]))

    def test_ff_recall_metric_scale(self, rng):
        """Float-float mode must survive KITTI-scale coordinates — the case
        that collapses a naive single-pass bf16 distance to recall 0.26
        (models/config.py). The 3-way bf16 split keeps the dropped cross
        terms at ~1e-4 absolute, far below real neighbor-distance gaps."""
        q = jnp.asarray((rng.randn(1, 256, 3) * 3 +
                         np.array([5.0, 0.0, 25.0])).astype(np.float32))
        x = q + jnp.asarray(rng.randn(1, 256, 3).astype(np.float32)) * 0.05
        _, ie = knn_point_dist(4, x, q, method="exact", precision="highest")
        _, ia = knn_fused(q, x, 4, n_groups=128, tq=128, interpret=True,
                          mode="ff")
        assert _recall(ia, ie) > 0.95

    def test_ff_split_survives_jit_args(self, rng):
        """The 3-way bf16 split must hold under jit WITH TRACED ARGUMENTS:
        XLA's simplifier elides f32→bf16→f32 convert round-trips on traced
        values, zeroing the residual parts (recall collapsed to 0.15 on
        hardware before _split3 switched to lax.reduce_precision). Guards
        the exact failure mode: mid parts must be nonzero and the three
        parts must reconstruct x to ~1e-7 relative."""
        from kd_pointcloud_tpu.ops.pallas.knn_fused import _split3

        x = jnp.asarray((rng.randn(64) * 20 + 5).astype(np.float32))
        h, m, l = jax.jit(_split3)(x)          # args traced, NOT constants
        assert np.any(np.asarray(m) != 0), \
            "mid split parts all zero — convert chain was elided"
        recon = np.asarray(h) + np.asarray(m) + np.asarray(l)
        np.testing.assert_allclose(recon, np.asarray(x), rtol=1e-7)
        # each part must be exactly bf16-representable
        for part in (h, m):
            p = np.asarray(part)
            np.testing.assert_array_equal(
                p, np.asarray(jnp.asarray(p, jnp.bfloat16).astype(jnp.float32)))

    def test_stage_a_selection_network_g1024(self, rng):
        """The G=1024 extraction path runs the round-4 stage-A network
        (smallest-4-of-8 across the stride-class vregs) before the serial
        min-retire loop. Its output must equal the exact top-k of the FULL
        candidate set whenever no mod-128 lane class holds ≥5 of the top-k
        (expected losses ~7.5e-4 at k=32 — with this fixed seed, zero):
        the stage_a=False kernel is the no-stage-A oracle."""
        q = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))
        x = jnp.asarray(rng.randn(1, 2048, 3).astype(np.float32))
        k = 32
        d, idx = knn_fused(q, x, k, n_groups=1024, tq=128, interpret=True)
        do, io = knn_fused(q, x, k, n_groups=1024, tq=128, interpret=True,
                           stage_a=False)
        assert np.array_equal(np.asarray(idx), np.asarray(io))
        assert np.array_equal(np.asarray(d), np.asarray(do))
        # and the end-to-end recall bar vs the exact path still holds
        _, ie = knn_point_dist(k, x, q, method="exact", precision="highest")
        assert _recall(idx, ie) > 0.97

    @pytest.mark.parametrize("mode", ["mxu", "ff"])
    def test_fuse_min_bit_identity(self, rng, mode):
        """fuse_min (round-5 production default, ops/knn.py:79): the
        (tq, N2) f32 distance block never materializes — each per-G-block
        MXU dot is packed-min'd immediately. The math is a reassociation
        of an order-independent min, so packed outputs must be
        BIT-IDENTICAL to the scratch-buffer path (dist AND idx), exactly
        what scripts/selftest_tpu.py gates on hardware (job 404)."""
        q = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
        x = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32))
        for k, G in ((32, 256), (3, 256), (32, 1024)):
            d0, i0 = knn_fused(q, x, k, n_groups=G, tq=128, interpret=True,
                               mode=mode, fuse_min=False)
            d1, i1 = knn_fused(q, x, k, n_groups=G, tq=128, interpret=True,
                               mode=mode, fuse_min=True)
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
            np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_ff_distance_error_bound(self, rng):
        """ff distances (debiased) track true d² within the documented
        ~1e-3 absolute + mantissa-mask error."""
        q = jnp.asarray((rng.randn(1, 128, 3) * 3 +
                         np.array([5.0, 0.0, 25.0])).astype(np.float32))
        x = jnp.asarray((rng.randn(1, 1024, 3) * 3 +
                         np.array([5.0, 0.0, 25.0])).astype(np.float32))
        d, idx = knn_fused(q, x, 4, n_groups=256, tq=128, interpret=True,
                           mode="ff")
        gathered = np.asarray(x)[0][np.asarray(idx)[0]]
        true_d = ((np.asarray(q)[0][:, None, :] - gathered) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d)[0], true_d,
                                   rtol=3e-2, atol=3e-3)


class TestFusedRouting:
    def test_feature_space_queries_never_fuse(self, monkeypatch):
        """The FG family's feature-space kNN searches with 100+-dim
        'positions' (nn/cross.py _fg_idx_bid); the fused kernel's
        embeddings are built for 3-D coordinates and reshape-crash on
        anything else (caught on hardware: bifeat/fg forwards died once
        the fused path became the TPU default). The router must gate on
        the coordinate dimension, not just sizes."""
        from kd_pointcloud_tpu.ops import knn as knn_mod

        monkeypatch.setattr(knn_mod.jax, "default_backend", lambda: "tpu")
        coords = jnp.zeros((1, 2048, 3))
        feats = jnp.zeros((1, 2048, 494))
        assert knn_mod._use_fused("approx", 16, coords, coords)
        assert not knn_mod._use_fused("approx", 16, feats, feats)


class TestMortonNegativeResult:
    """Morton-window kNN: correct mechanics, insufficient recall — kept as
    documentation of a negative result, NOT production (see attic/morton.py)."""

    def test_codes_monotone_on_axis(self):
        xyz = jnp.asarray(
            np.linspace(0, 1, 64)[None, :, None] * np.ones((1, 64, 3)),
            jnp.float32)
        lo = jnp.min(xyz, 1, keepdims=True)
        hi = jnp.max(xyz, 1, keepdims=True)
        codes = np.asarray(morton_codes(xyz, lo, hi))[0]
        assert (np.diff(codes.astype(np.int64)) >= 0).all()

    def test_recall_moderate_not_production(self, rng):
        q = jnp.asarray(rng.randn(1, 1024, 3).astype(np.float32))
        x = jnp.asarray(rng.randn(1, 1024, 3).astype(np.float32))
        _, ie = knn_point_dist(16, x, q, method="exact", precision="highest")
        _, ia = knn_block_dist(16, x, q, window=256, block=128)
        r = _recall(ia, ie)
        # sane (locality works) but far below the 0.985 production bar —
        # the documented reason it is not the production path
        assert 0.5 < r < 1.0
