"""Smoke tests for the experimental module inventory + pointnet2 compat."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd_pointcloud_tpu.nn import experimental as ex
from kd_pointcloud_tpu.nn.blocks import ConvGRU
from kd_pointcloud_tpu.ops import pointnet2_compat as pn2

B, N, C, K = 2, 64, 16, 8


@pytest.fixture
def cloud(rng):
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    return xyz, feats


def run(module, *args, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    return module.apply(variables, *args, **kwargs)


class TestPointConvVariants:
    def test_svd(self, cloud):
        out = run(ex.PointConvSVD(K, 32), *cloud)
        assert out.shape == (B, N, 32)

    def test_bias(self, cloud):
        out = run(ex.PointConvBias(K, 32), *cloud)
        assert out.shape == (B, N, 32)

    def test_factor(self, cloud):
        out = run(ex.PointConvFactor(K, 32), *cloud)
        assert out.shape[0:2] == (B, N)

    def test_k_and_sep(self, cloud):
        assert run(ex.PointConvK(K, 24), *cloud).shape == (B, N, 24)
        assert run(ex.SepConv(K, 24), *cloud).shape == (B, N, 24)

    def test_vnn_conv_d(self, cloud):
        xyz, feats = cloud
        # vector-channel input must be divisible by 3: use 3+C=3+15
        feats = feats[..., :15]
        new_xyz, out, idx = run(ex.VNNConvD(16, K, 4), xyz, feats)
        assert new_xyz.shape == (B, 16, 3)
        assert out.shape == (B, 16, 12)   # 4 vector channels × 3
        assert idx.shape == (B, 16)


class TestCrossVariants:
    def test_pointconv_flow(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        out = run(ex.PointConvFlow(K, (32, 32)), xyz, xyz2, feats, feats)
        assert out.shape == (B, N, 32)

    def test_cross_concat(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1, f2, ff = run(ex.CrossLayerConcat(K, (32, 32), (32, 32)),
                         xyz, xyz2, feats, feats)
        assert ff.shape == (B, N, 32)

    def test_cross_conv(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1, f2, ff = run(ex.CrossConvLayer(K, 24, 32), xyz, xyz2, feats, feats)
        assert f1.shape == (B, N, 24) and ff.shape == (B, N, 32)

    def test_flow_embedding(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        out = run(ex.FlowEmbeddingLayer(K, (32,)), xyz, xyz2, feats, feats)
        assert out.shape == (B, N, 32)

    def test_cross_up(self, cloud, rng):
        xyz, feats = cloud
        sparse = jnp.asarray(rng.randn(B, 16, 3).astype(np.float32))
        sfeat = jnp.asarray(rng.randn(B, 16, C).astype(np.float32))
        out = run(ex.CrossLayerLightUp(4, (32, 32)), xyz, sparse, feats, sfeat)
        assert out.shape == (B, N, 32)


class TestAggregators:
    def test_local_feature_aggregation(self, cloud):
        out = run(ex.LocalFeatureAggregation(K, 32), *cloud)
        assert out.shape == (B, N, 32)

    def test_set_abstract(self, cloud):
        assert run(ex.SetAbstract(K, (32, 32)), *cloud).shape == (B, N, 32)
        nx, out, idx = run(ex.SetAbstractD(16, K, (32,)), *cloud)
        assert out.shape == (B, 16, 32)

    def test_conv_gru(self, rng):
        h = jnp.asarray(rng.randn(B, N, 32).astype(np.float32))
        x = jnp.asarray(rng.randn(B, N, 48).astype(np.float32))
        out = run(ConvGRU(hidden=32), h, x)
        assert out.shape == (B, N, 32)
        # gated mix of the input state and tanh candidates stays bounded by h
        assert np.abs(np.asarray(out)).max() <= np.abs(np.asarray(h)).max() + 1.0


class TestPointnet2Compat:
    def test_query_and_group(self, cloud):
        xyz, feats = cloud
        qg = pn2.QueryAndGroup(radius=1.5, nsample=4)
        out = qg(xyz, xyz[:, :16], feats)
        assert out.shape == (B, 16, 4, 3 + C)

    def test_group_all(self, cloud):
        xyz, feats = cloud
        out = pn2.GroupAll()(xyz, None, feats)
        assert out.shape == (B, 1, N, 3 + C)

    def test_sa_module(self, cloud):
        xyz, feats = cloud
        new_xyz, out = run(pn2.PointnetSAModule(16, 1.5, 4, (32, 32)),
                           xyz, feats)
        assert new_xyz.shape == (B, 16, 3) and out.shape == (B, 16, 32)

    def test_fp_module(self, cloud, rng):
        xyz, feats = cloud
        sparse = jnp.asarray(rng.randn(B, 16, 3).astype(np.float32))
        sfeats = jnp.asarray(rng.randn(B, 16, 24).astype(np.float32))
        out = run(pn2.PointnetFPModule((32,)), xyz, sparse, feats, sfeats)
        assert out.shape == (B, N, 32)


class TestCrossTransAndEstimators:
    def test_cross_trans(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1, f2, ff = run(ex.CrossTransLayer(K, (16, 16), (32,)),
                         xyz, xyz2, feats, feats)
        assert ff.shape == (B, N, 32)

    def test_cross_local_trans(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1, f2, ff = run(ex.CrossLocalTransLayer(K, (16, 16), (32,)),
                         xyz, xyz2, feats, feats)
        assert ff.shape == (B, N, 32)

    def test_cross_pool_light(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1, f2, ff = run(ex.CrossLayerPoolLight(K, (16, 16), (32,)),
                         xyz, xyz2, feats, feats)
        assert ff.shape == (B, N, 32)

    @pytest.mark.parametrize("ctor", [
        ex.SceneFlowEstimatorSepResidual, ex.SceneFlowEstimatorResidualBias,
        ex.SceneFlowEstimatorResidualSVD,
        ex.SceneFlowEstimatorSetconvResidual])
    def test_estimator_variants(self, cloud, rng, ctor):
        xyz, feats = cloud
        cost = jnp.asarray(rng.randn(B, N, 8).astype(np.float32))
        flow = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        est = ctor(channels=(16, 16), mlp=(16, 8))
        feat_out, flow_out = run(est, xyz, feats, cost, flow)
        assert flow_out.shape == (B, N, 3)

    def test_estimator_smooth(self, cloud, rng):
        xyz, feats = cloud
        bid = jnp.asarray(rng.randn(B, N, 4).astype(np.float32))
        cost = jnp.asarray(rng.randn(B, N, 8).astype(np.float32))
        est = ex.SceneFlowEstimatorResidualSmooth(channels=(16,), mlp=(16, 8))
        variables = est.init(jax.random.PRNGKey(0), xyz, feats, bid, cost)
        _, flow_out = est.apply(variables, xyz, feats, bid, cost,
                                mutable=["batch_stats"])[0]
        assert flow_out.shape == (B, N, 3)

    def test_warp_simple(self, cloud):
        xyz, _ = cloud
        out = ex.PointWarpingSimple()(xyz, xyz + 1.0, jnp.ones_like(xyz))
        np.testing.assert_allclose(np.asarray(out), np.asarray(xyz), atol=1e-6)


class TestVoteAndW:
    def test_pointconv_w(self, cloud):
        xyz, feats = cloud
        new_xyz, out, idx = run(ex.PointConvW(16, K, 24), xyz, feats)
        assert new_xyz.shape == (B, 16, 3) and out.shape == (B, 16, 24)

    def test_vote_double_sparse(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1, f2, ff = run(ex.CrossLayerLightVoteDouble(K, (16, 16), (16, 16)),
                         xyz, xyz2, feats, feats)
        assert ff.shape == (B, N, 16)

    def test_vote_double_dense(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, 32, 3).astype(np.float32))
        f2s = jnp.asarray(rng.randn(B, 32, C).astype(np.float32))
        dense = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        dfeat = jnp.asarray(rng.randn(B, N, 8).astype(np.float32))
        f1, f2, ff = run(ex.CrossLayerLightVoteDouble(K, (16, 16), (16, 16)),
                         xyz, xyz2, feats, f2s, dense, dfeat)
        assert ff.shape == (B, N, 16)


class TestVote12:
    def test_vote1(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1, f2, ff = run(ex.CrossLayerLightVote1(K, (16, 16), (16, 16)),
                         xyz, xyz2, feats, feats)
        assert ff.shape == (B, N, 16 + 3)

    def test_vote2(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1, f2, ff = run(ex.CrossLayerLightVote2(K, (16, 16), (16, 16)),
                         xyz, xyz2, feats, feats)
        assert ff.shape == (B, N, 16 + 3)


class TestSetAbstractFuse:
    def test_fuse(self, cloud):
        out = run(ex.SetAbstractFuse(K, (32, 32), (32,)), *cloud)
        assert out.shape == (B, N, 32)

    def test_fuse_d(self, cloud):
        nx, out, idx = run(ex.SetAbstractFuseD(16, K, (32, 32), (32,)), *cloud)
        assert nx.shape == (B, 16, 3) and out.shape == (B, 16, 32)


class TestRound2Stragglers:
    """The last three inventory items (VERDICT round-1 #7): construct +
    forward + shape, like the rest of the experimental inventory."""

    def test_pointconv_svdd(self, cloud):
        new_xyz, out, idx = run(ex.PointConvSVDD(16, K, 32), *cloud)
        assert new_xyz.shape == (B, 16, 3)
        assert out.shape == (B, 16, 32)
        assert idx.shape == (B, 16)

    def test_pointconv_weight(self, cloud):
        new_xyz, out, idx = run(ex.PointConvWeight(16, K, 32), *cloud)
        assert new_xyz.shape == (B, 16, 3)
        assert out.shape == (B, 16, 32)

    def test_no_cross_layer(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        out = run(ex.NoCrossLayer(K, (32, 24)), xyz, xyz2, feats, feats)
        assert out.shape == (B, N, 24)

    def test_no_cross_layer_clue(self, cloud, rng):
        xyz, feats = cloud
        xyz2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        maxp, clue, idx = run(ex.NoCrossLayer(K, (32, 24), output_clue=True),
                              xyz, xyz2, feats, feats)
        assert maxp.shape == (B, N, 24)
        assert clue.shape == (B, N, K)
        assert idx.shape == (B, N, K)
