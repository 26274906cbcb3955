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


class TestVoteFileInventoryR3:
    """Round-3 additions closing the pointconv_util_vote.py inventory
    (VERDICT r2 missing #3 / next #7) + the SetconvFuseResidual straggler."""

    def test_omission_ledger_complete(self):
        """Every vote-file class is either built (has an attribute in the
        package) or listed in OMITTED_VOTE_CLASSES with a file:line."""
        import re

        from kd_pointcloud_tpu.nn import cross as cr
        from kd_pointcloud_tpu.nn import flowhead as fh
        from kd_pointcloud_tpu.nn import pointconv as pc
        from kd_pointcloud_tpu.models import bid_pointflow  # noqa: F401

        ref = "/root/reference/pointconv_util_vote.py"
        try:
            src = open(ref).read()
        except OSError:
            pytest.skip("reference checkout not present")
        names = re.findall(r"^class (\w+)\(", src, re.M)
        shared_in_main = {
            # copies of pointconv_util.py classes built in nn/ and ops/
            "Conv1d", "Conv2d", "WeightNet", "PointConv", "PointConvD",
            "PointConvFlow", "CrossLayer", "CrossLayerLight", "PointWarping",
            "UpsampleFlow", "SceneFlowEstimatorResidual",
        }
        for n in names:
            accounted = (
                hasattr(ex, n)
                or hasattr(cr, n) or hasattr(fh, n) or hasattr(pc, n)
                or n in shared_in_main
                or n in ex.OMITTED_VOTE_CLASSES
                # vote cross layers live under CrossLayerLightVote* names
                or ("Vote" in n and hasattr(ex, n.replace("CrossLayerLight",
                                                          "CrossLayerLight")))
            )
            assert accounted, f"unaccounted vote-file class: {n}"
        for name, (where, why) in ex.OMITTED_VOTE_CLASSES.items():
            assert ":" in where and len(why) > 20

    def test_pointconv_ds(self, cloud, rng):
        xyz, feats = cloud
        xyz_s = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        new_xyz, out, idx = run(ex.PointConvDS(16, K, 24), xyz_s, xyz, feats)
        assert new_xyz.shape == (B, 16, 3)
        assert out.shape == (B, 16, 24)
        assert idx.shape == (B, 16)

    def test_adaptive_sampling(self, cloud, rng):
        xyz, feats = cloud
        pc2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f2 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        idx = ex.AdaptiveSampling(K)(xyz, feats, pc2, f2)
        assert idx.shape == (B, N)
        assert int(jnp.max(idx)) < N and int(jnp.min(idx)) >= 0

    def test_pointconv_4d(self, cloud, rng):
        xyz, feats = cloud
        c_xyz = jnp.asarray(rng.randn(B, 32, 3).astype(np.float32))
        out = run(ex.PointConv4D(K, 24), c_xyz, xyz, feats)
        assert out.shape == (B, 32, 24)

    def test_cross_atten(self, cloud, rng):
        xyz, feats = cloud
        pc2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f2 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        a, b = run(ex.CrossAtten(24), xyz, pc2, feats, f2)
        assert a.shape == (B, N, 24) and b.shape == (B, N, 24)

    def test_cross_occ(self, cloud, rng):
        xyz, feats = cloud
        pc2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f2 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        f1n, f2n, o1, o2, final = run(
            ex.CrossLayerLightOcc(K, (24, 24), (32, 32)), xyz, pc2, feats, f2)
        assert o1.shape == (B, N, 1) and float(jnp.min(o1)) >= 0.0
        assert float(jnp.max(o1)) <= 1.0
        assert final.shape == (B, N, 32)
        # occ-residual arity
        out4 = run(ex.CrossLayerLightOcc(K, (24, 24), None),
                   xyz, pc2, feats, f2, o1, o2)
        assert len(out4) == 4

    def test_cross_attentive(self, cloud, rng):
        xyz, feats = cloud
        pc2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f2 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        # attentive pooling requires mlp1[-1] == feature width (ref usage)
        f1n, f2n, final = run(
            ex.CrossLayerLightAttentive(K, (24, C), (24, C)),
            xyz, pc2, feats, f2)
        assert f1n.shape == (B, N, C) and final.shape == (B, N, C)

    def test_cross_p2p(self, cloud, rng):
        xyz, feats = cloud
        pc2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f2 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        f1n, f2n, final = run(
            ex.CrossLayerP2PConvLight2(K, (24, 24), (32, 32)),
            xyz, pc2, feats, f2)
        assert final.shape == (B, N, 32)

    def test_cross_shift(self, cloud, rng):
        xyz, feats = cloud
        pc2 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f2 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        f1n, f2n, final = run(
            ex.CrossLayerLightShift(K, (24, 24), (32, 32)),
            xyz, pc2, feats, f2)
        assert final.shape == (B, N, 32)

    def test_setconv_fuse_residual(self, cloud, rng):
        xyz, feats = cloud
        cost = jnp.asarray(rng.randn(B, N, 24).astype(np.float32))
        flow = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        x, out_flow = run(
            ex.SceneFlowEstimatorSetconvFuseResidual(
                channels=((32, 32), (32, 32)), mlp=(32, 16), neighbors=K),
            xyz, feats, cost, flow)
        assert out_flow.shape == (B, N, 3)
        assert x.shape == (B, N, 16)

    def test_residual_occ(self, cloud, rng):
        xyz, feats = cloud
        cost = jnp.asarray(rng.randn(B, N, 24).astype(np.float32))
        occ = jnp.asarray(rng.rand(B, N, 1).astype(np.float32))
        x, flow, occ_out = run(
            ex.SceneFlowEstimatorResidualOcc(
                channels=(32,), mlp=(32, 16), neighbors=K),
            xyz, feats, cost, None, occ)
        assert flow.shape == (B, N, 3) and occ_out.shape == (B, N, 1)
