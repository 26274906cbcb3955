"""Loss-library tests: multiScaleLoss oracle + KD loss sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd_pointcloud_tpu import losses


def np_multiscale(pred_flows, gt, fps_idxs, alpha=(0.02, 0.04, 0.08, 0.16)):
    gts = [gt]
    for idx in fps_idxs:
        gts.append(np.stack([gts[-1][b][idx[b]] for b in range(gt.shape[0])]))
    total = 0.0
    offset = len(fps_idxs) - len(pred_flows) + 1
    for i, pf in enumerate(pred_flows):
        d = np.linalg.norm(pf - gts[i + offset], axis=-1)
        total += alpha[i] * d.sum(1).mean()
    return total


@pytest.fixture
def flow_data(rng):
    B = 2
    sizes = [64, 32, 16, 8]
    preds = [jnp.asarray(rng.randn(B, n, 3).astype(np.float32))
             for n in sizes]
    gt = jnp.asarray(rng.randn(B, 64, 3).astype(np.float32))
    fps = [jnp.asarray(rng.randint(0, sizes[i], size=(B, sizes[i + 1])))
           for i in range(3)]
    return preds, gt, fps


class TestMultiScale:
    def test_matches_oracle(self, flow_data):
        preds, gt, fps = flow_data
        got = float(losses.multi_scale_loss(preds, gt, fps))
        want = np_multiscale([np.asarray(p) for p in preds], np.asarray(gt),
                             [np.asarray(i) for i in fps])
        assert got == pytest.approx(want, rel=1e-5)

    def test_zero_when_exact(self, flow_data):
        preds, gt, fps = flow_data
        gts = losses.downsample_gt(gt, fps)
        got = float(losses.multi_scale_loss(gts, gt, fps))
        assert got == pytest.approx(0.0, abs=1e-6)


class TestKD:
    def test_kd2_blending_limits(self, flow_data):
        preds, gt, fps = flow_data
        t_out = [p + 0.1 for p in preds]
        full_teacher = losses.loss_fn_kd_2(preds, fps, gt, t_out, fps, 1.0)
        full_gt = losses.loss_fn_kd_2(preds, fps, gt, t_out, fps, 0.0)
        # gamma=1 -> pure teacher imitation; teacher==student+0.1 shifts gt
        ms_gt = losses.multi_scale_loss(preds, gt, fps)
        assert float(full_gt) == pytest.approx(float(ms_gt), rel=1e-6)
        assert float(full_teacher) != pytest.approx(float(ms_gt), rel=1e-3)

    def test_bidirection_ht(self, flow_data, rng):
        preds, gt, fps = flow_data
        feats = [jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
                 for _ in range(4)]
        t_feats = [f + 1.0 for f in feats]
        v = losses.bidirection_loss_ht(preds, feats, feats, fps, gt, preds,
                                       t_feats, t_feats, gamma=0.5, beta=0.5,
                                       layer=1)
        # hint term: (f - (f+1))^2/2 = 0.5 per element, halved per cloud
        hint = feats[1].size / 2
        base = float(losses.multi_scale_loss(preds, gt, fps))
        # teacher_outputs=preds -> loss1 imitates preds[0] through the chain
        loss1 = float(losses.multi_scale_loss(preds, preds[0], fps))
        assert float(v) == pytest.approx(
            0.5 * (0.5 * loss1 + 0.5 * base) + 0.5 * hint, rel=1e-4)

    def test_att_iter_loss_runs(self, flow_data, rng):
        preds, gt, fps = flow_data
        # teacher with 2 iterations at levels 0..2, plain at 3
        t_out = [[p + 0.05, p + 0.02] for p in preds[:3]] + [preds[3]]
        v = losses.att_iter_loss(preds, fps, gt, t_out, fps, gamma=0.6,
                                 layers=(1, 2))
        assert np.isfinite(float(v))

    def test_cross_bidirection_ht_shapes(self, flow_data, rng):
        preds, gt, fps = flow_data
        s_feats = [jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
                   for _ in range(4)]
        t_feats = [jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
                   for _ in range(4)]
        v = losses.cross_bidirection_loss_ht(preds, s_feats, fps, gt, preds,
                                             t_feats, t_feats, 0.3, 0.8,
                                             layer=(1, 2))
        assert np.isfinite(float(v))

    def test_selfsup_loss(self, rng):
        B, N = 1, 32
        pc1 = [jnp.asarray(rng.randn(B, n, 3).astype(np.float32))
               for n in (32, 16)]
        pc2 = [p + 0.1 for p in pc1]
        flows = [jnp.full_like(p, 0.1) for p in pc1]
        total, ch, cu, sm = losses.multi_scale_chamfer_smooth_curvature(
            pc1, pc2, flows)
        # perfect flow: chamfer ~0, smooth 0 (constant flow), curvature ~0
        assert float(ch) == pytest.approx(0.0, abs=1e-5)
        assert float(sm) == pytest.approx(0.0, abs=1e-6)
        assert float(cu) == pytest.approx(0.0, abs=1e-4)


class TestGradients:
    def test_kd_losses_differentiable(self, flow_data, rng):
        preds, gt, fps = flow_data
        t_out = [p + 0.1 for p in preds]

        def f(scale):
            scaled = [p * scale for p in preds]
            return losses.loss_fn_kd_2(scaled, fps, gt, t_out, fps, 0.5)

        g = jax.grad(f)(1.0)
        assert np.isfinite(float(g)) and abs(float(g)) > 0
