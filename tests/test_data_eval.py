"""Data pipeline + metrics tests on the bundled KITTI scenes (real fixtures
shipped inside the reference checkout — SURVEY.md §4c)."""

import os.path as osp

import numpy as np
import pytest

from kd_pointcloud_tpu.data import (DataLoader, KITTI, Augmentation,
                                    ProcessData)
from kd_pointcloud_tpu.eval import (evaluate_2d, evaluate_3d,
                                    get_batch_2d_flow, read_kitti_intrinsics)

KITTI_AVAILABLE = osp.isdir("/root/reference/datasets/kitti_processed")
needs_kitti = pytest.mark.skipif(not KITTI_AVAILABLE,
                                 reason="bundled KITTI scenes not present")

AUG_TOGETHER = dict(degree_range=0.1745329252, shift_range=1.0,
                    scale_low=0.95, scale_high=1.05, jitter_sigma=0.01,
                    jitter_clip=0.00)
AUG_PC2 = dict(degree_range=0.0, shift_range=0.3, jitter_sigma=0.01,
               jitter_clip=0.00)


class TestMetrics:
    def test_evaluate_3d_perfect(self, rng):
        sf = rng.randn(100, 3).astype(np.float32)
        epe, acc_s, acc_r, out = evaluate_3d(sf, sf)
        assert epe == 0 and acc_s == 1 and acc_r == 1 and out == 0

    def test_evaluate_3d_thresholds(self):
        gt = np.zeros((4, 3))
        gt[:, 0] = 1.0                       # |gt| = 1 → rel = err
        pred = gt.copy()
        pred[0, 1] += 0.04                   # < 0.05 strict hit
        pred[1, 1] += 0.08                   # relax hit only
        pred[2, 1] += 0.2                    # rel > 10% → outlier
        pred[3, 1] += 0.5                    # > 0.3 → outlier
        epe, acc_s, acc_r, out = evaluate_3d(pred, gt)
        assert acc_s == pytest.approx(0.25)
        assert acc_r == pytest.approx(0.5)
        assert out == pytest.approx(0.5)

    def test_evaluate_2d(self):
        gt = np.full((10, 2), 100.0)
        pred = gt + np.array([2.0, 0.0])
        epe, acc = evaluate_2d(pred, gt)
        assert epe == pytest.approx(2.0)
        assert acc == 1.0


class TestTransforms:
    def test_process_data_shapes(self, rng):
        pc1 = rng.rand(5000, 3).astype(np.float32) * 30
        pc2 = pc1 + 0.1
        tf = ProcessData(depth_threshold=35.0, no_corr=True, num_points=1024)
        g = np.random.default_rng(0)
        p1, p2, sf = tf((pc1, pc2), g)
        assert p1.shape == p2.shape == sf.shape == (1024, 3)

    def test_process_data_sf_consistency(self, rng):
        """With correspondence kept (no_corr=False), sf == pc2 - pc1 row-wise."""
        pc1 = rng.rand(3000, 3).astype(np.float32) * 30
        pc2 = pc1 + np.float32([0.5, 0, 0])
        tf = ProcessData(no_corr=False, num_points=512)
        p1, p2, sf = tf((pc1, pc2), np.random.default_rng(0))
        np.testing.assert_allclose(p2 - p1, sf, atol=1e-6)

    def test_depth_mask(self, rng):
        pc1 = np.stack([np.zeros(100), np.zeros(100),
                        np.linspace(1, 100, 100)], axis=1).astype(np.float32)
        tf = ProcessData(depth_threshold=35.0, no_corr=False, num_points=10)
        p1, _, _ = tf((pc1, pc1), np.random.default_rng(0))
        assert (p1[:, 2] < 35).all()

    def test_augmentation_sf_definition(self, rng):
        """sf measured after pc2-only rigid motion, before sampling."""
        pc1 = rng.rand(4000, 3).astype(np.float32) * 10
        pc2 = pc1.copy()
        tf = Augmentation(AUG_TOGETHER, AUG_PC2, num_points=256,
                          no_corr=False)
        p1, p2, sf = tf((pc1, pc2), np.random.default_rng(1))
        assert p1.shape == (256, 3)
        # no_corr=False and jitter_clip=0 → sf must equal p2 - p1 exactly
        np.testing.assert_allclose(p2 - p1, sf, atol=1e-5)

    def test_augmentation_scale_bounds(self, rng):
        pc1 = rng.rand(4000, 3).astype(np.float32)
        pc2 = pc1.copy()
        tf = Augmentation(AUG_TOGETHER, AUG_PC2, num_points=0,
                          depth_threshold=0, no_corr=True)
        p1, _, _ = tf((pc1, pc2), np.random.default_rng(2))
        # rigid+scale transform keeps cloud extents within ~scale+shift bounds
        assert np.abs(p1).max() < np.abs(pc1).max() * 1.05 + 1.0 + 0.01


@needs_kitti
class TestKitti:
    def test_scene_count_and_filter(self):
        ds = KITTI(train=False,
                   transform=ProcessData(num_points=1024))
        assert len(ds) == 142   # mapping filter (SURVEY.md §2.1 #23)

    def test_sample(self):
        ds = KITTI(train=False, transform=ProcessData(num_points=1024))
        pc1, pc2, n1, n2, sf, path = ds[0]
        assert pc1.shape == (1024, 3)
        assert (pc1[:, 1] >= -1.4).any()    # ground removal happened upstream
        assert "kitti_processed" in path

    def test_loader_batches(self):
        ds = KITTI(train=False, transform=ProcessData(num_points=256))
        dl = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True,
                        num_workers=1)
        batch = next(iter(dl))
        pc1, pc2, n1, n2, sf, paths = batch
        assert pc1.shape == (4, 256, 3) and len(paths) == 4
        assert len(dl) == 142 // 4

    def test_2d_projection(self):
        ds = KITTI(train=False, transform=ProcessData(num_points=512))
        pc1, pc2, _, _, sf, path = ds[0]
        flow_pred, flow_gt = get_batch_2d_flow(
            pc1[None], (pc1 + sf)[None], (pc1 + sf)[None], [path])
        # identical pred and gt targets → identical pixel flows
        np.testing.assert_allclose(flow_pred, flow_gt, atol=1e-4)
        intr = read_kitti_intrinsics(osp.split(path)[-1])
        assert intr["f"] < 0 and intr["cx"] > 0


class TestNativeIO:
    def test_matches_numpy(self, rng, tmp_path):
        import os.path as osp
        from kd_pointcloud_tpu.data import native_io
        arr32 = rng.rand(100, 3).astype(np.float32)
        arr64 = rng.rand(50, 3)
        p32, p64 = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
        np.save(p32, arr32)
        np.save(p64, arr64)
        np.testing.assert_array_equal(native_io.npy_read(p32), arr32)
        np.testing.assert_allclose(native_io.npy_read(p64),
                                   arr64.astype(np.float32), rtol=1e-6)
        outs = native_io.read_batch([p32, p64])
        np.testing.assert_array_equal(outs[0], arr32)
        assert native_io.npy_info(p32) == (100, 3)


class TestDeviceProjection:
    def test_matches_host_geometry_ft3d_and_kitti(self, rng):
        """The device-side projection used by the device-metrics eval step
        reproduces utils-geometry's host path for both the FT3D constants
        and a per-scene KITTI calib."""
        import jax.numpy as jnp

        from kd_pointcloud_tpu.eval.geometry import get_batch_2d_flow
        from kd_pointcloud_tpu.eval.runner import _intrinsics_for, project_points

        pc1 = rng.randn(2, 64, 3).astype(np.float32) + np.array([0, 0, 10],
                                                                np.float32)
        flow = rng.randn(2, 64, 3).astype(np.float32) * 0.1
        for paths in (["ft3d/sceneA", "ft3d/sceneB"],
                      ["kitti_processed/000002", "kitti_processed/000005"]):
            intr = _intrinsics_for(paths)
            px1 = np.asarray(project_points(jnp.asarray(pc1),
                                            jnp.asarray(intr)))
            pxw = np.asarray(project_points(jnp.asarray(pc1 + flow),
                                            jnp.asarray(intr)))
            dev_flow = pxw - px1
            host_pred, _ = get_batch_2d_flow(pc1, pc1 + flow, pc1 + flow,
                                             paths)
            np.testing.assert_allclose(dev_flow, host_pred, rtol=1e-4,
                                       atol=1e-3)
