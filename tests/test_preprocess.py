"""Preprocessing tests: format round-trips + geometric consistency."""

import numpy as np
import pytest

from kd_pointcloud_tpu.data.preprocess import ft3d, io, kitti


class TestIO:
    def test_pfm_roundtrip(self, tmp_path, rng):
        img = rng.rand(12, 20).astype(np.float32)
        p = str(tmp_path / "t.pfm")
        io.write_pfm(p, img)
        back, scale = io.read_pfm(p)
        np.testing.assert_array_equal(back, img)

    def test_pfm_color_roundtrip(self, tmp_path, rng):
        img = rng.rand(8, 10, 3).astype(np.float32)
        p = str(tmp_path / "t.pfm")
        io.write_pfm(p, img)
        back, _ = io.read_pfm(p)
        np.testing.assert_array_equal(back, img)

    def test_flo_roundtrip(self, tmp_path, rng):
        flow = rng.rand(6, 9, 2).astype(np.float32)
        p = str(tmp_path / "t.flo")
        io.write_flo(p, flow)
        np.testing.assert_array_equal(io.read_flo(p), flow)

    def test_uint16_png_roundtrip(self, tmp_path, rng):
        from kd_pointcloud_tpu.data.preprocess.png16 import write_png16
        arr = (rng.rand(5, 7) * 60000).astype(np.uint16)
        p = str(tmp_path / "t.png")
        write_png16(p, arr)
        np.testing.assert_array_equal(io.read_uint16_png(p), arr)

    def test_uint16_png_rgb_roundtrip(self, tmp_path, rng):
        from kd_pointcloud_tpu.data.preprocess.png16 import write_png16
        arr = (rng.rand(4, 6, 3) * 60000).astype(np.uint16)
        p = str(tmp_path / "rgb.png")
        write_png16(p, arr)
        np.testing.assert_array_equal(io.read_uint16_png(p), arr)

    def test_png16_decodes_pil_output(self, tmp_path, rng):
        """cross-check the decoder against PIL's encoder (grayscale 16-bit,
        PIL CAN write that) — exercises non-zero row filters."""
        from PIL import Image
        arr = (rng.rand(16, 16) * 60000).astype(np.uint16)
        p = str(tmp_path / "pil.png")
        Image.fromarray(arr, mode="I;16").save(p)
        # PIL writes I;16 as little-endian 16-bit grayscale png
        np.testing.assert_array_equal(io.read_uint16_png(p), arr)


class TestFT3DGeometry:
    def test_pixel2pc_depth(self):
        """depth = -f/disparity with f=-1050 → disparity 1050 gives depth 1."""
        disp = np.full((4, 6), 1050.0, np.float32)
        pc = ft3d.pixel2pc(disp)
        np.testing.assert_allclose(pc[..., 2], 1.0)

    def test_zero_flow_consistency(self):
        """flow=0, no disparity change → pc2 == pc1."""
        rng = np.random.RandomState(0)
        disp = (rng.rand(4, 6).astype(np.float32) + 0.5) * 100
        pc1 = ft3d.pixel2pc(disp)
        pc2 = ft3d.next_pixel2pc(np.zeros((4, 6, 2), np.float32), disp)
        np.testing.assert_allclose(pc1, pc2, rtol=1e-6)


class TestKittiGeometry:
    def _p_rect(self, f=721.5, cx=609.6, cy=172.9):
        P = np.zeros((3, 4), np.float32)
        P[0, 0] = P[1, 1] = f
        P[0, 2], P[1, 2] = cx, cy
        P[2, 2] = 1.0
        return P

    def test_disp_depth(self):
        disp = np.full((3, 5), 0.54 * 721.5, np.float32)
        valid = np.ones_like(disp, bool)
        depth = kitti.disp_to_depth(disp, valid, 721.5)
        np.testing.assert_allclose(depth, 1.0, rtol=1e-4)

    def test_pixel2xyz_projects_back(self):
        """pixel2xyz then the eval-side projector recovers pixel coords
        (eval/geometry.py uses f=-P[0,0] and the same x/y negation)."""
        from kd_pointcloud_tpu.eval.geometry import project_3d_to_2d
        P = self._p_rect()
        rng = np.random.RandomState(0)
        depth = (rng.rand(6, 8).astype(np.float32) + 0.5) * 20
        pc = kitti.pixel2xyz(depth, P)
        px, py = project_3d_to_2d(pc.reshape(-1, 3), f=-P[0, 0],
                                  cx=P[0, 2], cy=P[1, 2])
        want_px = np.tile(np.arange(8, dtype=np.float32)[None], (6, 1)).ravel()
        want_py = np.tile(np.arange(6, dtype=np.float32)[:, None], (1, 8)).ravel()
        np.testing.assert_allclose(px, want_px, atol=1e-3)
        np.testing.assert_allclose(py, want_py, atol=1e-3)

    def test_flow_png_encoding(self, tmp_path):
        """flow png encoding: (v*64 + 2^15), third plane = valid."""
        from kd_pointcloud_tpu.data.preprocess.png16 import write_png16
        flow = np.zeros((4, 4, 3), np.uint16)
        flow[..., 0] = 2 ** 15 + 64 * 3      # u = +3 px
        flow[..., 1] = 2 ** 15 - 64 * 2      # v = -2 px
        flow[..., 2] = 1
        p = str(tmp_path / "f.png")
        write_png16(p, flow)
        f, valid = kitti.load_op_flow(p)
        assert valid.all()
        np.testing.assert_allclose(f[..., 0], 3.0)
        np.testing.assert_allclose(f[..., 1], -2.0)
