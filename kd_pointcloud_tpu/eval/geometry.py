"""3D→2D projection for EPE2D/ACC2D.

Reference: utils/geometry.py:6-65. KITTI scenes project through the per-scene
P_rect_02 intrinsics read from the calib_cam_to_cam files; FT3D uses the fixed
synthetic camera (f=-1050, cx=479.5, cy=269.5).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

# Default calib directory: the reference repo bundles the 200 KITTI calib
# files (utils/calib_cam_to_cam/*.txt).
DEFAULT_CALIB_DIR = "/root/reference/utils/calib_cam_to_cam"

FT3D_INTRINSICS = dict(f=-1050.0, cx=479.5, cy=269.5,
                       constx=0.0, consty=0.0, constz=0.0)


def project_3d_to_2d(pc, f=-1050.0, cx=479.5, cy=269.5,
                     constx=0.0, consty=0.0, constz=0.0):
    x = (pc[..., 0] * f + cx * pc[..., 2] + constx) / (pc[..., 2] + constz)
    y = (pc[..., 1] * f + cy * pc[..., 2] + consty) / (pc[..., 2] + constz)
    return x, y


def read_kitti_intrinsics(scene_name: str, calib_dir: str = DEFAULT_CALIB_DIR):
    """Parse P_rect_02 from a KITTI calib file → intrinsics dict
    (utils/geometry.py:14-31; note f = -P[0,0], the sign mirrors the
    preprocessing's x-flip)."""
    path = osp.join(calib_dir, scene_name + ".txt")
    with open(path) as fd:
        for line in fd:
            if line.startswith("P_rect_02"):
                P = np.array([float(v) for v in line.split()[1:]],
                             dtype=np.float32).reshape(3, 4)
                return dict(f=-P[0, 0], cx=P[0, 2], cy=P[1, 2],
                            constx=P[0, 3], consty=P[1, 3], constz=P[2, 3])
    raise ValueError(f"no P_rect_02 in {path}")


def get_batch_2d_flow(pc1, pc2, predicted_pc2, paths,
                      calib_dir: str = DEFAULT_CALIB_DIR):
    """Project batched clouds to pixel flows.

    Args:
      pc1/pc2/predicted_pc2: (B, N, 3).
      paths: per-sample scene paths ('KITTI'/'kitti' in the path selects the
        per-scene intrinsics, utils/geometry.py:7).
    Returns:
      (flow_pred, flow_gt): (B, N, 2) pixel flows.
    """
    if "KITTI" in paths[0] or "kitti" in paths[0]:
        intr = [read_kitti_intrinsics(osp.split(p)[-1], calib_dir)
                for p in paths]
        keys = ("f", "cx", "cy", "constx", "consty", "constz")
        kw = {k: np.array([i[k] for i in intr])[:, None] for k in keys}
    else:
        kw = {k: v for k, v in FT3D_INTRINSICS.items()}

    px1, py1 = project_3d_to_2d(pc1, **kw)
    px2, py2 = project_3d_to_2d(predicted_pc2, **kw)
    px2_gt, py2_gt = project_3d_to_2d(pc2, **kw)

    flow_pred = np.stack([px2 - px1, py2 - py1], axis=-1)
    flow_gt = np.stack([px2_gt - px1, py2_gt - py1], axis=-1)
    return flow_pred, flow_gt
