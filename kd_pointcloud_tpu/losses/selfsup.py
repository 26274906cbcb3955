"""Self-supervised Chamfer + smoothness + curvature loss.

Reference: multiScaleChamferSmoothCurvature and helpers
(models_bid_pointconv.py:565-677). Channels-last (B, N, 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import group_points, knn_point_dist, square_distance
from .multiscale import ALPHA, safe_norm


def curvature(pc, k: int = 10):
    """Mean offset to the 10-NN (self included) / 9 (models_bid_pointconv.py:565-572)."""
    _, idx = knn_point_dist(k, pc, pc)
    grouped = group_points(pc, idx)
    return jnp.sum(grouped - pc[:, :, None, :], axis=2) / (k - 1)


def curvature_of_warped(pc, warped_pc, k: int = 10):
    """Curvature of warped_pc over pc's neighborhood graph (:591-598)."""
    _, idx = knn_point_dist(k, pc, pc)
    grouped = group_points(warped_pc, idx)
    return jnp.sum(grouped - warped_pc[:, :, None, :], axis=2) / (k - 1)


def chamfer(pc1, pc2):
    """Two-sided nearest squared distances (:574-589)."""
    d = square_distance(pc1, pc2)
    return jnp.min(d, axis=2), jnp.min(d, axis=1)


def smoothness(pc1, flow, k: int = 9):
    """Mean 9-NN flow deviation (:600-615)."""
    _, idx = knn_point_dist(k, pc1, pc1)
    grouped = group_points(flow, idx)
    # the self-neighborhood contains the query point itself (zero diff) —
    # safe_norm keeps the gradient finite there
    diff = safe_norm(grouped - flow[:, :, None, :])
    return jnp.sum(diff, axis=2) / (k - 1)


def interpolate_curvature(pc1, pc2, pc2_curv, k: int = 5):
    """5-NN IDW interpolation of pc2's curvature onto pc1 (:617-636)."""
    d2, idx = knn_point_dist(k, pc2, pc1)
    grouped = group_points(pc2_curv, idx)
    inv = 1.0 / (d2 + 1e-8)
    w = inv / jnp.sum(inv, axis=2, keepdims=True)
    return jnp.sum(w[..., None] * grouped, axis=2)


def multi_scale_chamfer_smooth_curvature(pc1, pc2, pred_flows, alpha=ALPHA,
                                         f_curvature=0.3, f_smoothness=1.0,
                                         f_chamfer=1.0):
    """Reference :638-677. pc1/pc2/pred_flows are per-level lists."""
    chamfer_l = jnp.zeros((), jnp.float32)
    smooth_l = jnp.zeros((), jnp.float32)
    curv_l = jnp.zeros((), jnp.float32)
    for i in range(len(pred_flows)):
        cur_pc1, cur_pc2, cur_flow = pc1[i], pc2[i], pred_flows[i]
        cur_pc2_curv = curvature(cur_pc2)
        warped = cur_pc1 + cur_flow
        d1, d2 = chamfer(warped, cur_pc2)
        moved_curv = curvature_of_warped(cur_pc1, warped)

        chamfer_l += alpha[i] * (jnp.mean(jnp.sum(d1, 1))
                                 + jnp.mean(jnp.sum(d2, 1)))
        smooth_l += alpha[i] * jnp.mean(jnp.sum(smoothness(cur_pc1, cur_flow), 1))
        inter_curv = interpolate_curvature(warped, cur_pc2, cur_pc2_curv)
        curv_l += alpha[i] * jnp.mean(
            jnp.sum(jnp.sum((inter_curv - moved_curv) ** 2, -1), 1))

    total = f_chamfer * chamfer_l + f_curvature * curv_l + f_smoothness * smooth_l
    return total, chamfer_l, curv_l, smooth_l
