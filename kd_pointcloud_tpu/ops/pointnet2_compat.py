"""pointnet2 compatibility surface.

The reference ships the full pointnet2 package (pip-installed CUDA extension
+ torch wrappers + SA/FP modules, SURVEY.md §2.1 items 31-32) even though the
flow models use only FPS/gather/group. This module provides the same
capability surface over the TPU-native ops so reference users find the whole
API:

  * functional ops mirroring pointnet2/pointnet2_utils.py:10-228
  * QueryAndGroup / GroupAll (ibid.:231-291)
  * PointnetSAModule / PointnetFPModule (pointnet2/pointnet2_modules.py)

Layout note: these take channels-last (B, N, C) like the rest of this
framework; the reference's (B, C, N) is a torch-ism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.blocks import MLP
from .ball_query import ball_query
from .fps import furthest_point_sample
from .gather import gather_points, group_points
from .interpolate import three_interpolate, three_nn

__all__ = [
    "furthest_point_sample", "gather_operation", "grouping_operation",
    "ball_query", "three_nn", "three_interpolate", "QueryAndGroup",
    "GroupAll", "PointnetSAModule", "PointnetFPModule",
]

# functional aliases matching pointnet2_utils names
gather_operation = gather_points
grouping_operation = group_points


class QueryAndGroup(nn.Module):
    """Ball-query + group (+ relative-xyz concat)
    (pointnet2/pointnet2_utils.py:231-270)."""

    radius: float
    nsample: int
    use_xyz: bool = True

    def __call__(self, xyz, new_xyz, features: Optional[jnp.ndarray] = None):
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if features is not None:
            grouped = group_points(features, idx)
            if self.use_xyz:
                return jnp.concatenate([grouped_xyz, grouped], axis=-1)
            return grouped
        assert self.use_xyz
        return grouped_xyz


class GroupAll(nn.Module):
    """Single global group (pointnet2/pointnet2_utils.py:272-291)."""

    use_xyz: bool = True

    def __call__(self, xyz, new_xyz, features: Optional[jnp.ndarray] = None):
        grouped_xyz = xyz[:, None, :, :]
        if features is not None:
            grouped = features[:, None, :, :]
            if self.use_xyz:
                return jnp.concatenate([grouped_xyz, grouped], axis=-1)
            return grouped
        return grouped_xyz


class PointnetSAModule(nn.Module):
    """Set-abstraction: FPS → ball-query group → shared MLP → maxpool
    (pointnet2/pointnet2_modules.py:10-90)."""

    npoint: Optional[int]
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features: Optional[jnp.ndarray] = None):
        if self.npoint is not None:
            fps_idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, fps_idx)
            grouped = QueryAndGroup(self.radius, self.nsample,
                                    self.use_xyz)(xyz, new_xyz, features)
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            grouped = GroupAll(self.use_xyz)(xyz, new_xyz, features)
        h = MLP(self.mlp)(grouped)
        return new_xyz, jnp.max(h, axis=2)


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN IDW interpolate + unit pointnet
    (pointnet2/pointnet2_modules.py:93-160)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats):
        if known is not None:
            dist, idx = three_nn(unknown, known)
            inv = 1.0 / dist   # three_nn already floors at 1e-10
            weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
            interp = three_interpolate(known_feats, idx, weight)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1],
                              known_feats.shape[-1]))
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return MLP(self.mlp)(interp)
