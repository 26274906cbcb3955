"""Scene-flow estimator heads.

Rebuilds of the reference heads:
  * SceneFlowEstimatorResidual  — pointconv_util.py:2215-2256 (production):
    [feats ⊕ cost] → 2×PointConv(9-NN, bn=True) → pointwise MLP → 1×1 to 3,
    clamp ±200, residual add onto the upsampled coarse flow.
  * SceneFlowEstimatorPointConv — pointconv_util.py:2174-2213 (flow is an
    input channel instead of a residual).
  * SceneFlowEstimatorResidualIter — pointconv_util.py:2563-2608 (RAFT-ish
    3-iteration refinement, experimental inventory).

The PointConvs here are the only BatchNorm sites in the whole model family
(created with bn=True at :2236).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import group_points, knn_point
from .blocks import MLP, Dense
from .pointconv import PointConv


class SceneFlowEstimatorResidual(nn.Module):
    channels: Sequence[int] = (128, 128)
    mlp: Sequence[int] = (128, 64)
    neighbors: int = 9
    clamp: float = 200.0
    weightnet: int = 16
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"

    @nn.compact
    def __call__(self, xyz, feats, cost_volume, flow: Optional[jnp.ndarray] = None,
                 train: bool = True):
        x = jnp.concatenate([feats, cost_volume], axis=-1)
        # one self-kNN AND one neighbor-position gather shared by the whole
        # PointConv stack (same xyz for every conv)
        idx = knn_point(self.neighbors, xyz, xyz, method=self.knn_method,
                        recall=self.knn_recall,
                        precision=self.knn_precision)
        rel = group_points(xyz, idx) - xyz[:, :, None, :]
        for ch in self.channels:
            x = PointConv(self.neighbors, ch, weightnet=self.weightnet,
                          bn=True)(xyz, x, train=train, knn_idx=idx, rel=rel)
        x = MLP(self.mlp)(x)
        flow_local = Dense(3)(x)
        flow_local = jnp.clip(flow_local, -self.clamp, self.clamp)
        return x, flow_local if flow is None else flow_local + flow


class SceneFlowEstimatorPointConv(nn.Module):
    channels: Sequence[int] = (128, 128)
    mlp: Sequence[int] = (128, 64)
    neighbors: int = 9
    clamp: float = 200.0
    weightnet: int = 16
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"

    @nn.compact
    def __call__(self, xyz, feats, cost_volume, flow: Optional[jnp.ndarray] = None,
                 train: bool = True):
        parts = [feats, cost_volume] if flow is None else [feats, cost_volume, flow]
        x = jnp.concatenate(parts, axis=-1)
        idx = knn_point(self.neighbors, xyz, xyz, method=self.knn_method,
                        recall=self.knn_recall,
                        precision=self.knn_precision)
        rel = group_points(xyz, idx) - xyz[:, :, None, :]
        for ch in self.channels:
            x = PointConv(self.neighbors, ch, weightnet=self.weightnet,
                          bn=True)(xyz, x, train=train, knn_idx=idx, rel=rel)
        x = MLP(self.mlp)(x)
        out_flow = jnp.clip(Dense(3)(x), -self.clamp, self.clamp)
        return x, out_flow


class SceneFlowEstimatorResidualIter(nn.Module):
    """3 refinement iterations sharing one head (pointconv_util.py:2563-2608):
    each iteration re-runs the PointConv stack on [feats ⊕ cost] with the
    current flow folded in via the residual add."""

    channels: Sequence[int] = (128, 128)
    mlp: Sequence[int] = (128, 64)
    neighbors: int = 9
    clamp: float = 200.0
    weightnet: int = 16
    iters: int = 3
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"

    @nn.compact
    def __call__(self, xyz, feats, cost_volume, flow: Optional[jnp.ndarray] = None,
                 train: bool = True):
        convs = [PointConv(self.neighbors, ch, weightnet=self.weightnet, bn=True)
                 for ch in self.channels]
        mlp = MLP(self.mlp)
        fc = Dense(3)
        idx = knn_point(self.neighbors, xyz, xyz, method=self.knn_method,
                        recall=self.knn_recall,
                        precision=self.knn_precision)
        rel = group_points(xyz, idx) - xyz[:, :, None, :]
        x = jnp.concatenate([feats, cost_volume], axis=-1)
        for _ in range(self.iters):
            h = x
            for conv in convs:
                h = conv(xyz, h, train=train, knn_idx=idx, rel=rel)
            h = mlp(h)
            flow_local = jnp.clip(fc(h), -self.clamp, self.clamp)
            flow = flow_local if flow is None else flow_local + flow
        return h, flow
