"""3-NN inverse-distance-weighted interpolation and flow upsampling.

TPU-native equivalents of the reference's three_nn / three_interpolate CUDA
kernels (pointnet2/src/interpolate_gpu.cu:9-142) and of the Python
UpsampleFlow module (pointconv_util.py:2153-2172), which is what the models
actually use. The gather + weighted-sum forward lowers to XLA natively; its
backward is a deterministic segment-sum.
"""

from __future__ import annotations

import jax.numpy as jnp

from .gather import group_points
from .knn import knn_point_dist


def three_nn(query: jnp.ndarray, ref: jnp.ndarray, *,
             method: str = "exact", recall: float = 0.95,
             precision: str = "highest"):
    """3 nearest neighbors of each query point among ref.

    Args:
      query: (B, N, 3); ref: (B, M, 3).
    Returns:
      (dist, idx): (B, N, 3) Euclidean distances and int32 indices.

    Reference: interpolate_gpu.cu:9-52 (returns true distances, not squared).
    """
    d2, idx = knn_point_dist(3, ref, query, method=method, recall=recall,
                             precision=precision)
    # clamp INSIDE the sqrt: sqrt'(0)=inf and FPS-sampled reference points
    # are exact subsets of dense queries, so zero distances are guaranteed;
    # torch.norm defines a zero subgradient there (the reference relies on
    # it), jax does not. sqrt(1e-20)=1e-10 matches the reference clamp.
    return jnp.sqrt(jnp.maximum(d2, 1e-20)), idx


def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted sum of 3 gathered feature rows.

    Args:
      feats: (B, M, C); idx: (B, N, 3); weight: (B, N, 3).
    Returns:
      (B, N, C).

    Reference: interpolate_gpu.cu:77-97.
    """
    grouped = group_points(feats, idx)              # (B, N, 3, C)
    return jnp.sum(weight[..., None] * grouped, axis=2)


def upsample_idw(dense_xyz: jnp.ndarray, sparse_xyz: jnp.ndarray,
                 sparse_feat: jnp.ndarray, *, method: str = "exact",
                 recall: float = 0.95,
                 precision: str = "highest", knn=None) -> jnp.ndarray:
    """Upsample per-point features from a sparse level to a dense level by
    3-NN inverse-distance weighting.

    Args:
      dense_xyz: (B, N, 3) target positions.
      sparse_xyz: (B, S, 3) source positions.
      sparse_feat: (B, S, C) source features (e.g. a coarse flow).
      knn: optional precomputed (d2, idx) 3-NN of sparse_xyz around
        dense_xyz — lets callers share one search across several upsamples
        over the same geometry (decoder levels upsample deconv features AND
        flow+feat along identical dense/sparse clouds).
    Returns:
      (B, N, C) interpolated features.

    Reference: UpsampleFlow.forward (pointconv_util.py:2153-2172) — weights are
    (1/dist) normalized over the 3 neighbors, dist clamped at 1e-10.
    """
    d2, idx = knn if knn is not None else knn_point_dist(
        3, sparse_xyz, dense_xyz, method=method, recall=recall,
        precision=precision)                                      # (B, N, 3)
    # clamp inside the sqrt (see three_nn) — sqrt(1e-20) = the reference's
    # 1e-10 dist clamp (pointconv_util.py:2166), with a finite gradient
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    inv = 1.0 / dist
    weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return three_interpolate(sparse_feat, idx, weight)
