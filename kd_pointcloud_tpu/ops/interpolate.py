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
    _, idx = knn_point_dist(3, ref, query, method=method, recall=recall,
                            precision=precision)
    # distances recomputed from the gathered coordinates, NOT the search's
    # |q|²−2qk+|k|² expansion, whose f32 cancellation error (~1.2e-7·|x|²)
    # dominates near-zero distances on metric-scale clouds (see
    # upsample_idw). Clamp INSIDE the sqrt: sqrt'(0)=inf and FPS-sampled
    # reference points are exact subsets of dense queries, so zero
    # distances are guaranteed; sqrt(1e-20)=1e-10 matches the CUDA
    # kernel's behavior with a finite gradient.
    diff = group_points(ref, idx) - query[:, :, None, :]
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-20)), idx


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

    The IDW distances are RECOMPUTED from the gathered neighbor coordinates
    (direct (x−y)² form), exactly as the reference does (:2164-2166) — NOT
    taken from the kNN search's |q|²−2qk+|k|² expansion. The expansion's
    f32 cancellation error (~1.2e-7·|x|², i.e. ~1e-4 m² at KITTI scale)
    turns an exact-coincident neighbor (dist 0, weight→1: a copy) into
    dist ~1e-2 (weight ~0.98: a blend) — and FPS levels are exact subsets,
    so EVERY l(n+1)→l(n) upsample hits this. Found by the float64
    train-parity sweep (round 3): dense 1e-3-scale decoder divergence,
    worst gradient leaf 8.9e-3 at deconv3_2. The search still SELECTS with
    expansion d² like the reference's knn_point; only the weights use the
    recomputed distances.
    """
    _, idx = knn if knn is not None else knn_point_dist(
        3, sparse_xyz, dense_xyz, method=method, recall=recall,
        precision=precision)                                      # (B, N, 3)
    # ONE fused gather for coords + features: row gathers on this hardware
    # are row-RATE-bound (~1.7 cyc/row regardless of width), so widening the
    # gathered row from C to 3+C is free while a second (B, N, 3)-row coord
    # gather would cost as much as the feature gather itself
    grouped = group_points(
        jnp.concatenate([sparse_xyz, sparse_feat], axis=-1), idx)
    neighbor_xyz, neighbor_feat = grouped[..., :3], grouped[..., 3:]
    diff = neighbor_xyz - dense_xyz[:, :, None, :]
    # clamp inside the sqrt: sqrt(1e-20) = the reference's 1e-10 dist clamp
    # (pointconv_util.py:2166), with a finite gradient at exact coincidence
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-20))
    inv = 1.0 / dist
    weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return jnp.sum(weight[..., None] * neighbor_feat, axis=2)
