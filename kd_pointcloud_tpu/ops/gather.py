"""Index-gather primitives over point clouds.

TPU-native replacements for the reference CUDA gather/group ops
(pointnet2/src/sampling_gpu.cu:8-83, group_points_gpu.cu:8-67). Forward is a
plain XLA gather (take_along_axis); the backward pass XLA derives is a
deterministic segment-sum — an intentional improvement over the reference's
atomicAdd scatter, whose accumulation order is nondeterministic (SURVEY.md §5).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point rows: (B, N, C) × (B, S) → (B, S, C).

    Reference: index_points_gather (pointconv_util.py:109-120).
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighborhoods: (B, N, C) × (B, S, K) → (B, S, K, C).

    Reference: index_points_group (pointconv_util.py:122-133).
    """
    B, S, K = idx.shape
    flat = gather_points(points, idx.reshape(B, S * K))
    return flat.reshape(B, S, K, points.shape[-1])
