"""Radius-bounded fixed-K neighbor search (API parity op).

Reference: ball_query_gpu.cu:9-45. Unused by the production flow models (they
use kNN), but part of the pointnet2 capability surface. Semantics: for each
query point, take up to K points of `xyz` within `radius` **in index order**
(the CUDA kernel scans linearly), padding unfilled slots with the first hit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import square_distance


@functools.partial(jax.jit, static_argnums=(1,))
def ball_query(radius: float, k: int, xyz: jnp.ndarray,
               query: jnp.ndarray) -> jnp.ndarray:
    """Args:
      radius: ball radius.
      k: max neighbors per query (static).
      xyz: (B, N, 3) points; query: (B, S, 3) centers.
    Returns:
      (B, S, k) int32 indices (first in-radius hit repeated for padding;
      0 when no point is in radius, matching the CUDA output buffer init).
    """
    d2 = square_distance(query, xyz)                       # (B, S, N)
    in_ball = d2 < radius * radius
    N = xyz.shape[1]
    arange = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
    # Rank in-ball points by original index (CUDA scans in index order);
    # out-of-ball points sort to the end.
    key = jnp.where(in_ball, arange, N)
    order = jnp.argsort(key, axis=-1)[..., :k].astype(jnp.int32)  # (B, S, k)
    picked_valid = jnp.take_along_axis(in_ball, order, axis=-1)
    first = order[..., :1]
    idx = jnp.where(picked_valid, order, first)
    # No hits at all → CUDA leaves the zero-initialized buffer.
    any_hit = jnp.any(in_ball, axis=-1, keepdims=True)
    return jnp.where(any_hit, idx, 0)
