"""Point-cloud warping by inverse-flow interpolation.

Reference: PointWarping (pointconv_util.py:2114-2142). Moves pc2 toward pc1
using an inverse flow reconstructed at pc2's positions by 3-NN inverse-distance
weighting over the forward-flowed pc1.
"""

from __future__ import annotations

import jax.numpy as jnp

from .gather import group_points
from .knn import knn_point


def point_warp(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
               flow1: jnp.ndarray | None, *, method: str = "exact",
               recall: float = 0.95,
               precision: str = "highest") -> jnp.ndarray:
    """Warp xyz2 backward along flow1.

    Args:
      xyz1: (B, N1, 3) source cloud.
      xyz2: (B, N2, 3) target cloud.
      flow1: (B, N1, 3) forward flow at xyz1 (None → identity, matching the
        reference's first decoder level).
    Returns:
      (B, N2, 3) warped xyz2.
    """
    if flow1 is None:
        return xyz2

    xyz1_to_2 = xyz1 + flow1
    # 3-NN of each xyz2 point among the flowed xyz1 points. Indices only —
    # like the reference, the distances used below are recomputed from the
    # gathered coordinates (pointconv_util.py:2131-2133), which keeps the
    # gradient path identical (through the gathered positions, never through
    # the selection) and lets the index search take the fused Pallas kernel.
    idx = knn_point(3, xyz1_to_2, xyz2, method=method,
                    recall=recall, precision=precision)      # (B, N2, 3)
    # one gather for neighbor positions AND their flows (same rows)
    grouped = group_points(jnp.concatenate([xyz1_to_2, flow1], axis=-1), idx)
    neighbor_pos, grouped_flow1 = grouped[..., :3], grouped[..., 3:]

    # Clamp INSIDE the sqrt: sqrt(1e-20) equals the reference's 1e-10 clamp
    # (:2133) but keeps the gradient finite at coincident points (jax
    # sqrt'(0)=inf; torch.norm defines a zero subgradient the reference
    # relies on).
    d2 = jnp.sum((xyz2[:, :, None, :] - neighbor_pos) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    inv = 1.0 / dist
    weight = inv / jnp.sum(inv, axis=-1, keepdims=True)

    flow2 = jnp.sum(weight[..., None] * grouped_flow1, axis=2)
    return xyz2 - flow2
