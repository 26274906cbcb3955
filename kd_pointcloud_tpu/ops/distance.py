"""Pairwise squared-distance primitives.

TPU-native equivalent of the reference's matmul-based distance expansion
(reference: pointconv_util.py:73-94). The -2·x·yᵀ term is a single MXU matmul;
the squared-norm terms are rank-1 broadcasts the VPU fuses in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray,
                    precision: str = "highest") -> jnp.ndarray:
    """Squared Euclidean distance between every (src, dst) point pair.

    Args:
      src: (..., N, C) query points.
      dst: (..., M, C) reference points.

    Returns:
      (..., N, M) squared distances.
    """
    # ||x - y||^2 = ||x||^2 + ||y||^2 - 2 x·y  — the cross term rides the MXU.
    # precision="highest" (default): neighbor selection downstream is
    # sensitive to distance values; TPU default matmul precision (bf16
    # passes) can flip near-ties. The model's cost-volume path opts into
    # "default" (≈1.4x faster end to end, measured recall vs exact ≈0.97 —
    # its consumers max-pool / IDW over K and tolerate a swapped neighbor).
    # accumulate in ≥f32 (f64 inputs stay f64 — the float64 parity harness
    # must measure math, not a hidden downcast)
    acc = jnp.promote_types(src.dtype, jnp.float32)
    cross = jnp.matmul(src, jnp.swapaxes(dst, -1, -2),
                       preferred_element_type=acc,
                       precision=(jax.lax.Precision.HIGHEST
                                  if precision == "highest"
                                  else jax.lax.Precision.DEFAULT))
    s2 = jnp.sum(src.astype(acc) ** 2, axis=-1, keepdims=True)
    d2 = jnp.sum(dst.astype(acc) ** 2, axis=-1, keepdims=True)
    return s2 - 2.0 * cross + jnp.swapaxes(d2, -1, -2)
