"""k-nearest-neighbor search over point clouds.

Replaces the reference's dense (B, S, N) distance matrix + torch.topk
(pointconv_util.py:96-107). Here the query axis is processed in chunks so peak
memory stays bounded at chunk_size × N instead of S × N — the TPU analogue of
"sequence-length" tiling for the O(N²) neighbor search (SURVEY.md §5).

Index order within the k neighbors is not guaranteed to match torch's
``topk(sorted=False)``; every consumer downstream (max-pool over K, inverse-
distance weighting) is permutation-invariant, mirroring the reference contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import square_distance


def _chunk_topk(xyz: jnp.ndarray, query_chunk: jnp.ndarray, k: int):
    d = square_distance(query_chunk, xyz)            # (B, Q, N)
    neg_d, idx = jax.lax.top_k(-d, k)                 # smallest-k distances
    return -neg_d, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("chunk",))
def knn_point(k: int, xyz: jnp.ndarray, query: jnp.ndarray,
              *, chunk: int | None = 2048) -> jnp.ndarray:
    """Indices of the k nearest points in `xyz` for each point in `query`.

    Args:
      k: number of neighbors (static).
      xyz: (B, N, 3) reference cloud.
      query: (B, S, 3) query points.
      chunk: query-axis chunk size bounding the (chunk, N) distance tile;
        None disables chunking.

    Returns:
      (B, S, k) int32 neighbor indices into `xyz`.

    Reference semantics: pointconv_util.py:96-107 (unsorted smallest-k).
    """
    return knn_point_dist(k, xyz, query, chunk=chunk)[1]


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("chunk",))
def knn_point_dist(k: int, xyz: jnp.ndarray, query: jnp.ndarray,
                   *, chunk: int | None = 2048):
    """Like knn_point but also returns the squared distances (B, S, k)."""
    B, S, _ = query.shape
    if chunk is None or S <= chunk or S % chunk != 0:
        return _chunk_topk(xyz, query, k)

    n_chunks = S // chunk
    q = query.reshape(B, n_chunks, chunk, query.shape[-1])

    def scan_body(carry, q_chunk):
        # q_chunk: (B, chunk, 3)
        d, idx = _chunk_topk(xyz, q_chunk, k)
        return carry, (d, idx)

    _, (d, idx) = jax.lax.scan(scan_body, None, jnp.swapaxes(q, 0, 1))
    # (n_chunks, B, chunk, k) -> (B, S, k)
    d = jnp.swapaxes(d, 0, 1).reshape(B, S, k)
    idx = jnp.swapaxes(idx, 0, 1).reshape(B, S, k)
    return d, idx
