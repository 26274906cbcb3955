"""Morton-order (Z-curve) block kNN: locality-restricted neighbor search.

The dense kNN (ops/knn.py) scores every query against all N2 keys and pays
`approx_min_k`'s partial-reduce over the full key axis — measured 3.1 ms for
an 8192² cloud pair on v5e, the single largest cost in the forward pass
(reference analogue: pointconv_util.py:96-107 materializes the full (B,S,N)
distance matrix + torch.topk).

This module exploits spatial locality instead: sort both clouds along a
shared Morton curve, then each block of `block` consecutive sorted queries
scores only a `window`-wide contiguous slice of sorted keys centered on the
block's median code (searchsorted alignment). Everything is static-shape:
the per-block key slice is a contiguous `dynamic_slice`, distances are a
(block × window) batched matmul, and selection runs over `window` instead of
N2 lanes — ~8× less selection work and ~8× less distance traffic at l0.

Approximation contract: a true neighbor is missed only when it lies outside
the query block's key window. Morton curves have locality discontinuities,
so this is probabilistic — measured recall on the bundled KITTI scenes at
k=32, window=1024, 8192² is ≈0.99 (see tests/test_ops.py::TestMortonKNN and
the round-2 notes). All production consumers (cost-volume max-pool, IDW
3-NN, WeightNet conv) are permutation-invariant and tolerate a swapped
far-tail neighbor, the same contract as `lax.approx_min_k` at
recall_target=0.95.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so consecutive bits land 3 apart."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(xyz: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray
                 ) -> jnp.ndarray:
    """30-bit Morton codes of (B, N, 3) points quantized to the box [lo, hi].

    lo/hi: (B, 1, 3) shared quantization frame — query and key clouds MUST
    use the same box or their codes are not comparable.
    """
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((xyz - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    return (_part1by2(q[..., 0])
            | (_part1by2(q[..., 1]) << 1)
            | (_part1by2(q[..., 2]) << 2))


def joint_bounds(query: jnp.ndarray, xyz: jnp.ndarray):
    both = jnp.concatenate([query, xyz], axis=1)
    return (jnp.min(both, axis=1, keepdims=True),
            jnp.max(both, axis=1, keepdims=True))


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("window", "block", "recall", "precision"))
def knn_block_dist(k: int, xyz: jnp.ndarray, query: jnp.ndarray,
                   *, window: int = 1024, block: int = 256,
                   recall: float = 0.95, precision: str = "default"):
    """Morton-block approximate kNN.

    Args:
      k: neighbors per query (static).
      xyz: (B, N2, 3) keys; query: (B, S, 3). Requires S % block == 0 and
        window <= N2 (callers fall back to dense kNN otherwise).

    Returns (sq-dists (B,S,k), idx (B,S,k) int32 into the ORIGINAL key order).
    """
    B, S, _ = query.shape
    N2 = xyz.shape[1]
    nb = S // block
    assert S % block == 0 and window <= N2

    lo, hi = joint_bounds(query, xyz)
    code_q = morton_codes(query, lo, hi)              # (B, S)
    code_k = morton_codes(xyz, lo, hi)                # (B, N2)

    perm_q = jnp.argsort(code_q, axis=1)              # sorted-query order
    perm_k = jnp.argsort(code_k, axis=1)
    q_sorted = jnp.take_along_axis(query, perm_q[..., None], axis=1)
    k_sorted = jnp.take_along_axis(xyz, perm_k[..., None], axis=1)
    ck_sorted = jnp.take_along_axis(code_k, perm_k, axis=1)
    cq_sorted = jnp.take_along_axis(code_q, perm_q, axis=1)

    # window start per query block: median query code located in the sorted
    # key codes, clamped so the static-size slice stays in range
    centers = cq_sorted[:, block // 2::block]          # (B, nb)
    pos = jax.vmap(jnp.searchsorted)(ck_sorted, centers)
    start = jnp.clip(pos - window // 2, 0, N2 - window)  # (B, nb)

    # contiguous key windows: (B, nb, window) row indices into sorted keys
    widx = start[..., None] + jnp.arange(window)[None, None, :]
    kwin = jnp.take_along_axis(
        k_sorted, widx.reshape(B, nb * window)[..., None], axis=1
    ).reshape(B, nb, window, 3)

    qb = q_sorted.reshape(B, nb, block, 3)
    # d[q, j] = |q|² − 2 q·x + |x|²  (the MXU cross-term formulation the
    # reference also uses, pointconv_util.py:91-93)
    cross = jnp.einsum("bnqc,bnwc->bnqw", qb, kwin, precision=precision)
    d = (jnp.sum(qb * qb, axis=-1)[..., None]
         - 2.0 * cross
         + jnp.sum(kwin * kwin, axis=-1)[:, :, None, :])  # (B, nb, block, W)

    dist, local = jax.lax.approx_min_k(
        d.reshape(B * nb * block, window), k, recall_target=recall)
    dist = dist.reshape(B, S, k)
    local = local.reshape(B, nb, block, k)

    # local → sorted-key position → original key index
    sorted_pos = (local + start[:, :, None, None]).reshape(B, S, k)
    idx = jnp.take_along_axis(perm_k, sorted_pos.reshape(B, S * k),
                              axis=1).reshape(B, S, k).astype(jnp.int32)

    # back to caller's query order
    inv_q = jnp.argsort(perm_q, axis=1)
    dist = jnp.take_along_axis(dist, inv_q[..., None], axis=1)
    idx = jnp.take_along_axis(idx, inv_q[..., None], axis=1)
    return dist, idx
