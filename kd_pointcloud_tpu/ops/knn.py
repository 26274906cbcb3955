"""k-nearest-neighbor search over point clouds.

Replaces the reference's dense (B, S, N) distance matrix + torch.topk
(pointconv_util.py:96-107). Two selection backends:

  * "exact"  — lax.top_k over the distance matrix (the parity path; slow on
    TPU: top_k over 8192 columns costs ~46 ms vs 2.5 ms for the distances).
  * "approx" — lax.approx_min_k, the TPU-native PartialReduce top-k
    (recall_target=0.95 measures ≈0.99 actual recall on real clouds at k=32
    and runs ~12× faster). All downstream consumers (max-pool over K,
    inverse-distance weighting) are permutation-invariant and tolerant to a
    swapped farthest neighbor, mirroring the reference's unsorted-topk
    contract.

The query axis can be processed in chunks so peak memory stays bounded at
chunk × N instead of S × N — the TPU analogue of "sequence-length" tiling for
the O(N²) neighbor search (SURVEY.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import square_distance

DEFAULT_RECALL = 0.95


def _select_k(d: jnp.ndarray, k: int, method: str, recall: float):
    if method in ("approx", "approx_vpu"):
        return jax.lax.approx_min_k(d, k, recall_target=recall)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx


def _chunk_topk(xyz, query_chunk, k, method, recall, precision):
    d = square_distance(query_chunk, xyz, precision)  # (B, Q, N)
    dist, idx = _select_k(d, k, method, recall)
    return dist, idx.astype(jnp.int32)


def _fused_ok(k: int, n_queries: int, n_keys: int) -> bool:
    """Shapes the fused Pallas kernel handles AND wins on (measured on v5e:
    1.29 ms vs 2.67 for 8192² k=32, 1.0 vs 1.55 at 2048 keys; below 2048
    keys approx_min_k's selection is already cheap)."""
    return (n_keys >= 2048 and n_keys % 1024 == 0
            and n_queries % 128 == 0 and k <= 64)


def _fused_call(k, xyz, query, precision, index_only=False, mode="ff"):
    from .gather import group_points
    from .pallas.knn_fused import knn_fused
    S = query.shape[1]
    N2 = xyz.shape[1]
    # measured optimum on v5e (round-5 fuse_min A/B, evidence/round5/
    # job404): tq=512 at the square shapes (8192² fmin 0.79 vs scratch
    # 0.84 ms; 2048² 0.66 vs 0.74), but the tall-skinny upsample shape
    # (8192 queries × 2048 keys) wants tq=256 (0.74 vs 1.09 at tq=512 —
    # the smaller output tile double-buffers better against the short
    # key panel)
    if N2 <= 2048 and S >= 2 * N2 and S % 256 == 0:
        tq = 256
    else:
        tq = 512 if S % 512 == 0 else (256 if S % 256 == 0 else 128)
    # All fused searches select with the float-float single-MXU-pass
    # distance ("ff", knn_fused docstring) — same measured recall as the
    # exact-f32 VPU variant (0.987 at 8192² k=32 on KITTI), 1.22 ms vs
    # 1.55. fuse_min (round 5): the per-G-block MXU dot is packed-min'd in
    # place of the (TQ, N2) f32 VMEM scratch round trip — BIT-IDENTICAL
    # indices at every production shape (job 404), 6-35% faster. Indices
    # are non-differentiable and the kernel has no VJP — cut tangents so
    # training's JVP never reaches it.
    d_sel, idx = knn_fused(jax.lax.stop_gradient(query),
                           jax.lax.stop_gradient(xyz), k, n_groups=1024,
                           tq=tq, precision=precision, mode=mode,
                           fuse_min=(mode != "vpu"))
    if index_only:
        return d_sel, idx
    # Distance consumers (3-NN IDW weights) get EXACT d² recomputed from
    # the gathered coordinates — like the reference's warp
    # (pointconv_util.py:2131-2133) and with the gradient flowing through
    # the positions, not the selection. This replaces the kernel's
    # masked-mantissa distances on the production path entirely (the VPU
    # variant remains for comparison/selftest).
    nbr = group_points(xyz, idx)                    # (B, S, k, 3)
    d2 = jnp.sum((query[:, :, None, :] - nbr) ** 2, axis=-1)
    return d2, idx


def _use_fused(method: str, k: int, query, xyz) -> bool:
    # this image's TPU registers as platform "axon" (remote v5e tunnel).
    # The kernel's embeddings are built for 3-D COORDINATES — the FG
    # family's feature-space kNN (nn/cross.py _fg_idx_bid: 100+-dim
    # "positions") must take the approx_min_k path. "approx_vpu" is the
    # isolation-probe arm selecting the exact-f32 VPU distance variant of
    # the fused kernel instead of the float-float MXU one (VERDICT r4 #2).
    return (method in ("approx", "approx_vpu")
            and jax.default_backend() in ("tpu", "axon")
            and query.shape[-1] == 3 and xyz.shape[-1] == 3
            and _fused_ok(k, query.shape[1], xyz.shape[1]))


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("chunk", "method", "recall", "precision"))
def knn_point(k: int, xyz: jnp.ndarray, query: jnp.ndarray,
              *, chunk: int | None = 2048, method: str = "exact",
              recall: float = DEFAULT_RECALL,
              precision: str = "highest") -> jnp.ndarray:
    """Indices of the k nearest points in `xyz` for each point in `query`.

    Args:
      k: number of neighbors (static).
      xyz: (B, N, 3) reference cloud.
      query: (B, S, 3) query points.
      chunk: query-axis chunk size bounding the (chunk, N) distance tile;
        None disables chunking.
      method: "exact" | "approx" (see module docstring).
      recall: approx_min_k recall target.

    Returns:
      (B, S, k) int32 neighbor indices into `xyz`.

    Reference semantics: pointconv_util.py:96-107 (unsorted smallest-k).

    Approx queries on >=2048-key sets route to the fused Pallas kernel
    (ops/pallas/knn_fused.py: VPU distance tile + packed stride-min +
    in-kernel exact top-k — no N² HBM matrix, no approx_min_k partial
    reduce).
    """
    if _use_fused(method, k, query, xyz):
        return _fused_call(k, xyz, query, precision, index_only=True,
                           mode="vpu" if method == "approx_vpu" else "ff")[1]
    return knn_point_dist(k, xyz, query, chunk=chunk, method=method,
                          recall=recall, precision=precision)[1]


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("chunk", "method", "recall", "precision"))
def knn_point_dist(k: int, xyz: jnp.ndarray, query: jnp.ndarray,
                   *, chunk: int | None = 2048, method: str = "exact",
                   recall: float = DEFAULT_RECALL, precision: str = "highest"):
    """Like knn_point but also returns the squared distances (B, S, k).

    Fused-path distances are EXACT f32, recomputed from the gathered
    neighbor coordinates after the approximate selection (the kernel's own
    masked-mantissa values are used for selection only), with gradients
    flowing through the positions — matching the reference's recompute
    pattern (pointconv_util.py:2131-2133).
    """
    if _use_fused(method, k, query, xyz):
        return _fused_call(k, xyz, query, precision,
                           mode="vpu" if method == "approx_vpu" else "ff")
    B, S, _ = query.shape
    if chunk is None or S <= chunk or S % chunk != 0:
        return _chunk_topk(xyz, query, k, method, recall, precision)

    n_chunks = S // chunk
    q = query.reshape(B, n_chunks, chunk, query.shape[-1])

    def scan_body(carry, q_chunk):
        d, idx = _chunk_topk(xyz, q_chunk, k, method, recall, precision)
        return carry, (d, idx)

    _, (d, idx) = jax.lax.scan(scan_body, None, jnp.swapaxes(q, 0, 1))
    d = jnp.swapaxes(d, 0, 1).reshape(B, S, k)
    idx = jnp.swapaxes(idx, 0, 1).reshape(B, S, k)
    return d, idx
