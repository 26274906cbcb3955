"""Index-gather primitives over point clouds.

TPU-native replacements for the reference CUDA gather/group ops
(pointnet2/src/sampling_gpu.cu:8-83, group_points_gpu.cu:8-67). Forward is a
plain XLA gather (take_along_axis); the backward pass XLA derives is a
deterministic segment-sum — an intentional improvement over the reference's
atomicAdd scatter, whose accumulation order is nondeterministic (SURVEY.md §5).
"""

from __future__ import annotations

import jax.numpy as jnp

# Debug safety net (advisor round-2 finding): mode="clip" on the hot path
# silently clamps any future invalid index to the last row. The CPU test
# suite (tests/conftest.py) flips this to True so out-of-bounds indices
# gather NaN fill values and surface as non-finite outputs in tests, where
# the extra full-tensor select costs nothing that matters.
DEBUG_OOB_FILL = False


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point rows: (B, N, C) × (B, S) → (B, S, C).

    Reference: index_points_gather (pointconv_util.py:109-120).

    mode="clip" matters on TPU: the default "fill" adds an out-of-bounds
    select over the WHOLE gathered tensor, which is free only while XLA can
    fuse it into an elementwise consumer — feeding a Pallas kernel it
    becomes its own full-size HBM pass (2×408 µs/forward at cross0,
    profiled). Indices here are valid by construction (kNN/FPS outputs);
    DEBUG_OOB_FILL restores a detectable fill value in the test suite.
    """
    mode = "fill" if DEBUG_OOB_FILL else "clip"
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32),
                               axis=1, mode=mode)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighborhoods: (B, N, C) × (B, S, K) → (B, S, K, C).

    Reference: index_points_group (pointconv_util.py:122-133).
    """
    B, S, K = idx.shape
    flat = gather_points(points, idx.reshape(B, S * K))
    return flat.reshape(B, S, K, points.shape[-1])


def group_points_kmajor(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighborhoods K-MAJOR: (B, N, C) × (B, S, K) → (B, K, S, C).

    Same rows as group_points, issued in k-major order so a query tile's K
    slabs are contiguous row ranges — the layout the fused pool kernel
    (ops/pallas/pool_fused.py) consumes without any relayout. The row gather
    itself is row-rate-bound and order-independent.
    """
    B, S, K = idx.shape
    idx_t = jnp.swapaxes(idx, 1, 2)                 # (B, K, S)
    flat = gather_points(points, idx_t.reshape(B, K * S))
    return flat.reshape(B, K, S, points.shape[-1])


def group_points_kmajor_packed(points: jnp.ndarray, idx: jnp.ndarray,
                               pack: int) -> jnp.ndarray:
    """K-major gather with `pack` consecutive queries per lane row:
    (B, N, C) × (B, S, K) → (B, K, S/pack, pack·C); row q holds queries
    q·pack … q·pack+pack−1 side by side.

    Why: XLA pads a minor dim of C=32 to the 128-lane tile PHYSICALLY, so a
    plain k-major gather writes 4×-padded rows and any later repack to dense
    128-lane rows is a real copy (0.18 ms per cross0 gather, profiled). Here
    `pack` interleaved gathers land in one lane-concatenated output — XLA
    fuses the concat into the gather fusion, emitting dense rows directly —
    which the pool kernel (pool_fused.py, packed_p) consumes with zero
    relayout. Row-read count is unchanged (gathers are row-rate-bound).
    """
    B, S, K = idx.shape
    C = points.shape[-1]
    idx_t = jnp.swapaxes(idx, 1, 2)                 # (B, K, S)
    parts = [
        gather_points(points, idx_t[:, :, p::pack].reshape(B, K * (S // pack)))
        .reshape(B, K, S // pack, C)
        for p in range(pack)
    ]
    return jnp.concatenate(parts, axis=-1)          # (B, K, S/pack, pack·C)
