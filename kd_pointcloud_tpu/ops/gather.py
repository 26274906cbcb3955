"""Index-gather primitives over point clouds.

TPU-native replacements for the reference CUDA gather/group ops
(pointnet2/src/sampling_gpu.cu:8-83, group_points_gpu.cu:8-67). The backward
pass is a deterministic scatter-add — an intentional improvement over the
reference's atomicAdd scatter, whose accumulation order is nondeterministic
(SURVEY.md §5).

Batched-gather performance (round-3 on-chip probe, /tmp/tpuq job 118): XLA's
gather WITH a batch dimension runs ~2× below the TPU gather engine's row rate
at B>=2 (l0-shaped probe, bs=3: 14.4 ms batched vs 7.9 ms when the batch dim
is folded into the row index), and the XLA-derived batched scatter-add
backward is ~2.4× slower than per-batch-element scatters (24 ms vs 10 ms).
gather_points therefore uses a custom VJP: forward folds batch into a flat
row index (a zero-batch-dim gather), backward unrolls one scatter-add per
batch element. Semantics are bit-identical to take_along_axis(mode="clip");
only the op decomposition changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Debug safety net (advisor round-2 finding): mode="clip" on the hot path
# silently clamps any future invalid index to the last row. The CPU test
# suite (tests/conftest.py) flips this to True so out-of-bounds indices
# gather NaN fill values and surface as non-finite outputs in tests, where
# the extra full-tensor select costs nothing that matters.
DEBUG_OOB_FILL = False


@jax.custom_vjp
def _gather_flat(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) × (B, S) int32 → (B, S, C), clip semantics.

    Forward: batch folded into the row index so XLA emits a ZERO-batch-dim
    gather (the fast row-rate path — see module docstring)."""
    B, N, C = points.shape
    idx_c = jnp.clip(idx, 0, N - 1)
    off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    flat = jnp.take(points.reshape(B * N, C),
                    (idx_c + off).reshape(-1), axis=0, mode="clip")
    return flat.reshape(B, idx.shape[1], C)


def _gather_flat_fwd(points, idx):
    return _gather_flat(points, idx), (idx, points.shape)


def _gather_flat_bwd(res, ct):
    idx, (B, N, C) = res
    idx_c = jnp.clip(idx, 0, N - 1)
    # one scatter-add per batch element: each is a zero-batch-dim scatter,
    # ~2.4× the row rate of the batched scatter XLA would derive (job 118)
    d = jnp.stack([
        jnp.zeros((N, C), ct.dtype).at[idx_c[b]].add(
            ct[b], mode="drop", unique_indices=False)
        for b in range(B)
    ])
    return d, np.zeros(idx.shape, jax.dtypes.float0)


_gather_flat.defvjp(_gather_flat_fwd, _gather_flat_bwd)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point rows: (B, N, C) × (B, S) → (B, S, C).

    Reference: index_points_gather (pointconv_util.py:109-120).

    Clip semantics matter on TPU: the default "fill" adds an out-of-bounds
    select over the WHOLE gathered tensor, which is free only while XLA can
    fuse it into an elementwise consumer — feeding a Pallas kernel it
    becomes its own full-size HBM pass (2×408 µs/forward at cross0,
    profiled). Indices here are valid by construction (kNN/FPS outputs);
    DEBUG_OOB_FILL restores a detectable fill value in the test suite.
    """
    if DEBUG_OOB_FILL:
        return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32),
                                   axis=1, mode="fill")
    return _gather_flat(points, idx.astype(jnp.int32))


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
