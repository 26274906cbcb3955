"""Pallas furthest-point-sampling kernel.

The XLA fori_loop FPS (ops/fps.py) pays per-iteration loop-sequencing
overhead (~5 µs × npoint iterations ≈ 10 ms for 8192→2048). This kernel runs
the whole sequential sweep inside ONE Pallas program with the coordinates and
the running min-distance matrix resident in VMEM, and — crucially — the whole
batch vectorized across sublanes: an iteration costs the same VPU cycles for
1 row or 8 rows, so both clouds of a pair (and the train-time batch) sample
for the price of one.

Semantics identical to ops/fps.py and the reference CUDA kernel
(pointnet2/src/sampling_gpu.cu:93-209): seed index 0, then argmax of the
running min-distance, first-index tie-break. Tested for exact index equality
vs the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint: int, x_ref, y_ref, z_ref, idx_ref, temp_ref):
    # refs: (B, N) coordinate planes; idx_ref (B, npoint) i32 out;
    # temp_ref (B, N) f32 scratch.
    B, n = x_ref.shape
    temp_ref[...] = jnp.full((B, n), 1e10, dtype=jnp.float32)
    idx_ref[...] = jnp.zeros((B, npoint), jnp.int32)

    xs = x_ref[...]
    ys = y_ref[...]
    zs = z_ref[...]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)

    def body(j, old):
        # old: (B, 1) — per-row index chosen last round. Gather its coords by
        # one-hot reduction (dynamic per-row lane addressing is VPU-hostile).
        onehot = (lanes == old).astype(jnp.float32)
        lx = jnp.sum(xs * onehot, axis=1, keepdims=True)
        ly = jnp.sum(ys * onehot, axis=1, keepdims=True)
        lz = jnp.sum(zs * onehot, axis=1, keepdims=True)
        d = (xs - lx) ** 2 + (ys - ly) ** 2 + (zs - lz) ** 2
        t = jnp.minimum(temp_ref[...], d)
        temp_ref[...] = t
        # per-row argmax via max + first-match-index reduction
        m = jnp.max(t, axis=1, keepdims=True)
        new = jnp.min(jnp.where(t == m, lanes, n), axis=1,
                      keepdims=True).astype(jnp.int32)
        idx_ref[...] = jnp.where(out_lanes == j, new, idx_ref[...])
        return new

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((B, 1), jnp.int32))


@functools.partial(jax.jit, static_argnums=(1,), static_argnames=("interpret",))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 *, interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3) → (B, npoint) int32. Single program, batch on sublanes."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    planes = [xyz[:, :, i] for i in range(3)]             # 3 × (B, N)

    return pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(*planes)
