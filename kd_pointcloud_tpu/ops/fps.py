"""Furthest-point sampling.

TPU-native equivalent of the reference CUDA kernel
(pointnet2/src/sampling_gpu.cu:93-209): seed at index 0, then m-1 sequential
rounds of "update running min-distance, pick the argmax". The running
min-distance vector stays device-resident inside a single lax.fori_loop, so the
whole sweep compiles to one XLA while loop (no host round trips). A
Pallas VMEM-resident variant lives in ops/pallas/fps_pallas.py for the hot
path; both produce identical indices (tested).

FPS has no gradient (the CUDA wrapper returns None for grads,
pointnet2/pointnet2_utils.py:31-33) — indices are integers, so JAX agrees for
free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          backend: str = "auto") -> jnp.ndarray:
    """Iterative furthest-point sampling.

    Args:
      xyz: (B, N, 3) points.
      npoint: number of samples (static).
      backend: "auto" (Pallas kernel on TPU, XLA loop elsewhere),
        "pallas", or "xla".

    Returns:
      (B, npoint) int32 indices into xyz. Index 0 is always the seed,
      matching sampling_gpu.cu:114-115.
    """
    if jax.default_backend() in ("cpu", "gpu"):
        # All backends select IDENTICAL indices; the Mosaic kernels only
        # exist on TPU, so off-TPU every choice lowers to the XLA loop.
        backend = "xla"
    elif backend == "auto":
        # NB: keep "xla" off the TPU — besides being slow, the XLA fori_loop
        # path MISCOMPILES on v5e at (B=6, N=8192, npoint=2048): its indices
        # diverge from a host numpy oracle while the Pallas kernel matches
        # it exactly (verified on real hardware, round 2).
        backend = "pallas"
    if backend == "pallas":
        # NB: a FlashFPS-style pruned variant was built and measured ~2x
        # SLOWER on-chip (exact FPS is serial-latency-bound, not
        # distance-compute-bound) — design + numbers in attic/fps_pruned.py.
        from .pallas.fps_pallas import furthest_point_sample_pallas
        return furthest_point_sample_pallas(xyz, npoint)
    if backend != "xla":
        raise ValueError(f"unknown FPS backend {backend!r} "
                         "(choices: auto, pallas, xla)")
    return _furthest_point_sample_xla(xyz, npoint)


def furthest_point_sample_blocked(xyz: jnp.ndarray, npoint: int,
                                  blocks: int,
                                  backend: str = "auto") -> jnp.ndarray:
    """Approximate FPS with a `blocks`×-shorter serial chain.

    Exact greedy FPS is serial in npoint (sampling_gpu.cu:93-209: each round
    depends on the previous argmax), which makes the l1 sweep
    (8192→2048) a latency wall no matter how wide the chip is. This
    relaxation partitions the N input rows into `blocks` contiguous chunks,
    runs EXACT FPS per chunk — all chunks ride the same kernel's batch
    vectorization, so the serial chain shrinks from npoint to
    npoint/blocks rounds — and interleaves the chunk orderings so that any
    PREFIX of the result is block-balanced (preserving the nested-FPS
    prefix property approximately: a prefix of length k holds ~k/blocks
    exact-FPS points of every chunk).

    A serving-preset knob (ModelConfig.fps_blocks), NOT the parity path:
    reference semantics are global FPS. Metric cost is measured by
    scripts/selftest_tpu.py --metrics like every serving relaxation.

    Requires N % blocks == 0 and npoint % blocks == 0 (falls back to exact
    FPS otherwise).
    """
    B, N, _ = xyz.shape
    if blocks <= 1 or N % blocks or npoint % blocks:
        return furthest_point_sample(xyz, npoint, backend)
    nb, sb = N // blocks, npoint // blocks
    idx = furthest_point_sample(xyz.reshape(B * blocks, nb, 3), sb, backend)
    off = (jnp.arange(blocks, dtype=jnp.int32) * nb)[None, :, None]
    idx = idx.reshape(B, blocks, sb) + off          # block-local → global
    return jnp.swapaxes(idx, 1, 2).reshape(B, npoint)


@functools.partial(jax.jit, static_argnums=(1,))
def _furthest_point_sample_xla(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    init_idx = jnp.zeros((B, npoint), dtype=jnp.int32)
    init_temp = jnp.full((B, N), 1e10, dtype=jnp.float32)
    init_last = xyz[:, 0, :]  # seed point coordinates

    def body(j, state):
        idxs, temp, last = state
        d = jnp.sum((xyz - last[:, None, :]) ** 2, axis=-1)  # (B, N)
        temp = jnp.minimum(temp, d)
        far = jnp.argmax(temp, axis=-1).astype(jnp.int32)    # (B,)
        idxs = jax.lax.dynamic_update_slice_in_dim(
            idxs, far[:, None], j, axis=1)
        last = jnp.take_along_axis(xyz, far[:, None, None], axis=1)[:, 0, :]
        return idxs, temp, last

    idxs, _, _ = jax.lax.fori_loop(1, npoint, body, (init_idx, init_temp, init_last))
    return idxs
