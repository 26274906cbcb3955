"""Fused gather+MLP+maxpool pool kernel for cost-volume layers.

The cross layers' hot loop is `max_k mlp(leaky(u[idx[q,k]] + v[q]))`
(pointconv_util.py:1842-1848, after the linear-pos factorization in
nn/cross.py). In XLA the row gather `u[idx]` alone costs 1.7 ms for
(8192, K=32, C=32) on v5e — the single most expensive op class in the
forward pass, worse than the kNN itself (XLA's HLO gather moves ~19 GB/s
effective, ~2% of HBM bandwidth).

This kernel keeps the whole table u in VMEM (8192×32 f32 = 1 MB) and uses
Mosaic's native `tpu.dynamic_gather` (sublane gather, exposed through
`jnp.take_along_axis(x, idx, axis=0)` for same-shape 2-D operands): for each
neighbor slot k the idx column is lane-broadcast to (N, C) and one gather
pulls every query's k-th neighbor row at once. The grouped (N, K, C) tensor
never exists — not in HBM, not even in VMEM; each slot's (N, C) slice is
consumed by the add + leaky + (C×C) matmul + running max immediately.

Constraint: the gather primitive requires table and index shapes to match,
so N_queries must equal N_keys (true for every cross layer — both clouds
have the level's npoint). Callers with fewer keys than queries (IDW
upsample) zero-pad the table.

STATUS (round 2): NEGATIVE RESULT on current hardware/toolchain — Mosaic
lowers `tpu.dynamic_gather` only when the source spans a single vreg along
the gather dimension ("Multiple source vregs along gather dimension" on
v5e for any table taller than one vreg), so this kernel compiles in
interpret mode only. Kept as documentation of the design; production pools
stay on the XLA row gather, which measures row-bound at ~6 cycles/row
(ops/gather.py notes). Revisit if Mosaic grows multi-vreg dynamic_gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)   # LeakyReLU(0.1), blocks.py


def _kernel(K: int, n_layers: int, u_ref, v_ref, idx_ref, w_ref, b_ref,
            out_ref):
    N, C = v_ref.shape
    v = v_ref[...]
    u = u_ref[...]
    acc = jnp.full(out_ref.shape, NEG_INF, jnp.float32)
    for k in range(K):
        idx_col = jnp.broadcast_to(idx_ref[:, k:k + 1], (N, C))
        g = jnp.take_along_axis(u, idx_col, axis=0)        # tpu.dynamic_gather
        h = _leaky(g + v)
        for layer in range(n_layers):
            h = _leaky(jnp.dot(h, w_ref[layer],
                               preferred_element_type=jnp.float32)
                       + b_ref[layer])
        acc = jnp.maximum(acc, h)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_pool_fused(u: jnp.ndarray, v: jnp.ndarray, idx: jnp.ndarray,
                     weights, biases, *, interpret: bool = False):
    """max over K of mlp(leaky(u[idx] + v)), fully fused.

    Args:
      u: (B, N, C) key-side table (features + folded position encoding).
      v: (B, N, C) query-side term.
      idx: (B, N, K) int32 neighbor indices into u's N axis.
      weights/biases: lists of (C, C) / (C,) MLP layers applied after the
        additive grouping (all widths equal C in the production config).

    Returns (B, N, C).
    """
    B, N, C = u.shape
    K = idx.shape[-1]
    n_layers = len(weights)
    w = jnp.stack([jnp.asarray(wi, jnp.float32) for wi in weights])
    b = jnp.stack([jnp.asarray(bi, jnp.float32)[None, :] for bi in biases])

    u2 = u.astype(jnp.float32).reshape(B * N, C)
    v2 = v.astype(jnp.float32).reshape(B * N, C)
    idx2 = idx.astype(jnp.int32).reshape(B * N, K)

    out = pl.pallas_call(
        functools.partial(_kernel, K, n_layers),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((N, C), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, K), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, C), lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * N, C), jnp.float32),
        interpret=interpret,
    )(u2, v2, idx2, w, b)
    return out.reshape(B, N, C)
