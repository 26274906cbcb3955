"""Fused post-gather cross-pool: max_k mlp(leaky(g_k + v)).

The cross layers' pool (pointconv_util.py:1842-1848, after the linear-pos
factorization in nn/cross.py) lowers in XLA to gather → layout copy →
elementwise+dot loop fusions → reduce-max. On v5e the gather fusion itself is
row-rate-bound (~1.8 cycles/row — measured 143/287/670 GB/s at 32/64/128
lanes, i.e. linear in width) and near its floor, but XLA then inserts pure
layout copies around the (B,N,K,C) grouped tensor (~0.5 ms/forward at cross0:
f32[8192,32,32]{2,1,0}→{0,2,1} etc., profiled) because the reduce-max wants a
different minor dim than the dot. No XLA-level formulation avoids them
(measured: unrolled-slice max, strided-slice max, flat reshape max — all
equal or worse).

This kernel consumes the raw gather output directly in its natural layout
and does add + leaky + MLP + running-max in VMEM, so the grouped tensor
never re-enters HBM and the copies disappear:

  * the gather is issued k-major — indices (B, K, N) — and viewed as
    (B, K, N, C); k-major means a query tile's K slabs are contiguous row
    ranges, so the running max is K static leading-dim slices (no in-kernel
    relayout), and the query-side term v broadcasts over the leading K.
  * LANE PACKING: pool widths are 32 channels against 128-lane vregs, so a
    naive (…, C) block pads 4× everywhere (DMA, VPU, MXU). Instead P =
    128//C consecutive points ride one row: the gather output is VIEWED as
    (B, K, N/P, P·Cg) (pure reshape — rows are already adjacent in memory),
    v is scattered into a zero (B, N, Cg) at this round's channel offset
    and reshaped the same way, and every MLP layer becomes a block-diagonal
    weight (P copies; layer 1's blocks start at the co offset, which also
    absorbs the merged-gather channel selection — no in-kernel lane
    slicing). Lanes outside this round's half hit zero weight rows, so the
    out-of-round garbage never reaches the output. Same math, P× fewer
    padded rows.
  * dots run at HIGHEST precision (bf16x6 ≈ f32, negligible at these
    sizes) so pooled values track the f32 reference within test tolerance.

Training: gradients flow via jax.custom_vjp. For the production pools
(single MLP layer — every cross layer builds mlp=(c, c), so mlp[1:] is one
Dense) the backward is a second Pallas kernel (_bwd_kernel): it recomputes
h0/h1 per VMEM block at the same HIGHEST dot precision, applies the
tie-splitting max mask (eq/count — identical to jnp.max's VJP), and emits
d_g / d_v blocks plus grid-accumulated d_w / d_b, so the (B,K,N,C) grouped
intermediates never re-enter HBM on the backward either (the XLA recompute
backward cost ~17.7 ms of the 92 ms bs=3 train step — /tmp/tpuq job 145).
Deeper MLPs (experimental-only) keep the plain-XLA recompute VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST
# logical bytes per g block; physical cost is ~2× (double buffering) plus
# in-kernel temporaries, against ~16 MB VMEM. Swept on v5e (teacher eval
# forward): 512K 9.17 ms, 1M 9.15, 2M 9.04, 4M OOMs in the merged cross0
# pool — 2M is the knee.
_VMEM_BLOCK_BYTES = 2 * 1024 * 1024


def _leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def _kernel(n_layers, g_ref, v_ref, w1_ref, *rest):
    if n_layers > 1:
        wr_ref, b_ref, out_ref = rest
    else:
        b_ref, out_ref = rest
    _, K, TQ, Cin = g_ref.shape
    PC = out_ref.shape[-1]
    v = v_ref[0]                                    # (TQ, Cin)
    h = _leaky(g_ref[0] + v[None, :, :])            # (K, TQ, Cin)
    h = h.reshape(K * TQ, Cin)                      # leading-dim collapse
    h = _leaky(jnp.dot(h, w1_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=_HIGHEST) + b_ref[0])
    for layer in range(1, n_layers):
        h = _leaky(jnp.dot(h, wr_ref[layer - 1],
                           preferred_element_type=jnp.float32,
                           precision=_HIGHEST) + b_ref[layer])
    h = h.reshape(K, TQ, PC)
    acc = h[0]
    for k in range(1, K):                           # static contiguous slices
        acc = jnp.maximum(acc, h[k])
    out_ref[0] = acc


def _pool_ref(g_kmaj, v, ws, bs, co):
    """Plain XLA reference (identical math; used off-TPU and for the VJP).

    g_kmaj: (B, K, N, Cg) k-major gathered table rows; v: (B, N, C)."""
    C = v.shape[-1]
    g = g_kmaj[..., co:co + C]
    h = _leaky(g + v[:, None, :, :])                # (B, K, N, C)
    # promote so a float64 caller (the f64 parity harness) is not silently
    # accumulated in f32; on-TPU production inputs are f32 → unchanged
    acc = jnp.promote_types(h.dtype, jnp.float32)
    for w, b in zip(ws, bs):
        h = _leaky(jnp.dot(h, w.astype(acc), preferred_element_type=acc,
                           precision=_HIGHEST) + b.astype(acc))
    return jnp.max(h, axis=1)


def _tile_q(N: int, K: int, row_bytes: int) -> int:
    budget = max(8, _VMEM_BLOCK_BYTES // (K * row_bytes))
    tq = 1 << (budget.bit_length() - 1)             # pow2 ≤ budget
    while N % tq != 0 and tq > 1:
        tq //= 2
    return tq


def _block_diag(w, P, Cg, co):
    """(C, C) layer kernel → (P·Cg, P·C) block-diagonal: point p's rows sit
    at p·Cg + co (layer 1 absorbs the merged-gather channel offset)."""
    C = w.shape[1]
    out = jnp.zeros((P * Cg, P * C), w.dtype)
    for p in range(P):
        out = jax.lax.dynamic_update_slice(out, w, (p * Cg + co, p * C))
    return out


def _pool_pallas(g_kmaj, v, ws, bs, co, packed_p=1):
    if packed_p > 1:                # g arrives (B, K, N/P, P·Cg) pre-packed
        B, K, Np, Crow = g_kmaj.shape
        P = packed_p
        Cg = Crow // P
        N = Np * P
        gp = g_kmaj
    else:
        B, K, N, Cg = g_kmaj.shape
        C = v.shape[-1]
        P = max(1, 128 // C)
        while N % P != 0:
            P //= 2
        # lane packing: P points per row (module docstring)
        gp = g_kmaj.reshape(B, K, N // P, P * Cg)
    C = v.shape[-1]
    assert co % C == 0 and co + C <= Cg, (co, C, Cg)
    if co == 0 and Cg == C:
        v_full = v
    else:
        v_full = jnp.zeros(v.shape[:-1] + (Cg,), v.dtype)
        v_full = jax.lax.dynamic_update_slice_in_dim(v_full, v, co, axis=2)
    vp = v_full.reshape(B, N // P, P * Cg)

    w1 = _block_diag(ws[0], P, Cg, co)              # (P·Cg, P·C)
    wr = [_block_diag(w, P, C, 0) for w in ws[1:]]  # (P·C, P·C) each
    b = jnp.stack([jnp.tile(bi, P)[None, :] for bi in bs])   # (L, 1, P·C)

    Np, Cin, PC = N // P, P * Cg, P * C
    tq = _tile_q(Np, K, Cin * 4)
    grid = (B, Np // tq)
    n_layers = len(ws)

    in_specs = [
        pl.BlockSpec((1, K, tq, Cin), lambda bi, qi: (bi, 0, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, Cin), lambda bi, qi: (bi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),      # w1
    ]
    args = [gp, vp, w1]
    if n_layers > 1:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(jnp.stack(wr))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(b)

    out = pl.pallas_call(
        functools.partial(_kernel, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tq, PC), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, PC), jnp.float32),
    )(*args)
    return out.reshape(B, N, C)


def _bwd_kernel(g_ref, v_ref, w1_ref, b_ref, ct_ref,
                dg_ref, dv_ref, dw_ref, db_ref):
    """Single-MLP-layer pool backward over one (batch, query-tile) block.

    Recomputes the forward activations in VMEM (leaky' needs only the sign
    of the pre-activation, which leaky preserves — no saved activations),
    then walks the chain ct → max mask → Dense → add in place. dw/db map
    every grid step to the same output block, so they accumulate in VMEM
    across the whole grid and are written back once.
    """
    bi = pl.program_id(0)
    qi = pl.program_id(1)

    @pl.when(jnp.logical_and(bi == 0, qi == 0))
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    _, K, TQ, Cin = g_ref.shape
    PC = ct_ref.shape[-1]
    v = v_ref[0]                                    # (TQ, Cin)
    h0 = _leaky(g_ref[0] + v[None, :, :])           # (K, TQ, Cin)
    h0f = h0.reshape(K * TQ, Cin)
    h1 = _leaky(jnp.dot(h0f, w1_ref[...],
                        preferred_element_type=jnp.float32,
                        precision=_HIGHEST) + b_ref[0])
    h1 = h1.reshape(K, TQ, PC)
    acc = h1[0]
    for k in range(1, K):                           # same max as forward
        acc = jnp.maximum(acc, h1[k])
    eq = (h1 == acc[None]).astype(jnp.float32)      # (K, TQ, PC)
    cnt = eq[0]
    for k in range(1, K):
        cnt = cnt + eq[k]
    # jnp.max VJP semantics: cotangent split evenly among ties
    d_h1 = eq * (ct_ref[0] / cnt)[None]
    d_p1 = (d_h1 * jnp.where(h1 >= 0, 1.0, 0.1)).reshape(K * TQ, PC)
    dw_ref[...] = dw_ref[...] + jax.lax.dot_general(
        h0f, d_p1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST)
    db_ref[...] = db_ref[...] + jnp.sum(d_p1, axis=0)[None, :]
    d_h0 = jax.lax.dot_general(
        d_p1, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST)
    d_g = (d_h0 * jnp.where(h0f >= 0, 1.0, 0.1)).reshape(K, TQ, Cin)
    dg_ref[0] = d_g
    dv = d_g[0]
    for k in range(1, K):
        dv = dv + d_g[k]
    dv_ref[0] = dv


def _pool_bwd_pallas(g_kmaj, v, ws, bs, co, packed_p, ct):
    """Pallas backward for the single-layer pool. Returns cotangents in the
    caller's shapes: (d_g like g_kmaj, d_v, (d_w,), (d_b,))."""
    if packed_p > 1:
        B, K, Np, Crow = g_kmaj.shape
        P = packed_p
        Cg = Crow // P
        N = Np * P
        gp = g_kmaj
    else:
        B, K, N, Cg = g_kmaj.shape
        C = v.shape[-1]
        P = max(1, 128 // C)
        while N % P != 0:
            P //= 2
        gp = g_kmaj.reshape(B, K, N // P, P * Cg)
    C = v.shape[-1]
    if co == 0 and Cg == C:
        v_full = v
    else:
        v_full = jnp.zeros(v.shape[:-1] + (Cg,), v.dtype)
        v_full = jax.lax.dynamic_update_slice_in_dim(v_full, v, co, axis=2)
    vp = v_full.reshape(B, N // P, P * Cg)
    w1 = _block_diag(ws[0], P, Cg, co)              # (P·Cg, P·C)
    b = jnp.tile(bs[0], P)[None, :]                 # (1, P·C)
    ctp = ct.reshape(B, N // P, P * C)

    Np, Cin, PC = N // P, P * Cg, P * C
    # the backward holds ~4 g-sized temporaries live (h0, d_h0, d_g, the
    # block itself) — quarter the forward's block budget
    tq = _tile_q(Np, K, Cin * 4 * 4)
    grid = (B, Np // tq)

    dgp, dvp, dwf, dbf = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, tq, Cin), lambda bi, qi: (bi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, Cin), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec((1, tq, PC), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, tq, Cin), lambda bi, qi: (bi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, Cin), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, PC), lambda bi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC), lambda bi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, Np, Cin), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, Cin), jnp.float32),
            jax.ShapeDtypeStruct((Cin, PC), jnp.float32),
            jax.ShapeDtypeStruct((1, PC), jnp.float32),
        ],
    )(gp, vp, w1, b, ctp)

    d_g = dgp if packed_p > 1 else dgp.reshape(B, K, N, Cg)
    d_v = dvp.reshape(B, N, Cg)[..., co:co + C]
    # fold the block-diagonal weight/bias grads back onto the (C, C) kernel
    d_w = sum(jax.lax.dynamic_slice(dwf, (p * Cg + co, p * C), (C, C))
              for p in range(P))
    d_b = jnp.sum(dbf.reshape(P, C), axis=0)
    return d_g, d_v, (d_w,), (d_b,)


def _unpack(g, packed_p):
    """(B, K, N/P, P·Cg) packed rows → (B, K, N, Cg); pure reshape (row q's
    lane block p IS point q·P+p, matching group_points_kmajor_packed)."""
    B, K, Np, Crow = g.shape
    return g.reshape(B, K, Np * packed_p, Crow // packed_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pool_custom(g_kmaj, v, ws, bs, co, packed_p):
    return _pool_pallas(g_kmaj, v, ws, bs, co, packed_p)


def _pool_fwd(g_kmaj, v, ws, bs, co, packed_p):
    return (_pool_pallas(g_kmaj, v, ws, bs, co, packed_p),
            (g_kmaj, v, ws, bs))


def _pool_bwd(co, packed_p, res, ct):
    g_kmaj, v, ws, bs = res
    if len(ws) == 1:
        # production pools are all single-layer — fused Pallas backward
        # (_pool_custom is only entered on TPU with f32 inputs, so the
        # kernel's preconditions hold whenever the forward kernel ran)
        return _pool_bwd_pallas(g_kmaj, v, ws, bs, co, packed_p, ct)
    gu = _unpack(g_kmaj, packed_p) if packed_p > 1 else g_kmaj
    _, vjp = jax.vjp(
        lambda g, vv, w, b: _pool_ref(g, vv, w, b, co), gu, v, ws, bs)
    gg, gv, gws, gbs = vjp(ct)
    if packed_p > 1:
        gg = gg.reshape(g_kmaj.shape)
    return gg, gv, gws, gbs


_pool_custom.defvjp(_pool_fwd, _pool_bwd)


def pool_mlp_max(g_kmaj: jnp.ndarray, v: jnp.ndarray, weights, biases,
                 *, co: int = 0, packed_p: int = 1) -> jnp.ndarray:
    """max over K of mlp(leaky(g[..., co:co+C] + v)), channels-last.

    Args:
      g_kmaj: (B, K, N, Cg) gathered key-table rows, K-MAJOR (the caller
        gathers with indices transposed to (B, K, N)). Cg may exceed the
        pool width C when several rounds share one gather (nn/cross.py).
        With packed_p=P the caller passes the dense lane-packed form
        (B, K, N/P, P·Cg) from ops.group_points_kmajor_packed instead — the
        fast path (no repack copies; see module docstring).
      v: (B, N, C) query-side additive term; C = the pool width.
      weights/biases: per-layer (C, C) / (C,) MLP stacks (all equal widths,
        as in every production config).
      co: channel offset of this pool's half inside g_kmaj (multiple of C).

    Returns (B, N, C) pooled features.
    """
    # keep f64 weights for the off-TPU reference path (f64 parity harness);
    # the TPU kernel path below requires f32 and checks g_kmaj.dtype
    wdt = (jnp.float64 if any(jnp.asarray(w).dtype == jnp.float64
                              for w in weights) else jnp.float32)
    ws = tuple(jnp.asarray(w, wdt) for w in weights)
    bs = tuple(jnp.asarray(b, wdt) for b in biases)
    C = v.shape[-1]
    if packed_p > 1:
        B, K, Np, Crow = g_kmaj.shape
        P, Cg, N = packed_p, Crow // packed_p, Np * packed_p
    else:
        B, K, N, Cg = g_kmaj.shape
        P = max(1, 128 // C)
        while N % P != 0:
            P //= 2
    usable = (jax.default_backend() not in ("cpu", "gpu")
              and g_kmaj.dtype == jnp.float32 and co % C == 0
              and co + C <= Cg and all(w.shape == (C, C) for w in ws)
              and (K * _tile_q(N // P, K, P * Cg * 4)) % 8 == 0)
    if not usable:
        gu = _unpack(g_kmaj, packed_p) if packed_p > 1 else g_kmaj
        return _pool_ref(gu, v, ws, bs, co)
    return _pool_custom(g_kmaj, v, ws, bs, co, packed_p)
