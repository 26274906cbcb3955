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


def _fps_kernel_folded(npoint: int, B: int, unroll: int, payload: bool,
                       x_ref, y_ref, z_ref, idx_ref, temp_ref):
    """Folded STRIDED layout: cloud b occupies sublane rows ≡ b (mod B);
    point p of cloud b lives at (p//L · B + b, p%L). Full-sublane occupancy
    makes every (R, L) pass 8× cheaper than the (B, N) layout (B eval-time
    is 2 of 8 sublanes), and the stride makes per-cloud sublane reductions
    a 3-step circular roll-fold with shifts B·{1,2,4}: row r's window
    {r, r+B, …, r+7B} (mod 8B) is exactly its own cloud, so EVERY row ends
    up holding its cloud's full reduction — no leader extraction, no
    matmuls. Fold intermediates are carried at the native 128-lane vreg
    width (skinny (R, 1) operands make Mosaic relayout around every roll,
    which dominates the loop)."""
    R, L = x_ref.shape                      # R = 8B
    n = 8 * L                               # points per cloud
    temp_ref[...] = jnp.full((R, L), 1e10, dtype=jnp.float32)
    idx_ref[...] = jnp.zeros((R, npoint), jnp.int32)

    xs = x_ref[...]
    ys = y_ref[...]
    zs = z_ref[...]
    pidx = (jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) // B * L
            + jax.lax.broadcasted_iota(jnp.int32, (R, L), 1))
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (R, npoint), 1)

    def fold(v, op):
        # rolled[r] = v[(r + s) mod R] (pltpu.roll needs non-negative
        # shifts); v carried at 128 lanes — native vreg width
        w = v.shape[-1]
        if w != 128:
            v = jnp.concatenate(
                [v, jnp.zeros((R, 128 - w), v.dtype)], axis=1)
        for s in (B, 2 * B, 4 * B):
            v = op(v, pltpu.roll(v, R - s, axis=0))
        return v[:, :w]

    def pad128(v):
        return jnp.concatenate(
            [v, jnp.zeros((R, 128 - v.shape[-1]), v.dtype)], axis=1)

    def fold_pair(m, c):
        # lexicographic circular roll-fold of (row-max, row-candidate)
        # pairs: larger m wins, ties broken by smaller index c — one 3-step
        # fold instead of the former fold(max) -> full-plane where ->
        # fold(min) chain (two 3-step folds in SERIES). FPS rounds are
        # latency-bound (attic/fps_pruned.py), so halving the serial fold
        # chain is the lever; the two rolls per step are independent and
        # the compare/selects are one vreg wide.
        m, c = pad128(m), pad128(c)
        for s in (B, 2 * B, 4 * B):
            mr = pltpu.roll(m, R - s, axis=0)
            cr = pltpu.roll(c, R - s, axis=0)
            take = (mr > m) | ((mr == m) & (cr < c))
            m = jnp.where(take, mr, m)
            c = jnp.where(take, cr, c)
        return c[:, :1]

    def gather_coords(new):
        # one-hot over the (R, L) plane: exactly one hit per cloud; the add
        # fold turns per-row partial sums into per-cloud sums on every row
        onehot = (pidx == new).astype(jnp.float32)
        partial = jnp.concatenate(
            [jnp.sum(c * onehot, axis=1, keepdims=True)
             for c in (xs, ys, zs)], axis=1)              # (R, 3)
        return fold(partial, jnp.add)

    def fold_payload(m, c, px, py, pz):
        # pair fold with the candidate's COORDS riding the same selects:
        # removes the whole post-fold one-hot gather + add-fold stage from
        # the serial chain (the one-hot gather happens per-row BEFORE the
        # fold, off the cross-row critical path). A/B'd on-chip vs the
        # pair fold; the banked-variant negative result (ROUND3_NOTES)
        # carried payloads over ~13 fold steps — this is 3.
        m, c = pad128(m), pad128(c)
        px, py, pz = pad128(px), pad128(py), pad128(pz)
        for s in (B, 2 * B, 4 * B):
            mr = pltpu.roll(m, R - s, axis=0)
            cr = pltpu.roll(c, R - s, axis=0)
            take = (mr > m) | ((mr == m) & (cr < c))
            m = jnp.where(take, mr, m)
            c = jnp.where(take, cr, c)
            px = jnp.where(take, pltpu.roll(px, R - s, axis=0), px)
            py = jnp.where(take, pltpu.roll(py, R - s, axis=0), py)
            pz = jnp.where(take, pltpu.roll(pz, R - s, axis=0), pz)
        return c[:, :1], jnp.concatenate(
            [px[:, :1], py[:, :1], pz[:, :1]], axis=1)

    def body(j, last):
        d = ((xs - last[:, 0:1]) ** 2 + (ys - last[:, 1:2]) ** 2
             + (zs - last[:, 2:3]) ** 2)
        t = jnp.minimum(temp_ref[...], d)
        temp_ref[...] = t
        # per-ROW max + first-index candidate, then ONE lexicographic fold
        # across the cloud's 8 strided rows (same winner as the global
        # max/where/min chain: the cloud winner is the max-m row's first
        # argmax lane, ties across rows broken by smaller point index)
        mrow = jnp.max(t, axis=1, keepdims=True)
        crow = jnp.min(jnp.where(t == mrow, pidx, n), axis=1, keepdims=True)
        if payload:
            # per-row one-hot gather of the row's OWN candidate coords
            # (exactly one hit per row), folded alongside (m, c)
            onehot = (pidx == crow).astype(jnp.float32)
            pr = [jnp.sum(cc * onehot, axis=1, keepdims=True)
                  for cc in (xs, ys, zs)]
            new, nxt = fold_payload(mrow, crow, *pr)
            idx_ref[...] = jnp.where(out_lanes == j, new, idx_ref[...])
            return nxt
        new = fold_pair(mrow, crow)                        # (R, 1) int32
        idx_ref[...] = jnp.where(out_lanes == j, new, idx_ref[...])
        return gather_coords(new)

    # manual unroll (Mosaic's fori_loop only supports unroll ∈ {1, all}):
    # amortizes loop sequencing over `unroll` fully serial iterations
    total = npoint - 1
    chunks, rem = divmod(total, unroll)

    def chunk_body(c, last):
        j0 = 1 + c * unroll
        for i in range(unroll):
            last = body(j0 + i, last)
        return last

    last = jax.lax.fori_loop(0, chunks, chunk_body,
                             gather_coords(jnp.zeros((R, 1), jnp.int32)))
    for i in range(rem):
        last = body(1 + chunks * unroll + i, last)


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


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("interpret", "unroll", "payload"))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 *, interpret: bool = False,
                                 unroll: int = 32,
                                 payload: bool = True) -> jnp.ndarray:
    """(B, N, 3) → (B, npoint) int32. Single program, batch on sublanes;
    clouds with N a multiple of 1024 additionally fold each cloud over 8
    sublane rows (full VPU occupancy — ~5× faster at the l1 8192→2048
    sweep, identical indices).

    payload=True (default) folds the winner's coords through the same
    lexicographic selects; measured on-chip at 8192→2048 (round-4 job
    212b, bit-exact at every shape): round-3 kernel / pair fold / payload
    fold = 2.42 / 1.70 / 1.66 ms at B=2 (the eval-bs=1 in-model batch),
    2.36 / 1.85 / 1.74 at B=3, ~2.5 / 2.00 / 1.88 at B=6. The pair fold
    wins marginally at B=1 only (1.61 vs 1.64); payload is the default."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    if N % 1024 == 0:
        L = N // 8
        # strided layout: row s·B + b ← cloud b, sublane-chunk s
        planes = [jnp.transpose(xyz[:, :, i].reshape(B, 8, L), (1, 0, 2))
                  .reshape(B * 8, L) for i in range(3)]
        idx = pl.pallas_call(
            functools.partial(_fps_kernel_folded, npoint, B, unroll, payload),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * 8, npoint), jnp.int32),
            scratch_shapes=[pltpu.VMEM((B * 8, L), jnp.float32)],
            interpret=interpret,
        )(*planes)
        return idx[:B]              # rows 0..B-1 are clouds 0..B-1 (s = 0)

    planes = [xyz[:, :, i] for i in range(3)]             # 3 × (B, N)
    return pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(*planes)
