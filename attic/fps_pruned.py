"""Pruned exact-FPS Pallas kernel (FlashFPS/QuickFPS-style, TPU-shaped).

NEGATIVE RESULT (round 3, measured on the real v5e): the pruned kernel is
~2x SLOWER than the plain folded kernel (ops/pallas/fps_pallas.py) despite
pruning ~half the distance work (mean dirty windows 3.9/8 on bundled
KITTI). On-chip, quiet host, 8192->2048:

    B=1: folded 2.14 ms, pruned 4.07 ms (0.53x)
    B=2: folded 2.42 ms, pruned 5.13 ms (0.47x)
    B=3: folded 2.36 ms, pruned 4.77 ms (0.49x)
    in-model teacher eval bs=1: 8.32 ms (folded) vs 11.32 ms (pruned)

Why: exact FPS on TPU is SERIAL-LATENCY-bound, not distance-compute-bound.
The folded kernel's full (R, 1024) distance+min pass is ~16 vregs of VPU
work — a small slice of its ~1.1 us/round wall; the rest is the argmax
fold, tie-break scan, coordinate extraction, and loop overhead on the
serial critical path. Pruning shrinks the cheap part and ADDS critical-path
latency per round: the bound test, two pack_bits roll-folds, SMEM
round-trips for the dirty mask, and W @pl.when branches. FLOP savings
cannot pay back critical-path additions in a latency-bound loop.

Kept for the ledger: the 2-level equal-count spatial sort, fat-window
quarantine, bit-packed SMEM masks, and the bm-cached argmax are reusable
pieces if Mosaic ever exposes cheaper scalar control flow. The kernel is
bit-exact vs reference FPS semantics at every tested shape, on-chip
(B in {1,2,3,6,8}; tests/test_ops.py pins interpret mode on CPU).

The folded FPS kernel (fps_pallas.py) pays a full (R, L) distance+min pass
plus a full-plane argmax and one-hot coordinate extraction on every one of
its npoint serial rounds. But FPS rounds are geometrically local: round
j's centroid c only LOWERS the running min-distance of points within
sqrt(temp) of c — every other point's update is a provable no-op, and the
argmax only needs per-region maxima. FlashFPS/QuickFPS exploit this on
GPUs with KD-trees (PAPERS.md); this kernel is the TPU-wide reformulation:

  * Points are spatially partitioned (XLA-side, `_spatial_permutation`)
    into 8·W sub-blocks of 128 points: a 2-level equal-count sort (widest
    axis → W slabs, slab-local widest axis → 8 sub-blocks each). Each
    sub-block lands on ONE ROW of one 128-lane WINDOW of the folded
    (R = 8B, L = N/8) layout, so a sub-block's running max is a per-(row,
    window) lane reduction and "skip window w" skips one static lane-slice
    of every vector op — the granularity the VPU can actually elide.
  * The fattest 8 sub-blocks per cloud (sparse far-field regions whose
    bounding spheres span the scene — they test dirty almost every round)
    are quarantined together into one sacrificial window; compact
    sub-blocks grouped spatially fill the rest. Measured on bundled KITTI
    (B=2 eval shape): mean dirty windows 3.9/8 vs 5.4/8 for Morton-run
    grouping.
  * Per round, the bound test runs VECTORIZED over all (row, window)
    pairs: sub-block (r, w) is provably untouched by centroid c iff
    dist(c, center) ≥ r_sphere + sqrt(bm[r, w]) (triangle inequality; a
    1e-4 multiplicative slop covers every f32 rounding in the chain, only
    ever costing a little pruning). The per-window dirty mask (OR over
    rows = both clouds) is bit-packed by one lane-weighted reduction into
    an SMEM scalar; W `@pl.when` branches update ONLY dirty windows.
  * bm (the cached per-sub-block maxima, maintained in the dirty branches)
    replaces the full-plane argmax: the global max folds out of (R, W)
    instead of (R, L), a second bit-mask marks the window(s) attaining it,
    and only those windows run the candidate scan + one-hot coordinate
    extraction.
  * f32 min/max are order-independent, per-point distance arithmetic is
    unchanged, and ties resolve by smallest ORIGINAL index (the index
    plane rides the permutation), so the selected index sequence is
    BIT-IDENTICAL to furthest_point_sample / the reference CUDA semantics
    (sampling_gpu.cu:93-209; exact-equality tested in tests/test_ops.py).

Mosaic notes: refs are sliced, never values (the layout pass rejects value
slicing — knn_fused.py); scalar predicates round-trip through SMEM
(vector→scalar crosses the VPU/scalar-unit boundary); all window slices
are static 128-lane ranges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WINDOW = 128          # lanes per window; one row of it = one sub-block
_SLOP_MUL = 1.0001     # multiplicative slop on the prune threshold
_SLOP_ADD = 1e-6       # additive slop (sqrt-space)


def _fps_kernel_pruned(npoint: int, B: int, n_total: int, unroll: int,
                       restrict_scan: bool,
                       x_ref, y_ref, z_ref, pidx_ref, cx_ref, cy_ref,
                       cz_ref, rad_ref, idx_ref,
                       temp_ref, bm_ref, cand_ref, acc_ref, bits_ref):
    """Refs: coords/pidx (R, L) permuted planes; centers/radii (R, W) with
    row r = sub-block (slot r//B) of cloud (r mod B); idx out (R, npoint);
    scratch: temp (R, L) f32, bm (R, W) f32, cand (R, 128) i32,
    acc (R, 128) f32, bits (2,) i32 SMEM."""
    R, L = x_ref.shape
    W = L // _WINDOW
    temp_ref[...] = jnp.full((R, L), 1e10, dtype=jnp.float32)
    bm_ref[...] = jnp.full((R, W), 1e10, dtype=jnp.float32)
    idx_ref[...] = jnp.zeros((R, npoint), jnp.int32)

    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (R, npoint), 1)
    wbit = jnp.left_shift(
        jnp.ones((R, W), jnp.int32),
        jax.lax.broadcasted_iota(jnp.int32, (R, W), 1))

    def fold(v, op, shifts):
        # rolled[r] = v[(r + s) mod R]; carried at native 128-lane width
        w = v.shape[-1]
        if w != 128:
            v = jnp.concatenate(
                [v, jnp.zeros((R, 128 - w), v.dtype)], axis=1)
        for s in shifts:
            v = op(v, pltpu.roll(v, R - s, axis=0))
        return v[:, :w]

    cloud_shifts = (B, 2 * B, 4 * B)       # per-cloud: window {r, r+B, ...}
    all_shifts = []                        # global OR: every row
    s = 1
    while s < R:
        all_shifts.append(s)
        s *= 2

    def pack_bits(mask_rw, slot):
        # (R, W) 0/1 → one int bitmask in SMEM (lane-weighted sum of row 0
        # after a global OR-fold put every window's OR in every row)
        m = fold(mask_rw, jnp.maximum, all_shifts)
        bits_ref[slot] = jnp.sum(m[0:1, :] * wbit[0:1, :])

    def body(j, last):                                   # last: (R, 3)
        # ---- prune test against cached sub-block maxima
        bm = bm_ref[...]
        d2c = ((cx_ref[...] - last[:, 0:1]) ** 2
               + (cy_ref[...] - last[:, 1:2]) ** 2
               + (cz_ref[...] - last[:, 2:3]) ** 2)      # (R, W)
        thr = (rad_ref[...] + jnp.sqrt(bm)) * _SLOP_MUL + _SLOP_ADD
        pack_bits((d2c < thr * thr).astype(jnp.int32), 0)

        # ---- distance+min update, dirty windows only
        dirty_bits = bits_ref[0]
        for w in range(W):
            @pl.when(jnp.bitwise_and(
                jax.lax.shift_right_logical(dirty_bits, w), 1) != 0)
            def _(w=w):
                sl = pl.ds(w * _WINDOW, _WINDOW)
                d = ((x_ref[:, sl] - last[:, 0:1]) ** 2
                     + (y_ref[:, sl] - last[:, 1:2]) ** 2
                     + (z_ref[:, sl] - last[:, 2:3]) ** 2)
                t = jnp.minimum(temp_ref[:, sl], d)
                temp_ref[:, sl] = t
                bm_ref[:, w:w + 1] = jnp.max(t, axis=1, keepdims=True)

        # ---- argmax from bm; winner-window candidate scan
        bm = bm_ref[...]
        m = fold(jnp.max(bm, axis=1, keepdims=True), jnp.maximum,
                 cloud_shifts)                           # (R, 1)
        if restrict_scan:
            pack_bits((bm == m).astype(jnp.int32), 1)
            win_bits = bits_ref[1]
            cand_ref[...] = jnp.full((R, 128), n_total, jnp.int32)
            for w in range(W):
                @pl.when(jnp.bitwise_and(
                    jax.lax.shift_right_logical(win_bits, w), 1) != 0)
                def _(w=w):
                    sl = pl.ds(w * _WINDOW, _WINDOW)
                    c = jnp.min(
                        jnp.where(temp_ref[:, sl] == m, pidx_ref[:, sl],
                                  n_total), axis=1, keepdims=True)
                    cand_ref[:, w:w + 1] = c
            rowmin = jnp.min(cand_ref[:, :W], axis=1, keepdims=True)
            new = fold(rowmin, jnp.minimum, cloud_shifts)      # (R, 1)
            idx_ref[...] = jnp.where(out_lanes == j, new, idx_ref[...])

            # ---- coordinate extraction, winner windows only
            acc_ref[...] = jnp.zeros((R, 128), jnp.float32)
            for w in range(W):
                @pl.when(jnp.bitwise_and(
                    jax.lax.shift_right_logical(win_bits, w), 1) != 0)
                def _(w=w):
                    sl = pl.ds(w * _WINDOW, _WINDOW)
                    onehot = (pidx_ref[:, sl] == new).astype(jnp.float32)
                    acc_ref[:, 0:3] = acc_ref[:, 0:3] + jnp.concatenate(
                        [jnp.sum(c_ref[:, sl] * onehot, axis=1,
                                 keepdims=True)
                         for c_ref in (x_ref, y_ref, z_ref)], axis=1)
            return fold(acc_ref[:, 0:3], jnp.add, cloud_shifts)

        # unrestricted fallback: full-plane candidate scan + extraction
        t = temp_ref[...]
        cand = jnp.min(jnp.where(t == m, pidx_ref[...], n_total), axis=1,
                       keepdims=True)
        new = fold(cand, jnp.minimum, cloud_shifts)
        idx_ref[...] = jnp.where(out_lanes == j, new, idx_ref[...])
        onehot = (pidx_ref[...] == new).astype(jnp.float32)
        partial = jnp.concatenate(
            [jnp.sum(c_ref[...] * onehot, axis=1, keepdims=True)
             for c_ref in (x_ref, y_ref, z_ref)], axis=1)
        return fold(partial, jnp.add, cloud_shifts)

    def seed_coords():
        # seed = ORIGINAL index 0 of every cloud (reference semantics)
        onehot = (pidx_ref[...] == 0).astype(jnp.float32)
        partial = jnp.concatenate(
            [jnp.sum(c_ref[...] * onehot, axis=1, keepdims=True)
             for c_ref in (x_ref, y_ref, z_ref)], axis=1)
        return fold(partial, jnp.add, cloud_shifts)

    total = npoint - 1
    chunks, rem = divmod(total, unroll)

    def chunk_body(c, last):
        j0 = 1 + c * unroll
        for i in range(unroll):
            last = body(j0 + i, last)
        return last

    last = jax.lax.fori_loop(0, chunks, chunk_body, seed_coords())
    for i in range(rem):
        last = body(1 + chunks * unroll + i, last)


def _spatial_permutation(xyz: jnp.ndarray, W: int):
    """2-level equal-count partition + fat-window regrouping.

    Returns (g (B, N) folded-position → original index, centers (B, 8·W, 3)
    ordered by (window, row) slot, radii (B, 8·W) same order).

    Level 1 sorts each cloud along its widest axis into W slabs; level 2
    sorts each slab along ITS widest axis into 8 sub-blocks of N/(8W)
    points. Sub-blocks are then assigned to (window, row) slots: the 8
    largest-radius sub-blocks share window 0 (they are sparse-region
    blocks that defeat sphere pruning — quarantining them keeps the other
    windows prunable), the rest fill windows 1.. ordered by their center
    along the level-1 axis (spatially coherent windows)."""
    B, N, _ = xyz.shape
    L = N // 8
    K = 8 * W                     # sub-blocks per cloud
    sbs = N // K                  # points per sub-block (= _WINDOW for l1)

    lo = jnp.min(xyz, axis=1)
    hi = jnp.max(xyz, axis=1)
    ax0 = jax.nn.one_hot(jnp.argmax(hi - lo, axis=1), 3, dtype=xyz.dtype)
    keys0 = jnp.sum(xyz * ax0[:, None, :], axis=-1)            # (B, N)
    o1 = jnp.argsort(keys0, axis=1).astype(jnp.int32)          # rank→orig

    sorted_xyz = jnp.take_along_axis(xyz, o1[..., None], axis=1)
    slabs = sorted_xyz.reshape(B, W, N // W, 3)
    ext = jnp.max(slabs, axis=2) - jnp.min(slabs, axis=2)      # (B, W, 3)
    ax1 = jax.nn.one_hot(jnp.argmax(ext, axis=-1), 3, dtype=xyz.dtype)
    keys1 = jnp.sum(slabs * ax1[:, :, None, :], axis=-1)       # (B, W, N/W)
    o2 = jnp.argsort(keys1, axis=-1).astype(jnp.int32)
    g0 = jnp.take_along_axis(o1.reshape(B, W, N // W), o2, axis=2)
    sub = g0.reshape(B, K, sbs)            # (b, sub-block, rank) → orig idx

    sub_xyz = jnp.take_along_axis(
        xyz, sub.reshape(B, K * sbs)[..., None], axis=1
    ).reshape(B, K, sbs, 3)
    centers = jnp.mean(sub_xyz, axis=2)                        # (B, K, 3)
    radii = jnp.sqrt(jnp.max(jnp.sum(
        (sub_xyz - centers[:, :, None, :]) ** 2, axis=-1), axis=2)
    ) * 1.00001                                                # (B, K)

    # slot assignment: fattest 8 → window 0; rest by center along axis 0
    fat_rank = jnp.argsort(jnp.argsort(-radii, axis=1), axis=1)
    ckey = jnp.sum(centers * ax0[:, None, :], axis=-1)
    span = (jnp.max(ckey, axis=1, keepdims=True)
            - jnp.min(ckey, axis=1, keepdims=True) + 1.0)
    key = jnp.where(fat_rank < 8,
                    jnp.min(ckey, axis=1, keepdims=True) - 10.0 * span
                    + fat_rank.astype(xyz.dtype),
                    ckey)
    slot_order = jnp.argsort(key, axis=1).astype(jnp.int32)    # slot→sub-blk

    # folded position p (cloud-local) → original index
    p = jnp.arange(N, dtype=jnp.int32)
    srow, lane = p // L, p % L
    wcol, l = lane // _WINDOW, lane % _WINDOW
    slot_p = wcol * 8 + srow                                   # (N,)
    k_p = jnp.take(slot_order, slot_p, axis=1)                 # (B, N)
    g = jnp.take_along_axis(sub.reshape(B, K * sbs),
                            k_p * sbs + l[None, :], axis=1)    # (B, N)

    # (window, row)-slot-ordered geometry: slot i = w·8 + s
    ordc = jnp.take_along_axis(centers, slot_order[..., None], axis=1)
    ordr = jnp.take_along_axis(radii, slot_order, axis=1)
    return g, ordc, ordr


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("interpret", "unroll", "restrict_scan"))
def furthest_point_sample_pruned(xyz: jnp.ndarray, npoint: int,
                                 *, interpret: bool = False,
                                 unroll: int = 8,
                                 restrict_scan: bool = True) -> jnp.ndarray:
    """(B, N, 3) → (B, npoint) int32, bit-identical to
    furthest_point_sample_pallas / the reference CUDA semantics.

    Requires N % 1024 == 0 (folded layout + 128-lane windows)."""
    B, N, _ = xyz.shape
    assert N % 1024 == 0, "pruned FPS needs N % 1024 == 0"
    xyz = xyz.astype(jnp.float32)
    L = N // 8
    W = L // _WINDOW

    g, ordc, ordr = _spatial_permutation(xyz, W)

    # permuted coordinate planes, folded-strided: cloud-local position p of
    # cloud b at row (p // L)·B + b, lane p % L — one flat row gather
    flat = jnp.take(xyz.reshape(B * N, 3),
                    (g + (jnp.arange(B, dtype=jnp.int32) * N)[:, None])
                    .reshape(-1), axis=0).reshape(B, N, 3)
    planes = [jnp.transpose(flat[:, :, i].reshape(B, 8, L), (1, 0, 2))
              .reshape(B * 8, L) for i in range(3)]
    pidx_plane = (jnp.transpose(g.reshape(B, 8, L), (1, 0, 2))
                  .reshape(B * 8, L))

    def slot_planes(a):
        # (B, W·8[, 3]) slot-ordered (slot = w·8 + s) → (R, W[, …]) with
        # row r = s·B + b ← slot (w = lane, s = r // B) of cloud r % B
        a = a.reshape((B, W, 8) + a.shape[2:])          # (b, w, s, …)
        a = jnp.moveaxis(a, 2, 1)                       # (b, s, w, …)
        a = jnp.moveaxis(a, 0, 1)                       # (s, b, w, …)
        return a.reshape((B * 8, W) + a.shape[3:])

    cplane = slot_planes(ordc)                          # (R, W, 3)
    cx, cy, cz = (cplane[..., i] for i in range(3))
    rad = slot_planes(ordr)                             # (R, W)

    idx = pl.pallas_call(
        functools.partial(_fps_kernel_pruned, npoint, B, N, unroll,
                          restrict_scan),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * 8, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B * 8, L), jnp.float32),
                        pltpu.VMEM((B * 8, W), jnp.float32),
                        pltpu.VMEM((B * 8, 128), jnp.int32),
                        pltpu.VMEM((B * 8, 128), jnp.float32),
                        pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(*planes, pidx_plane, cx, cy, cz, rad)
    return idx[:B]
