"""Fused Pallas kNN v2: one-matmul distance tile + packed stride-min + exact
in-kernel top-k extraction.

Replaces the dense `lax.approx_min_k` path (ops/knn.py) for the big levels.
The reference materializes the full (B,S,N) distance matrix + torch.topk
(pointconv_util.py:96-107); `approx_min_k` fuses the distance producer but
still pays a partial-reduce over all N2 key lanes — measured 2.4 ms per
8192² kNN on v5e, the dominant forward-pass cost (two of these per cross0).

Design notes (fixing round-1's 4.0-4.5 ms attempts, ops/pallas/knn_pallas.py):

  * ONE MXU dot per query tile computes the whole (TQ, N2) distance block:
    queries are embedded as rows [x, y, z, |q|², 1, 0...] and keys as columns
    [−2x, −2y, −2z, 1, |k|², 0...]₁₂₈, so q·k = |q|² − 2q·k + |k|² — the
    exact squared distance, non-negative by construction (safe for the
    packed-int trick below). Round 1 instead did 16 small matmuls plus
    per-pass sublane/lane broadcasts of the norm terms, which dominated the
    schedule.
  * The distance block lands in a VMEM scratch; Mosaic ref-slicing (not
    value-slicing, which crashes its layout pass) feeds G-lane packed-min
    passes: packed = (bitcast(d) & ~((1<<n2_bits)-1)) | key_index. Positive
    f32 order identically as int32, so a single int `min` tracks both the
    group-min distance and its argmin. Masking the low 13 bits costs ~1e-3
    relative distance precision — selection-only noise.
  * Groups are lane-STRIDE classes {g, g+G, ...}: a true top-k neighbor is
    lost only when two of the k land in the same class (birthday bound
    k(k−1)/2G ≈ 1.5% at k=32, G=1024 — same approximation family as
    `approx_min_k` at recall_target 0.95).
  * Optional exact top-k over the G survivors IN-KERNEL: k rounds of
    (lane-min → match-mask → retire). Packed values are unique (low bits =
    key index), so the match selects exactly one lane per round. This kills
    the follow-up XLA `approx_min_k` pass and shrinks the kernel output from
    (S, G) to (S, k).

Returned distances carry the masked mantissa (≤1e-3 relative error);
consumers needing exact distances recompute them from the gathered
coordinates (all production consumers — max-pool cost volumes, IDW weights —
tolerate this, matching the unsorted-topk contract of the reference).

mode="ff" (error-free-transform distance, for INDEX-ONLY searches): each
coordinate and squared norm is split into three bf16 parts (hi/mid/lo, the
float-float trick), and the six significant cross products ride extra
contraction lanes of ONE DEFAULT-precision MXU dot — bf16×bf16 products are
exact in the f32 accumulator, so the only dropped terms are O(1e-4) absolute
(vs the six-pass bf16 HIGHEST dot, or ~19 VPU passes for the broadcast-FMA
variant). A +0.01 bias on |q|² keeps distances positive for the packed-int
min. Measured on KITTI scene 0 (8192², k=32): recall 0.987 = the VPU path's,
1.22 ms vs 1.55. The biased-and-masked distances are NOT returned to
consumers — knn_point discards them; distance consumers (IDW) stay on the
exact-f32 VPU variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = jnp.iinfo(jnp.int32).max


def _embed_queries(query: jnp.ndarray) -> jnp.ndarray:
    """(B, N1, 3) → (B·N1, 128) rows [x, y, z, |q|², 1, 0...]."""
    B, N1, _ = query.shape
    q = query.astype(jnp.float32)
    s2 = jnp.sum(q * q, axis=-1, keepdims=True)
    ones = jnp.ones_like(s2)
    emb = jnp.concatenate([q, s2, ones], axis=-1)          # (B, N1, 5)
    return jnp.pad(emb, ((0, 0), (0, 0), (0, 123))).reshape(B * N1, 128)


def _embed_keys(xyz: jnp.ndarray) -> jnp.ndarray:
    """(B, N2, 3) → (B·128, N2) columns [−2x, −2y, −2z, 1, |k|², 0...]."""
    B, N2, _ = xyz.shape
    k = xyz.astype(jnp.float32)
    s2 = jnp.sum(k * k, axis=-1, keepdims=True)
    ones = jnp.ones_like(s2)
    emb = jnp.concatenate([-2.0 * k, ones, s2], axis=-1)   # (B, N2, 5)
    emb = jnp.pad(emb, ((0, 0), (0, 0), (0, 123)))         # (B, N2, 128)
    return jnp.swapaxes(emb, 1, 2).reshape(B * 128, N2)


def _split3(x: jnp.ndarray):
    """Error-free 3-way bf16 split: x ≈ h + m + l with each part exactly
    bf16-representable (residual ~4e-3³·|x| ≈ 1e-7 relative).

    MUST use lax.reduce_precision, not a bf16 round-trip cast: XLA's
    algebraic simplifier elides convert_f32(convert_bf16(x)) chains when x
    is a traced argument, turning the residuals x − h into exact zeros —
    the split silently degenerates to plain bf16 and kNN recall collapses
    to 0.15 on metric-scale clouds (caught by scripts/selftest_tpu.py; the
    constant-folded path evaluates the rounding correctly, which is why
    interpret-mode and closed-over-input tests passed). reduce_precision is
    the semantically explicit rounding XLA cannot remove."""
    h = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    m = jax.lax.reduce_precision(x - h, exponent_bits=8, mantissa_bits=7)
    l = x - h - m          # rounded once at the final bf16 embedding cast
    return h, m, l


_FF_BIAS = 0.01  # added to |q|²: keeps d>0 under the ~1e-4 dropped-term error


def _embed_queries_ff(query: jnp.ndarray) -> jnp.ndarray:
    """(B, N1, 3) → bf16 (B·N1, 128) float-float rows.

    Lane pairing with _embed_keys_ff (q-side · k-side, 24 lanes):
      [qh·(−2kh), qh·(−2km), qm·(−2kh), qh·(−2kl), ql·(−2kh), qm·(−2km),
       nq_h·1, nq_m·1, nq_l·1, 1·nk_h, 1·nk_m, 1·nk_l]
    = −2q·k + |q|² + |k|² + bias, up to O(1e-4) dropped cross terms."""
    B, N1, _ = query.shape
    qf = query.astype(jnp.float32)
    qh, qm, ql = _split3(qf)
    n = jnp.sum(qf * qf, axis=-1, keepdims=True) + _FF_BIAS
    nh, nm, nl = _split3(n)
    one = jnp.ones_like(n)
    emb = jnp.concatenate([qh, qh, qm, qh, ql, qm,
                           nh, nm, nl, one, one, one], axis=-1)   # 24 lanes
    emb = jnp.pad(emb, ((0, 0), (0, 0), (0, 104)))
    return jnp.asarray(emb, jnp.bfloat16).reshape(B * N1, 128)


def _embed_keys_ff(xyz: jnp.ndarray) -> jnp.ndarray:
    """(B, N2, 3) → bf16 (B·128, N2) float-float columns (see queries)."""
    B, N2, _ = xyz.shape
    kf = xyz.astype(jnp.float32)
    kh, km, kl = _split3(-2.0 * kf)
    n = jnp.sum(kf * kf, axis=-1, keepdims=True)
    nh, nm, nl = _split3(n)
    one = jnp.ones_like(n)
    emb = jnp.concatenate([kh, km, kh, kl, kh, km,
                           one, one, one, nh, nm, nl], axis=-1)
    emb = jnp.pad(emb, ((0, 0), (0, 0), (0, 104)))
    emb = jnp.asarray(emb, jnp.bfloat16)
    return jnp.swapaxes(emb, 1, 2).reshape(B * 128, N2)


def _kernel(n_groups: int, n2_bits: int, k: int, extract: bool,
            precision, vpu: bool, stage_a: bool, fuse_min: bool,
            xq_ref, xk_ref, out_ref, d_scratch=None):
    TQ = xq_ref.shape[0]
    N2 = xk_ref.shape[1]
    G = n_groups
    mask = jnp.int32(~((1 << n2_bits) - 1))
    lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, G), 1)

    if fuse_min and not vpu:
        # fused dot+min (round 5): one (TQ, G) MXU dot per G-column block,
        # packed-min'd immediately — the (TQ, N2) f32 distance block never
        # exists, killing its VMEM write+read round trip (16 MB per tile at
        # tq=512, 8192 keys) and the scratch allocation itself. Same math
        # and packing as the scratch path; MXU work unchanged (8 dots of
        # contraction 128 × output G instead of 1 of output N2).
        acc = jnp.full((TQ, G), INT32_MAX, jnp.int32)
        for p in range(N2 // G):
            d = jnp.dot(xq_ref[...], xk_ref[:, p * G:(p + 1) * G],
                        preferred_element_type=jnp.float32,
                        precision=precision)
            packed = (pltpu.bitcast(d, jnp.int32) & mask) | (lane + p * G)
            acc = jnp.minimum(acc, packed)
        _extract_topk(acc, n_groups, k, extract, stage_a, out_ref)
        return

    if vpu:
        # VPU variant: per-channel broadcast subtract-square into the
        # scratch — exact f32, no MXU. The distance dot burns 128
        # contraction lanes for 5 real ones (×6 HIGHEST passes ≈ 150× FLOP
        # padding); three broadcast FMAs over (TQ, N2) are cheaper. Unlike
        # the round-1 kernels, the broadcasts happen ONCE per tile (into
        # the full-width scratch), not once per G-slice pass — per-pass
        # lane/sublane relayouts were what sank those kernels.
        # key rows hold −2·coord (dot embedding); −k = 0.5 · row
        d = jnp.zeros((TQ, N2), jnp.float32)
        for c in range(3):
            diff = xq_ref[:, c:c + 1] + 0.5 * xk_ref[c:c + 1, :]
            d = d + diff * diff
        d_scratch[...] = d
    else:
        # one MXU dot: exact squared distances for the whole tile.
        # Precision must be HIGHEST (6-pass bf16 ≈ f32 products): |q|²/|k|²
        # reach O(10³) on KITTI while true NN distances are O(10⁻³) —
        # single-pass bf16 products wipe out the cancellation (measured
        # recall 0.15 vs 0.99; the same failure applies to ANY bf16
        # distance matmul on metric-scale clouds, including lax.approx_min_k
        # over a default-precision square_distance: recall 0.26 on KITTI
        # scene 0). Mosaic supports only DEFAULT and HIGHEST.
        d_scratch[...] = jnp.dot(xq_ref[...], xk_ref[...],
                                 preferred_element_type=jnp.float32,
                                 precision=precision)

    acc = jnp.full((TQ, G), INT32_MAX, jnp.int32)
    for p in range(N2 // G):
        d = d_scratch[:, p * G:(p + 1) * G]                # ref slice
        packed = (pltpu.bitcast(d, jnp.int32) & mask) | (lane + p * G)
        acc = jnp.minimum(acc, packed)

    _extract_topk(acc, n_groups, k, extract, stage_a, out_ref)


def _extract_topk(acc, n_groups, k, extract, stage_a, out_ref):
    G = n_groups
    if not extract:
        out_ref[...] = acc
        return

    # ---- stage A (round-4): shrink the extraction set G → G/2 with a
    # one-time smallest-4-of-8 selection network across the eight 128-lane
    # vregs of each row. The serial top-k extraction below costs
    # O(k · n_vregs) full-width vector ops and dominates the kernel wall
    # (~1.0 of ~1.25 ms at 8192², k=32 — MXU dot and packed-min are ~0.2);
    # halving the lane count nearly halves every round's retire pass for a
    # one-time ~24-op network. Retention: survivors per mod-128 lane class
    # are its 4 smallest members, so a true top-k neighbor is lost only
    # when ≥5 of the k land in the same mod-128 class — expected losses
    # C(32,5)/128⁴ ≈ 7.5e-4 at k=32, noise against the 0.987 recall
    # license (the mod-G birthday bound above stays the dominant term;
    # measured on-chip recall after this change: see selftest
    # knn_ff_recall). The lower-half-of-bitonic-merge trick needs only the
    # two 4-element halves SORTED, not the output: for ascending x, y the
    # set {min(x_i, y_{3-i})} is exactly the 4 smallest of the union.
    # Values stay unique (a subset of the packed acc), so the min-retire
    # extraction still selects exactly one lane per round.
    # k <= 32 is the LICENSED stage-A regime (recall 0.987 measured at k=32;
    # expected loss grows ~C(k,5)/128^4 — k=48 ≈ 5e-3, k=64 ≈ 2e-2, well
    # above the 7.5e-4 licensed at k=32), so the k-bound is HARD-CODED
    # here: stage_a=True cannot enable the network for k > 32 (ADVICE r4
    # #2). A k in (32, 64] caller always gets the serial full-G extraction
    # (slower, exact); widening the licensed regime means re-measuring
    # recall on-chip and then relaxing this bound, not a caller-side flag.
    if stage_a and k <= 32 and G == 1024:
        v = [acc[:, i * 128:(i + 1) * 128] for i in range(8)]

        def ce(a, b):
            return jnp.minimum(a, b), jnp.maximum(a, b)

        def sort4(a, b, c, d):
            a, c = ce(a, c)
            b, d = ce(b, d)
            a, b = ce(a, b)
            c, d = ce(c, d)
            b, c = ce(b, c)
            return a, b, c, d

        x = sort4(v[0], v[1], v[2], v[3])
        y = sort4(v[4], v[5], v[6], v[7])
        acc = jnp.concatenate(
            [jnp.minimum(x[i], y[3 - i]) for i in range(4)], axis=1)

    # exact top-k of the surviving candidates: min → retire → repeat.
    # Padding lanes (when the caller rounds k up) stay INT32_MAX and are
    # never selected before real candidates run out.
    out_ref[...] = jnp.full(out_ref.shape, INT32_MAX, jnp.int32)
    for j in range(k):
        m = jnp.min(acc, axis=1, keepdims=True)            # (TQ, 1)
        out_ref[:, j:j + 1] = m
        acc = jnp.where(acc == m, INT32_MAX, acc)


def _unpack(packed: jnp.ndarray, n2_bits: int):
    idx_mask = (1 << n2_bits) - 1
    idx = packed & idx_mask
    dist = jax.lax.bitcast_convert_type(packed & ~idx_mask, jnp.float32)
    return dist, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,),
                   static_argnames=("n_groups", "tq", "extract", "recall",
                                    "interpret", "precision", "semantics",
                                    "vpu", "mode", "stage_a", "fuse_min"))
def knn_fused(query: jnp.ndarray, xyz: jnp.ndarray, k: int,
              *, n_groups: int = 1024, tq: int = 256,
              extract: bool = True, recall: float = 0.95,
              interpret: bool = False, precision: str = "highest",
              semantics: str = "arbitrary", vpu: bool = False,
              mode: str | None = None, stage_a: bool = True,
              fuse_min: bool = False):
    """(B, N1, 3) queries × (B, N2, 3) keys → (dist², idx) of shape (B, N1, k).

    Requires N1 % tq == 0 and N2 % n_groups == 0. dist² carries ≤1e-3
    relative error from the packed-index mantissa mask (module docstring).

    mode: "mxu" (HIGHEST dot) | "vpu" (broadcast-FMA f32) | "ff" (single
    DEFAULT dot over float-float bf16 embeddings — index-only searches; the
    returned distances additionally carry the ~1e-4 dropped-term error).
    Defaults from the legacy `vpu` flag.
    """
    if mode is None:
        mode = "vpu" if vpu else "mxu"
    B, N1, _ = query.shape
    N2 = xyz.shape[1]
    assert N1 % tq == 0 and N2 % n_groups == 0, (N1, tq, N2, n_groups)
    n2_bits = max(1, (N2 - 1).bit_length())

    if mode == "ff":
        xq = _embed_queries_ff(query)                      # bf16 (B·N1, 128)
        xk = _embed_keys_ff(xyz)                           # bf16 (B·128, N2)
        precision = "default"                              # 1 MXU pass, exact
    else:
        xq = _embed_queries(query)                         # (B·N1, 128)
        xk = _embed_keys(xyz)                              # (B·128, N2)

    grid = (B, N1 // tq)
    if extract:
        K = max(k, 128)                                    # lane-align output
        out_shape = jax.ShapeDtypeStruct((B * N1, K), jnp.int32)
        out_spec = pl.BlockSpec((tq, K), lambda b, q: (b * (N1 // tq) + q, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((B * N1, n_groups), jnp.int32)
        out_spec = pl.BlockSpec((tq, n_groups),
                                lambda b, q: (b * (N1 // tq) + q, 0),
                                memory_space=pltpu.VMEM)

    prec = jax.lax.Precision(precision)
    use_fuse_min = fuse_min and mode != "vpu"
    out = pl.pallas_call(
        functools.partial(_kernel, n_groups, n2_bits, k, extract, prec,
                          mode == "vpu", stage_a, use_fuse_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 128), lambda b, q: (b * (N1 // tq) + q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, N2), lambda b, q: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=([] if use_fuse_min
                        else [pltpu.VMEM((tq, N2), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", semantics)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N1 * 128 * N2,
            bytes_accessed=(B * N1 * 128 + B * 128 * N2 + B * N1 * 128) * 4,
            transcendentals=0),
        interpret=interpret,
    )(xq, xk)

    def _debias(d):
        return jnp.maximum(d - _FF_BIAS, 0.0) if mode == "ff" else d

    if extract:
        dist, idx = _unpack(out.reshape(B, N1, -1)[..., :k], n2_bits)
        return _debias(dist), idx

    cand_d, cand_i = _unpack(out.reshape(B, N1, n_groups), n2_bits)
    d, pos = jax.lax.approx_min_k(cand_d, k, recall_target=recall)
    idx = jnp.take_along_axis(cand_i, pos, axis=-1)
    return _debias(d), idx
