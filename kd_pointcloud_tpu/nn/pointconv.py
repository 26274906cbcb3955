"""PointConv layers: WeightNet-weighted continuous convolutions.

Channels-last rebuilds of the reference's production conv modules:
  * PointConv      — same-resolution conv (pointconv_util.py:217-258)
  * PointConvD     — FPS-downsampling conv (pointconv_util.py:401-446)
  * PointConvNonLinear — depthwise+pointwise factorized variant
                     (pointconv_util3.py:375-427)
  * PointConvDRand — random- instead of FPS-sampling ablation
                     (pointconv_util.py:592-637)

The core contraction groups features (B,N,K,C), evaluates WeightNet weights
(B,N,K,W) on relative coords, contracts over K (einsum → batched MXU matmul),
then a single big Dense over W·C — the matmul XLA tiles best. The flatten
order of the (C, W) pair matches the reference's .view(B, N, -1) (c-major).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import furthest_point_sample, gather_points, group_points, knn_point
from .blocks import Dense, leaky
from .weightnet import WeightNet


def group_knn(nsample: int, xyz, query_xyz, feats, method: str = "exact",
              recall: float = 0.95, idx=None, precision: str = "highest",
              rel=None):
    """kNN-group `feats` (and relative coords) of `xyz` around `query_xyz`.

    Returns (grouped [B,S,K,3+C], rel_xyz [B,S,K,3]).
    Reference: group/group_query (pointconv_util.py:135-182).
    `idx` lets callers share one kNN across several convs on the same
    clouds; `rel` additionally shares the (B,S,K,3) neighbor-position
    gather (identical for every conv in a stack — one 74k-row gather saved
    per extra conv at l0).
    """
    if idx is None:
        idx = knn_point(nsample, xyz, query_xyz, method=method, recall=recall,
                        precision=precision)
    # XLA row-gather cost is rows × ceil(row_bytes / 512 B): [xyz ⊕ feats]
    # rides ONE gather while 3 + C stays within the 128-lane vreg boundary
    # (the l1 PointConvD: 3+64). Past the boundary the merged gather costs
    # ~2× (measured: flow0 head 2.9 → 3.9 ms at 3+128) — gathers stay
    # separate there.
    if rel is None and 3 + feats.shape[-1] <= 128:
        g = group_points(jnp.concatenate([xyz, feats], axis=-1), idx)
        rel = g[..., :3] - query_xyz[:, :, None, :]
        return jnp.concatenate([rel, g[..., 3:]], axis=-1), rel
    if rel is None:
        g_xyz = group_points(xyz, idx)                 # (B, S, K, 3)
        rel = g_xyz - query_xyz[:, :, None, :]
    g_feat = group_points(feats, idx)                  # (B, S, K, C)
    return jnp.concatenate([rel, g_feat], axis=-1), rel


def weighted_contract(grouped, weights):
    """(B,S,K,C) × (B,S,K,W) → (B,S,C*W), c-major flatten (matches the
    reference matmul + .view, pointconv_util.py:245-247)."""
    B, S, _, C = grouped.shape
    W = weights.shape[-1]
    acc = jnp.promote_types(grouped.dtype, jnp.float32)
    out = jnp.einsum("bskc,bskw->bscw", grouped, weights,
                     preferred_element_type=acc).astype(grouped.dtype)
    return out.reshape(B, S, C * W)


def contract_dense(grouped, weights, dense: Dense):
    """weighted_contract + the following Dense, reassociated for TPU:

      Dense(contract(g, w)) = Σ_{c,w'} A[c·W+w', o] · Σ_k g[..k,c]·w[..k,w']

    evaluated as two einsums per part — the (B,S,K,3) rel slice and the
    dense (B,S,K,C−3) feature slice separately (a 131-channel operand pads
    to 256 lanes; the split keeps tiles dense) — with the (c, w') pair
    contracted straight into the Dense kernel (einsum "bscw,cwo->bso", no
    (B,S,C·W) reshape materialization). Measured 1.245 → 0.968 ms for the
    l0 flow-head conv on v5e; results differ only by matmul-order rounding.

    The Dense module is invoked once on a dummy row so its params keep
    their normal flax path/shape (kernel (C·W, O) c-major + bias) —
    checkpoints and torch imports are unchanged.
    """
    B, S, K, C = grouped.shape
    W = weights.shape[-1]
    _ = dense(jnp.zeros((1, 1, C * W), grouped.dtype))
    kern = dense.variables["params"]["kernel"].reshape(C, W, -1)
    bias = dense.variables["params"]["bias"]

    acc = jnp.promote_types(grouped.dtype, jnp.float32)

    def part(g, k3):
        y = jnp.einsum("bskc,bskw->bscw", g, weights,
                       preferred_element_type=acc)
        return jnp.einsum("bscw,cwo->bso", y, k3,
                          preferred_element_type=acc)

    out = part(grouped[..., :3], kern[:3])
    if C > 3:
        out = out + part(grouped[..., 3:], kern[3:])
    return (out + bias).astype(grouped.dtype)


class PointConv(nn.Module):
    """Same-resolution PointConv. bn=True only inside flow estimators
    (pointconv_util.py:2236 creates it so); that is the model's only BN."""

    nsample: int
    out_channel: int
    weightnet: int = 16
    bn: bool = False
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"

    @nn.compact
    def __call__(self, xyz, feats, train: bool = True, knn_idx=None,
                 rel=None):
        grouped, rel = group_knn(self.nsample, xyz, xyz, feats,
                                 self.knn_method, self.knn_recall, knn_idx,
                                 precision=self.knn_precision, rel=rel)
        w = WeightNet(self.weightnet)(rel)
        y = contract_dense(grouped, w, Dense(self.out_channel))
        if self.bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(y)
        return leaky(y)


def _fps_or_prefix(xyz, npoint: int, prefix: bool, fps_blocks: int = 1,
                   fps_backend: str = "auto"):
    """FPS sample, or take the leading `npoint` rows when `prefix`.

    Nested-FPS prefix property: greedy FPS orderings are NESTED — if a point
    array is already in FPS-selection order (as every level's output is:
    gather_points(xyz, fps_idx) keeps selection order), then FPS of its
    first-M subset selects exactly those M points in the same order. Proof:
    at step t the full-set argmax of min-dist is s_t, which lies in the
    subset, so the subset argmax is also s_t; ties broke toward earlier
    selection in the parent run and earlier selection = lower row in the
    subset, so scan-order tie-breaks agree too. Hence the reference's
    per-level FPS chains (sampling_gpu.cu:93-209, seeded at row 0 =
    s_1) are reproduced EXACTLY by prefix slices of the level-1 ordering —
    no iterations, no gather, no dispatch."""
    if prefix:
        B = xyz.shape[0]
        idx = jnp.broadcast_to(jnp.arange(npoint, dtype=jnp.int32),
                               (B, npoint))
        return xyz[:, :npoint], idx
    if fps_blocks > 1:
        # serving-preset relaxation: blocks×-shorter serial chain, exact
        # FPS per block, interleaved (ops/fps.py docstring)
        from ..ops.fps import furthest_point_sample_blocked
        idx = furthest_point_sample_blocked(xyz, npoint, fps_blocks,
                                            backend=fps_backend)
    else:
        idx = furthest_point_sample(xyz, npoint, backend=fps_backend)
    return gather_points(xyz, idx), idx


class PointConvD(nn.Module):
    """FPS-downsampling PointConv. Returns (new_xyz, new_feat, fps_idx)."""

    npoint: int
    nsample: int
    out_channel: int
    weightnet: int = 16
    bn: bool = False
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"
    fps_blocks: int = 1
    fps_backend: str = "auto"

    @nn.compact
    def __call__(self, xyz, feats, train: bool = True,
                 prefix_sample: bool = False):
        new_xyz, fps_idx = _fps_or_prefix(xyz, self.npoint, prefix_sample,
                                          self.fps_blocks, self.fps_backend)
        grouped, rel = group_knn(self.nsample, xyz, new_xyz, feats,
                                 self.knn_method, self.knn_recall,
                                 precision=self.knn_precision)
        w = WeightNet(self.weightnet)(rel)
        y = contract_dense(grouped, w, Dense(self.out_channel))
        if self.bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(y)
        return new_xyz, leaky(y), fps_idx


class PointConvNonLinear(nn.Module):
    """Depthwise+pointwise factorized downsampling conv
    (pointconv_util3.py:375-427): after the weighted contraction the (C, W)
    block is mixed by a grouped 1×1 (one weight per input channel) then a
    pointwise conv to out_channel/weightnet channels, flattening back to
    out_channel."""

    npoint: int
    nsample: int
    out_channel: int
    weightnet: int = 16
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"
    fps_blocks: int = 1
    fps_backend: str = "auto"

    @nn.compact
    def __call__(self, xyz, feats, train: bool = True,
                 prefix_sample: bool = False):
        new_xyz, fps_idx = _fps_or_prefix(xyz, self.npoint, prefix_sample,
                                          self.fps_blocks, self.fps_backend)
        grouped, rel = group_knn(self.nsample, xyz, new_xyz, feats,
                                 self.knn_method, self.knn_recall,
                                 precision=self.knn_precision)
        w = WeightNet(self.weightnet)(rel)
        # keep (B, S, C, W) unflattened: reference permutes to (B, C, W, S)
        B, S, _, C = grouped.shape
        y = jnp.einsum("bskc,bskw->bscw", grouped, w,
                       preferred_element_type=jnp.promote_types(
                           grouped.dtype, jnp.float32)).astype(grouped.dtype)
        # grouped 1x1 over channel dim (torch Conv2d(groups=in_channel)):
        dw = self.param("depthwise", nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"), (C, 1), jnp.float32)
        db = self.param("depthwise_bias", nn.initializers.zeros, (C,),
                        jnp.float32)
        y = y * dw.astype(y.dtype)[None, None] + db.astype(y.dtype)[None, None, :, None]
        # pointwise conv C -> out/weightnet, applied per W slot:
        y = jnp.swapaxes(y, -1, -2)                     # (B, S, W, C)
        y = Dense(self.out_channel // self.weightnet)(y)  # (B, S, W, out/W)
        y = y.reshape(B, S, -1)
        return new_xyz, leaky(y), fps_idx


class PointConvDRand(nn.Module):
    """Random-sampling ablation of PointConvD (pointconv_util.py:592-637):
    takes the first npoint points instead of FPS (the reference samples
    without replacement from a permutation; deterministic prefix keeps the
    jitted graph static — the input clouds are already randomly sampled)."""

    npoint: int
    nsample: int
    out_channel: int
    weightnet: int = 16
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"

    @nn.compact
    def __call__(self, xyz, feats, train: bool = True):
        B = xyz.shape[0]
        idx = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, self.npoint), 1),
            (B, self.npoint))
        new_xyz = gather_points(xyz, idx)
        grouped, rel = group_knn(self.nsample, xyz, new_xyz, feats,
                                 self.knn_method, self.knn_recall,
                                 precision=self.knn_precision)
        w = WeightNet(self.weightnet)(rel)
        y = contract_dense(grouped, w, Dense(self.out_channel))
        return new_xyz, leaky(y), idx
