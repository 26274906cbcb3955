"""Bidirectional cross / cost-volume layers.

Channels-last rebuilds of the reference cross-layer family:
  * CrossLayerLight     — pointconv_util.py:1791-1868 (production path)
  * CrossLayerLightFG   — pointconv_util.py:1871-1957 (feature-grouping kNN,
                          used by the bifeat iterative teacher + FG student)
  * NoCrossLayerLight   — pointconv_util2.py:1197-1237 (one-directional
                          ablation)
  * CrossLayerLightVote — pointconv_util_vote.py:1450-1531 (soft-argmax vote
                          flow appended to the pooled cost volume)

Core op per direction: project both feature sets to a shared width (1×1),
kNN of cloud1 in cloud2, additive position-encoded grouping
leaky(g2 + g1 + pos(Δxyz)), a pointwise MLP, then max-pool over the K
neighbors. Everything is dense gathers + MXU matmuls; the (B,N,K,C) grouped
tensor is the HBM hot spot the Pallas fusion targets later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (group_points, group_points_kmajor,
                   group_points_kmajor_packed, knn_point)
from ..ops.pallas.pool_fused import pool_mlp_max
from .blocks import MLP, Dense, leaky


def _pool_gather(u_table, idx, pool_width):
    """k-major gather of the pool's key table, lane-packed to dense 128-lane
    rows when the pool width allows (see group_points_kmajor_packed).
    Returns (g, packed_p) for pool_mlp_max."""
    S = idx.shape[1]
    P = max(1, 128 // pool_width)
    while S % P != 0 and P > 1:
        P //= 2
    if P > 1:
        return group_points_kmajor_packed(u_table, idx, P), P
    return group_points_kmajor(u_table, idx), 1


def _mlp_params(mlp: MLP, width_in: int, dtype=jnp.float32):
    """Raw (kernel, bias) stacks of an MLP module's Dense layers.

    The throwaway (1, 1, C) call materializes the params under their normal
    flax paths (mlp*/PointwiseBlock_i/Dense_0) — checkpoint layout is
    unchanged and gradients flow to the same leaves; the dummy compute is
    dead code XLA removes.
    """
    _ = mlp(jnp.zeros((1, 1, width_in), dtype))
    p = mlp.variables["params"]
    ws = [p[f"PointwiseBlock_{i}"]["Dense_0"]["kernel"]
          for i in range(len(mlp.features))]
    bs = [p[f"PointwiseBlock_{i}"]["Dense_0"]["bias"]
          for i in range(len(mlp.features))]
    return ws, bs

# XLA row-gather cost is rows × ceil(row_bytes/512 B): two gathers that share
# indices merge into one for free while the combined width stays ≤128 f32
# lanes (measured on v5e; crossing the boundary doubles the per-row cost).
_MERGE_LANES = 128


def _bid_knn(nsample, pc1, pc2, *, method, recall, precision):
    """Both directions' kNN in ONE kernel launch (queries/keys stacked on the
    batch axis) when the clouds have equal size — halves the per-call fixed
    cost of the Pallas kNN kernel. Results are bit-identical to two calls
    (batch elements are independent)."""
    if pc1.shape == pc2.shape:
        B = pc1.shape[0]
        q = jnp.concatenate([pc1, pc2], axis=0)
        kz = jnp.concatenate([pc2, pc1], axis=0)
        idx = knn_point(nsample, kz, q, method=method, recall=recall,
                        precision=precision)
        return idx[:B], idx[B:]
    idx12 = knn_point(nsample, pc2, pc1, method=method, recall=recall,
                      precision=precision)
    idx21 = knn_point(nsample, pc1, pc2, method=method, recall=recall,
                      precision=precision)
    return idx12, idx21


def _cross_pool(nsample, xyz1, xyz2, points1, points2, pos, mlp,
                *, knn_idx=None, method: str = "exact", recall: float = 0.95,
                precision: str = "highest", return_neighbors: bool = False):
    """One cost-volume direction (reference `cross`, pointconv_util.py:1826-1852).

    xyz*: (B, N*, 3); points*: (B, N*, D) already projected to mlp width.
    pos: Dense(3 → D); mlp: MLP over the remaining widths.
    `knn_idx` shares the geometry-only kNN between the two rounds of the same
    direction (the reference recomputes it, pointconv_util.py:1836).
    """
    if knn_idx is None:
        knn_idx = knn_point(nsample, xyz2, xyz1, method=method,
                            recall=recall, precision=precision)  # (B, N1, K)

    if return_neighbors:
        # vote path needs the neighbor positions — plain formulation
        neighbor_xyz = group_points(xyz2, knn_idx)
        direction_xyz = neighbor_xyz - xyz1[:, :, None, :]
        g2 = group_points(points2, knn_idx)                # (B, N1, K, D)
        new_points = leaky(g2 + points1[:, :, None, :] + pos(direction_xyz))
        new_points = mlp(new_points)
        return jnp.max(new_points, axis=2), new_points, neighbor_xyz

    # pos is LINEAR, so pos(xyz2[j] − xyz1[q]) = pos·xyz2[j] − pos·xyz1[q]
    # (+bias): fold the per-key term into a table u and the per-query term
    # into v; the grouped pre-activation is just u[idx] + v[q]. This removes
    # the (B,N,K,3) neighbor-position gather, the direction subtraction, and
    # the (B,N,K,3)→(B,N,K,D) matmul — exact same math. The add + MLP + max
    # run in the fused Pallas pool on TPU (pool_fused.py).
    u = points2 + pos(xyz2)                                # p2 + W·x2 + b
    # v = p1 − W·x1 (bias already carried by u): pos(0) recovers the bias
    v = points1 - pos(xyz1) + pos(jnp.zeros_like(xyz1[:, :1, :]))
    ws, bs = _mlp_params(mlp, u.shape[-1], u.dtype)
    g, P = _pool_gather(u, knn_idx, v.shape[-1])
    return pool_mlp_max(g, v, ws, bs, packed_p=P)


class CrossLayerLight(nn.Module):
    """Two-round bidirectional cost volume (production path).

    forward(pc1, pc2, feat1, feat2) →
      (feat1_new, feat2_new)             if mlp2 is None
      (feat1_new, feat2_new, feat1_final) otherwise
    matching pointconv_util.py:1853-1868 (note: cross_t1/t2 are applied to the
    returned feat*_new when mlp2 is present).
    """

    nsample: int
    mlp1: Sequence[int]
    mlp2: Optional[Sequence[int]] = None
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"

    @nn.compact
    def __call__(self, pc1, pc2, feat1, feat2):
        cross_t11 = Dense(self.mlp1[0], name="cross_t11")
        cross_t22 = Dense(self.mlp1[0], name="cross_t22")
        pos1 = Dense(self.mlp1[0], name="pos1")
        mlp1 = MLP(self.mlp1[1:], name="mlp1")

        # one kNN per direction, shared by both rounds (the reference runs
        # three identical-geometry kNNs per layer), both directions in one
        # stacked kernel launch
        idx12, idx21 = _bid_knn(self.nsample, pc1, pc2,
                                method=self.knn_method,
                                recall=self.knn_recall,
                                precision=self.knn_precision)

        if self.mlp2 is None:
            feat1_new = _cross_pool(self.nsample, pc1, pc2, cross_t11(feat1),
                                    cross_t22(feat2), pos1, mlp1,
                                    knn_idx=idx12)
            feat2_new = _cross_pool(self.nsample, pc2, pc1, cross_t11(feat2),
                                    cross_t22(feat1), pos1, mlp1,
                                    knn_idx=idx21)
            return feat1_new, feat2_new

        cross_t1 = Dense(self.mlp2[0], name="cross_t1")
        cross_t2 = Dense(self.mlp2[0], name="cross_t2")
        pos2 = Dense(self.mlp2[0], name="pos2")
        mlp2 = MLP(self.mlp2[1:], name="mlp2")

        if self.mlp1[0] + self.mlp2[0] > _MERGE_LANES:
            feat1_new = _cross_pool(self.nsample, pc1, pc2, cross_t11(feat1),
                                    cross_t22(feat2), pos1, mlp1,
                                    knn_idx=idx12)
            feat2_new = _cross_pool(self.nsample, pc2, pc1, cross_t11(feat2),
                                    cross_t22(feat1), pos1, mlp1,
                                    knn_idx=idx21)
            feat1_new = cross_t1(feat1_new)
            feat2_new = cross_t2(feat2_new)
            feat1_final = _cross_pool(self.nsample, pc1, pc2, feat1_new,
                                      feat2_new, pos2, mlp2, knn_idx=idx12)
            return feat1_new, feat2_new, feat1_final

        # Merged-gather schedule (same math, one fewer big gather): round 1's
        # 2→1 pool runs FIRST, which makes round 2's key-side table
        # (feat2_new + pos2) available before any idx12 gather — so the two
        # idx12-indexed tables ride ONE row gather. The query-side terms
        # (v, below) never go through a gather and can depend on round 1's
        # 1→2 output as usual.
        feat2_new = _cross_pool(self.nsample, pc2, pc1, cross_t11(feat2),
                                cross_t22(feat1), pos1, mlp1, knn_idx=idx21)
        feat2_new = cross_t2(feat2_new)

        u1 = cross_t22(feat2) + pos1(pc2)              # round-1 key table
        v1 = (cross_t11(feat1) - pos1(pc1)
              + pos1(jnp.zeros_like(pc1[:, :1, :])))
        u2 = feat2_new + pos2(pc2)                     # round-2 key table
        c1 = self.mlp1[0]
        ws1, bs1 = _mlp_params(mlp1, c1)
        ws2, bs2 = _mlp_params(mlp2, self.mlp2[0])
        g, P = _pool_gather(jnp.concatenate([u1, u2], axis=-1), idx12, c1)
        feat1_new = pool_mlp_max(g, v1, ws1, bs1, co=0, packed_p=P)
        feat1_new = cross_t1(feat1_new)
        v2 = (feat1_new - pos2(pc1)
              + pos2(jnp.zeros_like(pc1[:, :1, :])))
        feat1_final = pool_mlp_max(g, v2, ws2, bs2, co=c1, packed_p=P)
        return feat1_new, feat2_new, feat1_final


class CrossLayerLightFG(nn.Module):
    """Feature-grouping cross layer: neighbors are the union of nsample/2
    feature-space kNN (over the `fgfeat*` clouds) and nsample/2 Euclidean kNN
    (pointconv_util.py:1915-1931).

    forward(pc1, pc2, feat1, feat2, fgfeat1, fgfeat2) →
      (feat1_new, feat2_new, feat1_final); cross_t1/t2 are applied right after
    each direction's pool (pointconv_util.py:1948-1955).
    """

    nsample: int
    mlp1: Sequence[int]
    mlp2: Sequence[int]
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"
    # isolation-probe overrides (VERDICT r4 #2: the fg production-vs-exact
    # ACC3DS residual needs per-search-kind exactness arms): None → follow
    # knn_method for that search kind
    feat_knn_method: Optional[str] = None
    euclid_knn_method: Optional[str] = None

    def _fg_idx_bid(self, xyz1, xyz2, fg1, fg2):
        """Union of feature-space and euclidean kNN for BOTH directions
        (pointconv_util.py:1921-1926). Identical for both rounds of a
        direction — computed once; the two directions of each search kind
        ride one stacked kernel launch."""
        half = self.nsample // 2
        kw = dict(recall=self.knn_recall, precision=self.knn_precision)
        idx12_f, idx21_f = _bid_knn(
            half, fg1, fg2,
            method=self.feat_knn_method or self.knn_method, **kw)
        idx12_e, idx21_e = _bid_knn(
            half, xyz1, xyz2,
            method=self.euclid_knn_method or self.knn_method, **kw)
        return (jnp.concatenate([idx12_f, idx12_e], axis=-1),
                jnp.concatenate([idx21_f, idx21_e], axis=-1))

    def _fg_pool(self, idx, xyz1, xyz2, points1, points2, pos, mlp):
        # linear-pos factorization (see _cross_pool): u[idx] + v[q]
        u = points2 + pos(xyz2)
        v = points1 - pos(xyz1) + pos(jnp.zeros_like(xyz1[:, :1, :]))
        ws, bs = _mlp_params(mlp, u.shape[-1], u.dtype)
        g, P = _pool_gather(u, idx, v.shape[-1])
        return pool_mlp_max(g, v, ws, bs, packed_p=P)

    @nn.compact
    def __call__(self, pc1, pc2, feat1, feat2, fgfeat1, fgfeat2):
        cross_t11 = Dense(self.mlp1[0], name="cross_t11")
        cross_t22 = Dense(self.mlp1[0], name="cross_t22")
        pos1 = Dense(self.mlp1[0], name="pos1")
        mlp1 = MLP(self.mlp1[1:], name="mlp1")
        cross_t1 = Dense(self.mlp2[0], name="cross_t1")
        cross_t2 = Dense(self.mlp2[0], name="cross_t2")
        pos2 = Dense(self.mlp2[0], name="pos2")
        mlp2 = MLP(self.mlp2[1:], name="mlp2")

        idx12, idx21 = self._fg_idx_bid(pc1, pc2, fgfeat1, fgfeat2)

        if self.mlp1[0] + self.mlp2[0] > _MERGE_LANES:
            feat1_new = self._fg_pool(idx12, pc1, pc2, cross_t11(feat1),
                                      cross_t22(feat2), pos1, mlp1)
            feat1_new = cross_t1(feat1_new)
            feat2_new = self._fg_pool(idx21, pc2, pc1, cross_t11(feat2),
                                      cross_t22(feat1), pos1, mlp1)
            feat2_new = cross_t2(feat2_new)
            # the final round keeps the same base feature clouds for the
            # feature-space kNN (pointconv_util.py:1956) -> same indices.
            feat1_final = self._fg_pool(idx12, pc1, pc2, feat1_new, feat2_new,
                                        pos2, mlp2)
            return feat1_new, feat2_new, feat1_final

        # merged-gather schedule (see CrossLayerLight): 2→1 pool first, then
        # round 1's and round 2's idx12 key tables share one row gather
        feat2_new = self._fg_pool(idx21, pc2, pc1, cross_t11(feat2),
                                  cross_t22(feat1), pos1, mlp1)
        feat2_new = cross_t2(feat2_new)

        u1 = cross_t22(feat2) + pos1(pc2)
        v1 = (cross_t11(feat1) - pos1(pc1)
              + pos1(jnp.zeros_like(pc1[:, :1, :])))
        u2 = feat2_new + pos2(pc2)
        c1 = self.mlp1[0]
        ws1, bs1 = _mlp_params(mlp1, c1)
        ws2, bs2 = _mlp_params(mlp2, self.mlp2[0])
        g, P = _pool_gather(jnp.concatenate([u1, u2], axis=-1), idx12, c1)
        feat1_new = pool_mlp_max(g, v1, ws1, bs1, co=0, packed_p=P)
        feat1_new = cross_t1(feat1_new)
        v2 = (feat1_new - pos2(pc1)
              + pos2(jnp.zeros_like(pc1[:, :1, :])))
        feat1_final = pool_mlp_max(g, v2, ws2, bs2, co=c1, packed_p=P)
        return feat1_new, feat2_new, feat1_final


class NoCrossLayerLight(nn.Module):
    """One-directional ablation (pointconv_util2.py:1197-1237): single
    position-encoded grouping of cloud2 around cloud1, returns one tensor.
    Implemented BN-free (the reference accidentally enables BN via a truthy
    positional arg — models_bid_no_cross.py:26 passes mlp2 into `bn`; we treat
    that as a bug and keep the documented BN-off contract)."""

    nsample: int
    mlp1: Sequence[int]
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"

    @nn.compact
    def __call__(self, pc1, pc2, feat1, feat2):
        cross_t1 = Dense(self.mlp1[0], name="cross_t1")
        cross_t2 = Dense(self.mlp1[0], name="cross_t2")
        pos = Dense(self.mlp1[0], name="pos")
        mlp = MLP(self.mlp1[1:], name="mlp")
        return _cross_pool(self.nsample, pc1, pc2, cross_t1(feat1),
                           cross_t2(feat2), pos, mlp,
                           method=self.knn_method, recall=self.knn_recall,
                           precision=self.knn_precision)


class CrossLayerLightVote(nn.Module):
    """CrossLayerLight + soft-argmax vote flow on the final round
    (pointconv_util_vote.py:1489-1517): a 1-channel conv over the pre-pool
    cost tensor, softmax over K, expectation of neighbor positions minus the
    query position, concatenated to the pooled features (+3 channels)."""

    nsample: int
    mlp1: Sequence[int]
    mlp2: Sequence[int]
    knn_method: str = "exact"
    knn_recall: float = 0.95
    knn_precision: str = "highest"

    @nn.compact
    def __call__(self, pc1, pc2, feat1, feat2):
        cross_t11 = Dense(self.mlp1[0], name="cross_t11")
        cross_t22 = Dense(self.mlp1[0], name="cross_t22")
        pos1 = Dense(self.mlp1[0], name="pos1")
        mlp1 = MLP(self.mlp1[1:], name="mlp1")
        cross_t1 = Dense(self.mlp2[0], name="cross_t1")
        cross_t2 = Dense(self.mlp2[0], name="cross_t2")
        pos2 = Dense(self.mlp2[0], name="pos2")
        mlp2 = MLP(self.mlp2[1:], name="mlp2")

        idx12, idx21 = _bid_knn(self.nsample, pc1, pc2,
                                method=self.knn_method,
                                recall=self.knn_recall,
                                precision=self.knn_precision)

        # round 2 gathers its key features AND neighbor positions with idx12
        # (the vote needs both); merging round 1's key table in as well needs
        # mlp1[0] + mlp2[0] + 3 lanes
        if self.mlp1[0] + self.mlp2[0] + 3 > _MERGE_LANES:
            feat1_new = _cross_pool(self.nsample, pc1, pc2, cross_t11(feat1),
                                    cross_t22(feat2), pos1, mlp1,
                                    knn_idx=idx12)
            feat2_new = _cross_pool(self.nsample, pc2, pc1, cross_t11(feat2),
                                    cross_t22(feat1), pos1, mlp1,
                                    knn_idx=idx21)
            feat1_new = cross_t1(feat1_new)
            feat2_new = cross_t2(feat2_new)
            pooled, pre_pool, neighbor_xyz = _cross_pool(
                self.nsample, pc1, pc2, feat1_new, feat2_new, pos2, mlp2,
                knn_idx=idx12, return_neighbors=True)
        else:
            feat2_new = _cross_pool(self.nsample, pc2, pc1, cross_t11(feat2),
                                    cross_t22(feat1), pos1, mlp1,
                                    knn_idx=idx21)
            feat2_new = cross_t2(feat2_new)

            u1 = cross_t22(feat2) + pos1(pc2)
            v1 = (cross_t11(feat1) - pos1(pc1)
                  + pos1(jnp.zeros_like(pc1[:, :1, :])))
            c1 = self.mlp1[0]
            ws1, bs1 = _mlp_params(mlp1, c1)
            # k-major merged gather: round-1 table ⊕ round-2 features ⊕
            # neighbor positions (the vote needs the latter two per slot)
            g = group_points_kmajor(
                jnp.concatenate([u1, feat2_new, pc2], axis=-1), idx12)
            feat1_new = pool_mlp_max(g, v1, ws1, bs1, co=0)
            feat1_new = cross_t1(feat1_new)
            g2, neighbor_xyz = g[..., c1:-3], g[..., -3:]  # (B, K, N1, ·)
            direction_xyz = neighbor_xyz - pc1[:, None, :, :]
            pre_pool = mlp2(leaky(g2 + feat1_new[:, None, :, :]
                                  + pos2(direction_xyz)))
            pooled = jnp.max(pre_pool, axis=1)
            vote = Dense(1, name="vote")(pre_pool)        # (B, K, N1, 1)
            vote = jax.nn.softmax(vote, axis=1)
            flow = jnp.sum(vote * neighbor_xyz, axis=1) - pc1
            feat1_final = jnp.concatenate([pooled, flow], axis=-1)
            return feat1_new, feat2_new, feat1_final

        vote = Dense(1, name="vote")(pre_pool)            # (B, N1, K, 1)
        vote = jax.nn.softmax(vote, axis=2)
        flow = jnp.sum(vote * neighbor_xyz, axis=2) - pc1  # (B, N1, 3)
        feat1_final = jnp.concatenate([pooled, flow], axis=-1)
        return feat1_new, feat2_new, feat1_final
