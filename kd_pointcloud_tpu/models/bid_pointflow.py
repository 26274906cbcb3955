"""BidPointFlowNet: coarse-to-fine bidirectional PointConv scene-flow network.

One parameterized flax module covering the reference's whole model family
(teacher models_bid_pointconv.py:74-207, lighttoken_res, weight48, the
FG/bifeat feature-grouping + iterative variants models_bid_FG.py:66-194 /
models_bifeat.py:66-228, the no_cross ablation models_bid_no_cross.py, the
non_linear student and the vote model) — variant selection via ModelConfig.

Topology (teacher wiring):
  encoder  l0 Conv stack → l1..l4 FPS PointConvD pyramid (both clouds, shared
           weights), per-level lift convs feeding the next downsample;
  decoder  l4→l3 IDW-upsample + deconv, then coarse-to-fine per level:
           upsample flow, warp pc2, bidirectional cross cost volume,
           residual scene-flow head; cross-refined features are upsampled +
           deconved into the next finer level's concat.

All tensors channels-last (B, N, C); positions (B, N, 3).

Output contract (dict — fixes the reference's 7-vs-8 tuple arity drift,
train_bid_pointconv.py:148 vs models_bid_lighttoken_res.py:189):
  flows      [flow0 .. flow3] fine→coarse, each (B, Nl, 3); at iters>1 the
             l0/l1/l2 entries are per-iteration lists (models_bifeat.py:217)
  fps_idx1/2 FPS index chains [l1, l2, l3]
  pc1/pc2    positions per level l0..l3
  feat1s/2s  lift + inter-level features (7 entries teacher contract;
             8 with feat_l4 inserted for the FG family, models_bid_FG.py:189)
  c_feat1s/2s  concatenated pre-cross features (FG family only)
  crosses    cost volumes per level
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import BottleNeck, PointwiseBlock
from ..nn.cross import (CrossLayerLight, CrossLayerLightFG,
                        CrossLayerLightVote, NoCrossLayerLight)
from ..nn.flowhead import SceneFlowEstimatorResidual
from ..nn.pointconv import PointConv, PointConvD, PointConvNonLinear
import functools

from ..ops import knn_point_dist, point_warp, upsample_idw
from .config import ModelConfig


class BidPointFlowNet(nn.Module):
    cfg: ModelConfig

    def _level_block(self, idx: int, width: int, name: str):
        if self.cfg.level_block == "bottleneck":
            return BottleNeck(self.cfg.bottleneck_mids[idx], width, name=name)
        return PointwiseBlock(width, name=name)

    def _downsample(self, lvl: int, name: str):
        cfg = self.cfg
        cls = (PointConvNonLinear
               if cfg.nonlinear_downsample and lvl >= 3 else PointConvD)
        return cls(cfg.npoints[lvl], cfg.feat_nei, cfg.level_channels[lvl],
                   weightnet=cfg.weightnet[lvl], knn_method=cfg.knn_method,
                   knn_recall=cfg.knn_recall,
                   knn_precision=cfg.knn_precision,
                   fps_blocks=cfg.fps_blocks, fps_backend=cfg.fps_backend,
                   name=name)

    def _cross(self, lvl: int, name: str):
        cfg = self.cfg
        c = cfg.level_channels[lvl]
        mlp = (c, c)
        # per-level cost-volume K override (serving preset: relax the dense
        # l0/l1, whose gather rows dominate latency, keeping reference K at
        # the coarse levels whose errors cascade through the decoder)
        nei = (cfg.flow_nei_per_level[lvl]
               if cfg.flow_nei_per_level is not None else cfg.flow_nei)
        kw = dict(knn_method=cfg.knn_method, knn_recall=cfg.knn_recall,
                  knn_precision=cfg.knn_precision, name=name)
        if cfg.cross == "light":
            return CrossLayerLight(nei, mlp, mlp, **kw)
        if cfg.cross == "fg":
            return CrossLayerLightFG(
                nei, mlp, mlp, feat_knn_method=cfg.fg_feat_knn_method,
                euclid_knn_method=cfg.fg_euclid_knn_method, **kw)
        if cfg.cross == "nocross":
            return NoCrossLayerLight(nei, mlp, **kw)
        if cfg.cross == "vote":
            return CrossLayerLightVote(nei, mlp, mlp, **kw)
        raise ValueError(f"unknown cross type {cfg.cross}")

    def _flow_head(self, lvl: int, name: str):
        cfg = self.cfg
        kw = dict(knn_method=cfg.knn_method, knn_recall=cfg.knn_recall,
                  knn_precision=cfg.knn_precision, name=name)
        if lvl == 0:
            return SceneFlowEstimatorResidual(
                channels=cfg.flow0_channels, mlp=cfg.flow0_mlp,
                weightnet=cfg.flow_weightnet[0], **kw)
        return SceneFlowEstimatorResidual(
            weightnet=cfg.flow_weightnet[lvl], **kw)

    @nn.compact
    def __call__(self, xyz1, xyz2, color1, color2,
                 train: bool = True) -> Dict[str, Any]:
        cfg = self.cfg
        C = cfg.level_channels
        L = cfg.lift_channels
        fg = cfg.cross == "fg"
        nocross = cfg.cross == "nocross"

        # ---------------- encoder modules (weights shared between clouds)
        if cfg.encoder == "conv":
            level0 = PointwiseBlock(C[0], name="level0")
            level0_1 = self._level_block(0, C[0], "level0_1")
            level0_2 = PointwiseBlock(L[0], name="level0_2")
        else:  # FG family: lift + same-resolution PointConv
            level0_lift = PointwiseBlock(C[0], name="level0_lift")
            level0_pc = PointConv(cfg.feat_nei, C[0],
                                  weightnet=cfg.weightnet[0],
                                  knn_method=cfg.knn_method,
                                  knn_recall=cfg.knn_recall,
                                  knn_precision=cfg.knn_precision,
                                  name="level0")
            level0_2 = PointwiseBlock(L[0], name="level0_1")

        level1 = self._downsample(1, "level1")
        level1_0 = self._level_block(1, C[1], "level1_0")
        level1_1 = PointwiseBlock(L[1], name="level1_1")
        level2 = self._downsample(2, "level2")
        level2_0 = self._level_block(2, C[2], "level2_0")
        level2_1 = PointwiseBlock(L[2], name="level2_1")
        level3 = self._downsample(3, "level3")
        level3_0 = self._level_block(3, C[3], "level3_0")
        level3_1 = PointwiseBlock(L[3], name="level3_1")
        level4 = self._downsample(4, "level4")

        deconv4_3 = PointwiseBlock(cfg.deconv[0], name="deconv4_3")
        deconv3_2 = PointwiseBlock(cfg.deconv[1], name="deconv3_2")
        deconv2_1 = PointwiseBlock(cfg.deconv[2], name="deconv2_1")
        deconv1_0 = PointwiseBlock(cfg.deconv[3], name="deconv1_0")
        deconvs = [deconv1_0, deconv2_1, deconv3_2]   # indexed by fine level

        crosses_m = [self._cross(l, f"cross{l}") for l in range(4)]
        flows_m = [self._flow_head(l, f"flow{l}") for l in range(4)]

        # ---------------- encode both clouds
        def encode(pc0, color):
            if cfg.encoder == "conv":
                f0 = level0(color)
                f0 = level0_1(f0)
                f0_1 = level0_2(f0)
            else:
                f0 = level0_lift(color)
                f0 = level0_pc(pc0, f0, train=train)
                f0_1 = level0_2(f0)

            # levels 2-4 sample by PREFIX: pc1_ is in FPS-selection order,
            # and greedy FPS orderings are nested (nn/pointconv.py
            # _fps_or_prefix), so slicing its first npoints reproduces the
            # reference's per-level FPS chains exactly while skipping their
            # serial iterations (832 of 2880 rounds) and index gathers
            nested = cfg.nested_fps
            pc1_, f1, idx1 = level1(pc0, f0_1, train=train)
            f1 = level1_0(f1)
            f1_2 = level1_1(f1)
            pc2_, f2, idx2 = level2(pc1_, f1_2, train=train,
                                    prefix_sample=nested)
            f2 = level2_0(f2)
            f2_3 = level2_1(f2)
            pc3_, f3, idx3 = level3(pc2_, f2_3, train=train,
                                    prefix_sample=nested)
            f3 = level3_0(f3)
            f3_4 = level3_1(f3)
            pc4_, f4, _ = level4(pc3_, f3_4, train=train,
                                 prefix_sample=nested)
            return dict(pc=[pc0, pc1_, pc2_, pc3_, pc4_],
                        feat=[f0, f1, f2, f3, f4],
                        lift=[f0_1, f1_2, f2_3, f3_4],
                        idx=[idx1, idx2, idx3])

        upsample = functools.partial(upsample_idw, method=cfg.knn_method,
                                     recall=cfg.knn_recall,
                                     precision=cfg.knn_precision)
        warp = functools.partial(point_warp, method=cfg.knn_method,
                                 recall=cfg.knn_recall,
                                 precision=cfg.knn_precision)

        # encode both clouds STACKED along batch: shared weights mean one
        # pass at 2B does the work of two at B — half the dispatches, double
        # the MXU occupancy at eval bs=1, and both clouds' FPS sweeps ride a
        # single Pallas program (the kernel vectorizes batch across sublanes)
        B = xyz1.shape[0]
        e_both = encode(jnp.concatenate([xyz1, xyz2], axis=0),
                        jnp.concatenate([color1, color2], axis=0))
        e1 = jax.tree_util.tree_map(lambda a: a[:B], e_both)
        e2 = jax.tree_util.tree_map(lambda a: a[B:], e_both)
        pc1, pc2 = e1["pc"], e2["pc"]

        def cross_call(lvl, xa, xb, fa, fb):
            if fg:
                return crosses_m[lvl](xa, xb, fa, fb,
                                      e1["feat"][lvl], e2["feat"][lvl])
            return crosses_m[lvl](xa, xb, fa, fb)

        # ---------------- l4 → l3 skip (both clouds stacked)
        f_l4_3 = deconv4_3(upsample(
            jnp.concatenate([pc1[3], pc2[3]], 0),
            jnp.concatenate([pc1[4], pc2[4]], 0),
            jnp.concatenate([e1["feat"][4], e2["feat"][4]], 0)))
        f1_l4_3, f2_l4_3 = f_l4_3[:B], f_l4_3[B:]

        # ---------------- l3 (no warp at the coarsest cross level)
        if cfg.swap_interlevel:   # no_cross swaps clouds (models_bid_no_cross.py:121-122)
            c_feat1 = jnp.concatenate([e1["feat"][3], f2_l4_3], -1)
            c_feat2 = jnp.concatenate([e2["feat"][3], f1_l4_3], -1)
        else:
            c_feat1 = jnp.concatenate([e1["feat"][3], f1_l4_3], -1)
            c_feat2 = jnp.concatenate([e2["feat"][3], f2_l4_3], -1)

        if nocross:
            cross3 = cross_call(3, pc1[3], pc2[3], c_feat1, c_feat2)
            f1_new, f2_new = e1["feat"][3], e2["feat"][3]
        else:
            f1_new, f2_new, cross3 = cross_call(3, pc1[3], pc2[3],
                                                c_feat1, c_feat2)
        feat3, flow3 = flows_m[3](pc1[3], e1["feat"][3], cross3, train=train)

        flows_out: list = [None, None, None, flow3]
        crosses_out: list = [None, None, None, cross3]
        inter1: list = [None] * 4     # upsampled+deconved features per level
        inter2: list = [None] * 4
        c_feats1_out: list = [None, None, None]
        c_feats2_out: list = [None, None, None]

        up_feat = feat3          # the flow head's feature output to upsample
        up_flow_src = flow3
        f1_up_src, f2_up_src = f1_new, f2_new

        # ---------------- l2, l1, l0 coarse-to-fine
        for lvl in (2, 1, 0):
            dec = deconvs[lvl]
            # ONE 3-NN search per level serves both upsample consumers: the
            # deconv feature skip (both clouds stacked) and the flow+feat
            # upsample (cloud-1 half of the same geometry)
            d2_up, idx_up = knn_point_dist(
                3, jnp.concatenate([pc1[lvl + 1], pc2[lvl + 1]], 0),
                jnp.concatenate([pc1[lvl], pc2[lvl]], 0),
                method=cfg.knn_method, recall=cfg.knn_recall,
                precision=cfg.knn_precision)
            # inter-level feature skip from lvl+1 → lvl (both clouds stacked)
            i_both = dec(upsample(
                jnp.concatenate([pc1[lvl], pc2[lvl]], 0),
                jnp.concatenate([pc1[lvl + 1], pc2[lvl + 1]], 0),
                jnp.concatenate([f1_up_src, f2_up_src], 0),
                knn=(d2_up, idx_up)))
            i1, i2 = i_both[:B], i_both[B:]
            inter1[lvl], inter2[lvl] = i1, i2
            if cfg.swap_interlevel:
                c_feat1 = jnp.concatenate([e1["feat"][lvl], i2], -1)
                c_feat2 = jnp.concatenate([e2["feat"][lvl], i1], -1)
            else:
                c_feat1 = jnp.concatenate([e1["feat"][lvl], i1], -1)
                c_feat2 = jnp.concatenate([e2["feat"][lvl], i2], -1)

            # flow + feature share the same source geometry → one IDW kNN,
            # itself the cloud-1 half of the deconv upsample's search
            both_up = upsample(pc1[lvl], pc1[lvl + 1], jnp.concatenate(
                [cfg.scale * up_flow_src, up_feat], axis=-1),
                knn=(d2_up[:B], idx_up[:B]))
            up_flow, feat_up = both_up[..., :3], both_up[..., 3:]

            iter_flows, iter_cfeats1, iter_cfeats2 = [], [], []
            for it in range(cfg.iters):
                iter_cfeats1.append(c_feat1)
                iter_cfeats2.append(c_feat2)
                if it == 0 and lvl in cfg.coarse_warp:
                    # coarse-warp relaxation (ModelConfig.coarse_warp): the
                    # inverse flow is reconstructed at lvl+1 — where the
                    # flow actually lives pre-upsample — and IDW-upsampled
                    # to lvl along the SAME pc2 lvl+1→lvl 3-NN the decoder
                    # already searched (idx_up rows B:), skipping the
                    # lvl-resolution N² warp search entirely
                    inv_coarse = pc2[lvl + 1] - warp(
                        pc1[lvl + 1], pc2[lvl + 1], cfg.scale * up_flow_src)
                    inv_fine = upsample(pc2[lvl], pc2[lvl + 1], inv_coarse,
                                        knn=(d2_up[B:], idx_up[B:]))
                    pc2_warp = pc2[lvl] - inv_fine
                else:
                    pc2_warp = warp(pc1[lvl], pc2[lvl], up_flow)
                if nocross:
                    cross_l = cross_call(lvl, pc1[lvl], pc2_warp,
                                         c_feat1, c_feat2)
                    f1_new, f2_new = e1["feat"][lvl], e2["feat"][lvl]
                else:
                    f1_new, f2_new, cross_l = cross_call(
                        lvl, pc1[lvl], pc2_warp, c_feat1, c_feat2)
                new_feat1 = jnp.concatenate([e1["feat"][lvl], feat_up], -1)
                feat_l, flow_l = flows_m[lvl](pc1[lvl], new_feat1, cross_l,
                                              up_flow, train=train)
                iter_flows.append(flow_l)
                # iterative refinement state (models_bifeat.py:148-156)
                up_flow, feat_up = flow_l, feat_l
                if cfg.iters > 1:
                    c_feat1 = jnp.concatenate([e1["feat"][lvl], f1_new], -1)
                    c_feat2 = jnp.concatenate([e2["feat"][lvl], f2_new], -1)

            flows_out[lvl] = iter_flows if cfg.iters > 1 else iter_flows[0]
            crosses_out[lvl] = cross_l
            c_feats1_out[lvl] = (iter_cfeats1 if cfg.iters > 1
                                 else iter_cfeats1[0])
            c_feats2_out[lvl] = (iter_cfeats2 if cfg.iters > 1
                                 else iter_cfeats2[0])
            up_flow_src, up_feat = flow_l, feat_l
            if nocross:
                f1_up_src = e1["feat"][lvl]
                f2_up_src = e2["feat"][lvl]
            else:
                f1_up_src, f2_up_src = f1_new, f2_new

        # ---------------- output contract
        feat1s = list(e1["lift"])
        feat2s = list(e2["lift"])
        if cfg.returns_c_feats:   # FG family inserts feat_l4 (models_bid_FG.py:189)
            feat1s.append(e1["feat"][4])
            feat2s.append(e2["feat"][4])
        feat1s += [inter1[2], inter1[1], inter1[0]]
        feat2s += [inter2[2], inter2[1], inter2[0]]

        out = dict(
            flows=flows_out,
            fps_idx1=e1["idx"],
            fps_idx2=e2["idx"],
            pc1=pc1[:4],
            pc2=pc2[:4],
            feat1s=feat1s,
            feat2s=feat2s,
            crosses=crosses_out,
        )
        if cfg.returns_c_feats:
            out["c_feat1s"] = c_feats1_out
            out["c_feat2s"] = c_feats2_out
        return out
