"""Bridge module: teacher-feature mixer for bridge distillation.

Reference: models_bridge.py:10-29. Mixes both clouds' teacher l3 features and
re-projects each. The reference applies `out_src` to both branches
(models_bridge.py:27 — `out_target` is constructed but never used); that is a
bug we fix deliberately: each branch gets its own projection. Set
`tied_output=True` to reproduce the reference behavior exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.blocks import PointwiseBlock


class Bridge(nn.Module):
    feat_ch: int = 512
    tied_output: bool = False

    @nn.compact
    def __call__(self, src_feat, target_feat):
        mixed = PointwiseBlock(self.feat_ch, name="mixed_layer")(
            jnp.concatenate([src_feat, target_feat], axis=-1))
        out_src = PointwiseBlock(self.feat_ch, name="out_src")
        out_target = (out_src if self.tied_output
                      else PointwiseBlock(self.feat_ch, name="out_target"))
        final_src = out_src(jnp.concatenate([src_feat, mixed], axis=-1))
        final_tar = out_target(jnp.concatenate([target_feat, mixed], axis=-1))
        return final_src, final_tar
