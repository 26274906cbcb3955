"""WeightNet: the continuous-convolution weight MLP of PointConv.

Reference: pointconv_util.py:184-215. MLP(3 → 8 → 8 → W) over the relative
neighbor coordinates, ReLU between layers (BN off globally, use_bn=False).
Operates channels-last on (B, N, K, 3).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from .blocks import Dense


class WeightNet(nn.Module):
    out_channel: int
    hidden: Sequence[int] = (8, 8)

    @nn.compact
    def __call__(self, rel_xyz):
        w = rel_xyz
        for h in self.hidden:
            w = jax.nn.relu(Dense(h)(w))
        return jax.nn.relu(Dense(self.out_channel)(w))
