"""SO(3)-equivariant vector-neuron layers (inventory parity).

Rebuild of the reference vn_layers.py (used only by the experimental VNNConvD,
pointconv_util.py:497-533). Layout here: a vector feature is (..., F, 3) —
F vector channels each carrying a 3-vector — trailing dims channels-last.
Linear maps mix the F axis only, keeping equivariance.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import torch_kernel_init

EPS = 1e-6


def _channel_linear(x, features: int, name: str, module: nn.Module):
    """Bias-free linear over the vector-channel axis (-2)."""
    kernel = module.param(name, torch_kernel_init(),
                          (x.shape[-2], features), jnp.float32)
    return jnp.einsum("...fc,fg->...gc", x, kernel.astype(x.dtype))


class VNLinear(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return _channel_linear(x, self.features, "kernel", self)


def _vn_leaky(p, d, negative_slope=0.2):
    """Direction-gated leaky nonlinearity (vn_layers.py:25-44)."""
    dot = jnp.sum(p * d, axis=-1, keepdims=True)
    mask = (dot >= 0).astype(p.dtype)
    d_norm_sq = jnp.sum(d * d, axis=-1, keepdims=True)
    reflected = p - (dot / (d_norm_sq + EPS)) * d
    return negative_slope * p + (1 - negative_slope) * (
        mask * p + (1 - mask) * reflected)


class VNLeakyReLU(nn.Module):
    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        f = 1 if self.share_nonlinearity else x.shape[-2]
        d = _channel_linear(x, f, "dir_kernel", self)
        return _vn_leaky(x, d, self.negative_slope)


class VNBatchNorm(nn.Module):
    """Normalizes vector magnitudes with a BatchNorm over per-channel norms
    while preserving directions (vn_layers.py:107-128)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = jnp.linalg.norm(x, axis=-1) + EPS
        norm_bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5)(norm)
        return x / norm[..., None] * norm_bn[..., None]


class VNLinearLeakyReLU(nn.Module):
    features: int
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = _channel_linear(x, self.features, "kernel", self)
        if self.use_batchnorm:
            p = VNBatchNorm()(p, train=train)
        f = 1 if self.share_nonlinearity else self.features
        d = _channel_linear(x, f, "dir_kernel", self)
        return _vn_leaky(p, d, self.negative_slope)


class VNMaxPool(nn.Module):
    """Pool over the sample axis (-3) by max learned-direction projection."""

    @nn.compact
    def __call__(self, x):
        # x: (..., K, F, 3) — pool over the K axis
        d = _channel_linear(x, x.shape[-2], "dir_kernel", self)
        dot = jnp.sum(x * d, axis=-1)                     # (..., K, F)
        idx = jnp.argmax(dot, axis=-2, keepdims=True)     # over K
        picked = jnp.take_along_axis(x, idx[..., None], axis=-3)
        return picked.squeeze(-3)


def vn_mean_pool(x, axis=-3):
    return jnp.mean(x, axis=axis)


class VNStdFeature(nn.Module):
    """Produce rotation-invariant features by learning a frame
    (vn_layers.py:151-197)."""

    normalize_frame: bool = False
    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = x.shape[-2]
        z = VNLinearLeakyReLU(f // 2, self.share_nonlinearity,
                              self.negative_slope)(x, train=train)
        z = VNLinearLeakyReLU(f // 4, self.share_nonlinearity,
                              self.negative_slope)(z, train=train)
        out_f = 2 if self.normalize_frame else 3
        z = _channel_linear(z, out_f, "frame_kernel", self)  # (..., out_f, 3)

        if self.normalize_frame:
            v1 = z[..., 0, :]
            u1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + EPS)
            v2 = z[..., 1, :]
            v2 = v2 - jnp.sum(v2 * u1, -1, keepdims=True) * u1
            u2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + EPS)
            u3 = jnp.cross(u1, u2)
            frame = jnp.stack([u1, u2, u3], axis=-2)
        else:
            frame = z
        x_std = jnp.einsum("...fc,...gc->...fg", x, frame)
        return x_std, frame
