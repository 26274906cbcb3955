"""Basic building blocks: pointwise dense blocks, bottlenecks, GRU.

Channels-last equivalents of the reference's Conv1d/Conv2d wrappers
(pointconv_util.py:20-54) — a 1×1 conv over (B, C, N) is a Dense over the
trailing channel axis of (B, N, C), which XLA maps straight onto the MXU as a
single (B·N, Cin)×(Cin, Cout) matmul.

Weight init matches torch's Conv/Linear default (kaiming_uniform(a=√5) →
U(±1/√fan_in) for both kernel and bias) so training dynamics match the
reference, which never overrides defaults on these layers.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LEAKY_RATE = 0.1


def torch_kernel_init():
    # kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """Dense with torch-default init (the repo's standard linear layer)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init(),
                            (fan_in, self.features), jnp.float32)
        # accumulate in ≥f32 (bf16 inputs accumulate f32; f64 stays f64 so
        # the float64 parity harness measures math, not a hidden downcast)
        acc = jnp.promote_types(x.dtype, jnp.float32)
        y = jnp.dot(x, kernel.astype(x.dtype),
                    preferred_element_type=acc).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def leaky(x):
    return jax.nn.leaky_relu(x, LEAKY_RATE)


class PointwiseBlock(nn.Module):
    """Dense + activation — the reference's Conv1d/Conv2d block
    (pointconv_util.py:20-54; BN globally off, use_bn=False :18)."""

    features: int
    use_leaky: bool = True

    @nn.compact
    def __call__(self, x):
        y = Dense(self.features)(x)
        return leaky(y) if self.use_leaky else jax.nn.relu(y)


class MLP(nn.Module):
    """Stack of PointwiseBlocks."""

    features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for f in self.features:
            x = PointwiseBlock(f)(x)
        return x


class DepthwiseReLU(nn.Module):
    """Reference ConvBNReLU (pointconv_util3.py:69-81): grouped 1×1 conv with
    groups=in_channels (a per-channel scale into out_channels/in_channels
    copies) + ReLU, no bias."""

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        assert self.features % cin == 0, "grouped conv needs out % in == 0"
        mult = self.features // cin
        # depthwise 1x1: each input channel maps to `mult` outputs.
        kernel = self.param("kernel", torch_kernel_init(), (cin, mult),
                            jnp.float32)
        y = (x[..., :, None] * kernel.astype(x.dtype)).reshape(
            *x.shape[:-1], self.features)
        return jax.nn.relu(y)


class BottleNeck(nn.Module):
    """Residual bottleneck (pointconv_util3.py:51-67): 1×1 → 3-tap conv along
    the point axis → 1×1 (no inner activations) + identity + depthwise branch,
    then ReLU."""

    mid: int
    features: int

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C)
        h = Dense(self.mid)(x)
        h = nn.Conv(self.mid, kernel_size=(3,), padding="SAME", use_bias=False,
                    kernel_init=torch_kernel_init())(h)
        h = Dense(self.features)(h)
        fy = DepthwiseReLU(self.features)(x)
        return jax.nn.relu(h + x + fy)


class ConvGRU(nn.Module):
    """Point-axis GRU cell (pointconv_util.py:56-71, experimental inventory).
    The reference's Conv1d(k=3, pad=1) along the point dimension becomes a
    3-tap nn.Conv over N."""

    hidden: int = 128

    def _conv(self, name, x):
        y = nn.Conv(self.hidden, kernel_size=(3,), padding="SAME",
                    kernel_init=torch_kernel_init(), name=name)(x)
        return leaky(y)

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(self._conv("convz", hx))
        r = jax.nn.sigmoid(self._conv("convr", hx))
        q = jnp.tanh(self._conv("convq", jnp.concatenate([r * h, x], -1)))
        return (1 - z) * h + z * q
