"""Auxiliary generator zoo + norm/res blocks — optional-parity components.

These mirror the reference pieces that exist but aren't reached by any
dispatched model (SURVEY §2.3-2.4 "mostly unused"): the igul222 WGAN demo
generators (wgan_gp.py:119-343) and models.py:134-221 helper blocks. Kept
small and tested so the inventory is complete.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import upscale_nn
from .layers import Dtype, d_init, leaky_relu, xavier


class FCGenerator(nn.Module):
    """512-dim 4-layer ReLU MLP G (wgan_gp.py:144-156)."""
    out_dim: int = 128 * 64 * 3
    fc_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, noise):
        x = noise
        for i in range(4):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 kernel_init=d_init(), name=f"fc{i}")(x))
        x = nn.Dense(self.out_dim, dtype=self.dtype, kernel_init=d_init(),
                     name="out")(x)
        return jnp.tanh(x)


class DCGANGenerator(nn.Module):
    """4x-upsampling DCGAN G (wgan_gp.py:158-200 shape recipe) emitting an
    NHWC image; transpose convs replaced by NN-upscale + conv (our standard
    TPU-friendly upsample, same receptive structure)."""
    out_h: int = 64
    out_w: int = 64
    out_channels: int = 3
    dim: int = 64
    bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, noise, *, train: bool = True):
        h0, w0 = self.out_h // 16, self.out_w // 16
        x = nn.Dense(h0 * w0 * 8 * self.dim, dtype=self.dtype,
                     kernel_init=d_init())(noise)
        x = x.reshape(-1, h0, w0, 8 * self.dim)
        ch = 8 * self.dim
        for _ in range(4):
            if self.bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = upscale_nn(x, 2)
            ch //= 2
            x = nn.Conv(max(ch, self.dim // 2), (5, 5), dtype=self.dtype,
                        kernel_init=d_init())(x)
        x = nn.Conv(self.out_channels, (5, 5), dtype=self.dtype,
                    kernel_init=d_init())(x)
        return jnp.tanh(x)


class InstanceNorm(nn.Module):
    """models.py:154-166 Instance_norm (per-sample, per-channel)."""
    dtype: Dtype = jnp.float32
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        normalized = (x - mu) / jnp.sqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        shift = self.param("shift", nn.initializers.zeros, (x.shape[-1],))
        return scale * normalized + shift


class ResBlock(nn.Module):
    """models.py:180-188: two 3x3 convs + (1x1-projected) shortcut."""
    n2: int
    n3: int
    activation: Any = leaky_relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.n3:
            shortcut = nn.Conv(self.n3, (1, 1), dtype=self.dtype,
                               kernel_init=xavier())(x)
        h = self.activation(nn.Conv(self.n2, (3, 3), dtype=self.dtype,
                                    kernel_init=xavier())(x))
        h = nn.Conv(self.n3, (3, 3), dtype=self.dtype, kernel_init=xavier())(h)
        return self.activation(shortcut + h)


class ResBottleneckBlock(nn.Module):
    """models.py:169-178: 1x1 -> 3x3 -> 1x1 bottleneck + shortcut."""
    n2: int
    n3: int
    activation: Any = leaky_relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.n3:
            shortcut = nn.Conv(self.n3, (1, 1), dtype=self.dtype,
                               kernel_init=xavier())(x)
        h = self.activation(nn.Conv(self.n2, (1, 1), dtype=self.dtype,
                                    kernel_init=xavier())(x))
        h = self.activation(nn.Conv(self.n2, (3, 3), dtype=self.dtype,
                                    kernel_init=xavier())(h))
        h = nn.Conv(self.n3, (1, 1), dtype=self.dtype, kernel_init=xavier())(h)
        return self.activation(shortcut + h)


class ConvBnLeakyReLU(nn.Module):
    """models.py:216-220."""
    out_channel: int
    kernel_size: int = 3
    stride: int = 1
    alpha: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.Conv(self.out_channel,
                    (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), dtype=self.dtype,
                    kernel_init=xavier())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return leaky_relu(x, self.alpha)


def pixcnn_gated(a, b):
    """Gated multiplicative nonlinearity (wgan_gp.py:42-43)."""
    return jax.nn.sigmoid(a) * jnp.tanh(b)


class SubpixelConv(nn.Module):
    """Conv to 4x channels + 2x pixel shuffle (wgan_gp.py:45-51
    SubpixelConv2D), NHWC (no transpose round-trips needed on TPU)."""
    out_channels: int
    kernel: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(4 * self.out_channels, (self.kernel, self.kernel),
                    dtype=self.dtype, kernel_init=xavier())(x)
        b, h, w, c4 = x.shape
        c = c4 // 4
        x = x.reshape(b, h, w, 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * 2, w * 2, c)


class WGANResidualBlock(nn.Module):
    """Bottleneck 1-3-1 residual block with 0.3-scaled branch + BN and
    up/down resampling (wgan_gp.py:53-93 ResidualBlock)."""
    out_channels: int
    filter_size: int = 3
    resample: Any = None          # None | 'down' | 'up'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        in_ch = x.shape[-1]
        mid_in, mid_out = in_ch // 2, self.out_channels // 2
        k = (self.filter_size, self.filter_size)

        if self.resample is None and in_ch == self.out_channels:
            shortcut = x
        elif self.resample == "up":
            shortcut = SubpixelConv(self.out_channels, 1,
                                    dtype=self.dtype, name="shortcut")(x)
        else:
            stride = (2, 2) if self.resample == "down" else (1, 1)
            shortcut = nn.Conv(self.out_channels, (1, 1), strides=stride,
                               dtype=self.dtype, kernel_init=xavier(),
                               name="shortcut")(x)

        y = nn.relu(x)
        y = nn.Conv(mid_in, (1, 1), dtype=self.dtype,
                    kernel_init=xavier(), name="conv1")(y)
        y = nn.relu(y)
        if self.resample == "down":
            y = nn.Conv(mid_out, k, strides=(2, 2), dtype=self.dtype,
                        kernel_init=xavier(), name="conv1b")(y)
        elif self.resample == "up":
            y = upscale_nn(y, 2)
            y = nn.Conv(mid_out, k, dtype=self.dtype,
                        kernel_init=xavier(), name="conv1b")(y)
        else:
            y = nn.Conv(mid_out, k, dtype=self.dtype,
                        kernel_init=xavier(), name="conv1b")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, kernel_init=xavier(), name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(y)
        return shortcut + 0.3 * y


class ResnetGenerator(nn.Module):
    """Deep resnet G (wgan_gp.py:330-356... :230-257 ResnetGenerator):
    6 blocks per scale, 4 subpixel upsamples, tanh(out/5)."""
    out_h: int = 128
    out_w: int = 64
    out_channels: int = 3
    dim: int = 64
    blocks_per_scale: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, noise, *, train: bool = True):
        h0, w0 = self.out_h // 16, self.out_w // 16
        ch = 8 * self.dim
        x = nn.Dense(h0 * w0 * ch, dtype=self.dtype,
                     kernel_init=xavier())(noise)
        x = x.reshape(-1, h0, w0, ch)
        for _scale in range(4):
            for _ in range(self.blocks_per_scale):
                x = WGANResidualBlock(ch, 3, dtype=self.dtype)(x,
                                                               train=train)
            ch //= 2
            x = WGANResidualBlock(ch, 3, resample="up",
                                  dtype=self.dtype)(x, train=train)
        for _ in range(self.blocks_per_scale - 1):
            x = WGANResidualBlock(ch, 3, dtype=self.dtype)(x, train=train)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    kernel_init=xavier())(x)
        return jnp.tanh(x / 5.0)
