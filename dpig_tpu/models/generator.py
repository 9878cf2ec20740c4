"""U-net generator with FC bottleneck (models.py:518-576
GeneratorCNN_ID_UAEAfterResidual) and the plain decoder (models.py:252-273).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import upscale_nn
from .layers import ConvBlockTower, Dtype, xavier


class UAEGenerator(nn.Module):
    """Encoder(skips) -> FC z bottleneck -> decoder with skip concat.

    Matches models.py:518-576: encoder stages hidden*(idx+1) with residual
    blocks and stride-2 downsamples; bottleneck FC to z_num (optionally
    concat uniform noise); FC back to (h_min, w_min, hidden); decoder stage
    idx concats encoder skip (repeat-1-idx), runs two full-width convs with
    residual, then NN-upscale + 1x1 conv to hidden*(repeat-idx-1); final 3x3
    conv to out_channels.
    """
    out_channels: int = 3
    z_num: int = 64
    repeat_num: int = 5
    hidden_num: int = 128
    noise_dim: int = 0
    activation: Any = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pose=None, *, rng=None):
        act = self.activation
        if pose is not None:
            x = jnp.concatenate([x, pose.astype(x.dtype)], axis=-1)

        x = act(nn.Conv(self.hidden_num, (3, 3), dtype=self.dtype,
                        kernel_init=xavier())(x))
        x, skips = ConvBlockTower(self.repeat_num, self.hidden_num, act,
                                  collect_skips=True, dtype=self.dtype)(x)

        b, h_min, w_min, _ = x.shape
        flat = x.reshape(b, -1)
        z = nn.Dense(self.z_num, dtype=self.dtype, kernel_init=xavier(),
                     name="bottleneck")(flat)
        zc = z
        if self.noise_dim > 0:
            if rng is None:
                raise ValueError("noise_dim>0 requires an rng")
            noise = jax.random.uniform(rng, (b, self.noise_dim),
                                       minval=-1.0, maxval=1.0,
                                       dtype=jnp.float32).astype(z.dtype)
            zc = jnp.concatenate([z, noise], axis=-1)

        x = nn.Dense(h_min * w_min * self.hidden_num, dtype=self.dtype,
                     kernel_init=xavier(), name="unbottleneck")(zc)
        x = x.reshape(b, h_min, w_min, self.hidden_num)

        for idx in range(self.repeat_num):
            x = jnp.concatenate([x, skips[self.repeat_num - 1 - idx]], axis=-1)
            ch = x.shape[-1]
            res = x
            x = act(nn.Conv(ch, (3, 3), dtype=self.dtype, kernel_init=xavier())(x))
            x = act(nn.Conv(ch, (3, 3), dtype=self.dtype, kernel_init=xavier())(x))
            x = x + res
            if idx < self.repeat_num - 1:
                x = upscale_nn(x, 2)
                x = act(nn.Conv(self.hidden_num * (self.repeat_num - idx - 1),
                                (1, 1), dtype=self.dtype, kernel_init=xavier())(x))

        out = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                      kernel_init=xavier(), name="to_rgb")(x)
        return out, z


class PlainDecoder(nn.Module):
    """Conv decoder (models.py:252-273 GeneratorCNN_ID_Decoder)."""
    out_h: int = 128
    out_w: int = 64
    out_channels: int = 3
    repeat_num: int = 5
    hidden_num: int = 128
    activation: Any = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        act = self.activation
        in_h = self.out_h // (2 ** (self.repeat_num - 1))
        in_w = self.out_w // (2 ** (self.repeat_num - 1))
        x = act(nn.Dense(in_h * in_w * self.hidden_num * self.repeat_num,
                         dtype=self.dtype, kernel_init=xavier())(z))
        x = x.reshape(-1, in_h, in_w, self.hidden_num * self.repeat_num)
        for idx in range(self.repeat_num):
            ch = self.hidden_num * (self.repeat_num - idx)
            res = x
            x = act(nn.Conv(ch, (3, 3), dtype=self.dtype, kernel_init=xavier())(x))
            x = act(nn.Conv(ch, (3, 3), dtype=self.dtype, kernel_init=xavier())(x))
            x = res + x
            if idx < self.repeat_num - 1:
                x = upscale_nn(x, 2)
                x = act(nn.Conv(self.hidden_num * (self.repeat_num - idx - 1),
                                (1, 1), dtype=self.dtype, kernel_init=xavier())(x))
        return nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                       kernel_init=xavier())(x)
