"""Shared building blocks for all DPIG networks.

Conventions (all TPU-first):
  * NHWC everywhere; convs are 3x3 SAME unless noted.
  * Initializers: Xavier-uniform for generator-side nets (slim.conv2d /
    slim.fully_connected defaults in the reference), normal(0.02) for
    discriminators (tflib set_weights_stdev(0.02), wgan_gp.py:411-413).
  * `dtype` arg threads a bf16 compute dtype through the hot path while
    keeping f32 params.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

xavier = nn.initializers.xavier_uniform
d_init = lambda: nn.initializers.normal(stddev=0.02)  # noqa: E731


def leaky_relu(x: jax.Array, alpha: float = 0.3) -> jax.Array:
    """Reference LeakyReLU has alpha=0.3 (models.py:137-138)."""
    return jnp.maximum(alpha * x, x)


class ConvBlockTower(nn.Module):
    """The reference's repeated conv-res tower (models.py:235-244 pattern).

    Per stage idx in [0, repeat_num):
      channel = hidden * (idx+1); two same-channel 3x3 convs + residual;
      stride-2 3x3 conv to hidden*(idx+2) between stages.
    If `collect_skips`, returns the per-stage (pre-downsample) features.
    """
    repeat_num: int
    hidden_num: int
    activation: Callable[[jax.Array], jax.Array] = nn.relu
    collect_skips: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips = []
        for idx in range(self.repeat_num):
            ch = self.hidden_num * (idx + 1)
            res = x
            x = self.activation(nn.Conv(ch, (3, 3), dtype=self.dtype,
                                        kernel_init=xavier())(x))
            x = self.activation(nn.Conv(ch, (3, 3), dtype=self.dtype,
                                        kernel_init=xavier())(x))
            x = x + res
            if self.collect_skips:
                skips.append(x)
            if idx < self.repeat_num - 1:
                x = self.activation(
                    nn.Conv(self.hidden_num * (idx + 2), (3, 3), strides=(2, 2),
                            dtype=self.dtype, kernel_init=xavier())(x))
        if self.collect_skips:
            return x, skips
        return x


class FCResTrunk(nn.Module):
    """FC residual trunk: repeat_num blocks of two hidden->hidden layers
    with residual add (models.py:479-483 / 492-496 / 505-509 pattern).
    """
    repeat_num: int
    hidden_num: int
    activation: Callable[[jax.Array], jax.Array] = nn.relu
    first_activation: Optional[Callable[[jax.Array], jax.Array]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        first_act = self.first_activation
        h = nn.Dense(self.hidden_num, dtype=self.dtype, kernel_init=xavier())(x)
        x = first_act(h) if first_act is not None else h
        for _ in range(self.repeat_num):
            res = x
            x = self.activation(nn.Dense(self.hidden_num, dtype=self.dtype,
                                         kernel_init=xavier())(x))
            x = self.activation(nn.Dense(self.hidden_num, dtype=self.dtype,
                                         kernel_init=xavier())(x))
            x = res + x
        return x
