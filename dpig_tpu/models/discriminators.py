"""Discriminator zoo (wgan_gp.py:347-576).

  * DCGANDiscriminator — 5x5/2 conv stack + linear logit. The reference has
    separate 128x64 (4 stages, wgan_gp.py:407-440) and 256x256 (5 stages,
    wgan_gp.py:473-510) copies; here one module parameterized by `n_stages`.
    Norm switches with the GAN mode exactly as wgan_gp.py:34-40: LayerNorm
    under 'wgan-gp' (double-backward-safe), BatchNorm otherwise, none if
    bn=False.
  * FCDiscriminator — LeakyReLU MLP critic for embedding spaces
    (wgan_gp.py:399-405).

Discriminator weights use normal(0.02) init (tflib set_weights_stdev(0.02)).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, d_init, leaky_relu


class DCGANDiscriminator(nn.Module):
    dim: int = 64
    n_stages: int = 4            # 4 for 128x64, 5 for 256x256
    mode: str = "dcgan"          # 'wgan-gp' -> LayerNorm; else BatchNorm
    bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        ch = self.dim
        for stage in range(self.n_stages):
            x = nn.Conv(ch, (5, 5), strides=(2, 2), dtype=self.dtype,
                        kernel_init=d_init())(x)
            if stage > 0 and self.bn:
                if self.mode == "wgan-gp":
                    x = nn.LayerNorm(dtype=self.dtype)(x)
                else:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=self.dtype)(x)
            x = leaky_relu(x)
            if stage < self.n_stages - 1:
                ch = min(ch * 2, self.dim * 8)
        x = x.reshape(x.shape[0], -1)
        logit = nn.Dense(1, dtype=self.dtype, kernel_init=d_init(),
                         name="logit")(x)
        return logit.reshape(-1)


class FCDiscriminator(nn.Module):
    fc_dim: int = 512
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = leaky_relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                kernel_init=d_init(), name="input")(x))
        for i in range(self.n_layers):
            x = leaky_relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                    kernel_init=d_init(), name=f"h{i}")(x))
        logit = nn.Dense(1, dtype=self.dtype, kernel_init=d_init(),
                         name="out")(x)
        return logit.reshape(-1)
