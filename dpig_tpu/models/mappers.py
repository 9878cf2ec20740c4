"""Gaussian->embedding mapping networks (models.py:474-486 GaussianFCRes).

Stage-II samplers: z ~ N(0, 0.2^2) -> FC-res trunk -> embedding. The noise
is drawn *outside* the module (explicit rng threading) so the mapper is a
pure function suitable for jit/scan.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, FCResTrunk, leaky_relu, xavier

GAUSSIAN_STDDEV = 0.2  # models.py:474 (mean=0.0, stddev=0.2)


def sample_mapper_noise(rng, batch, dim, stddev=GAUSSIAN_STDDEV):
    return jax.random.normal(rng, (batch, dim)) * stddev


class GaussianMapper(nn.Module):
    out_dim: int = 224          # 7*32 for FG; 128 for BG; 32 for pose
    repeat_num: int = 4
    hidden_num: int = 512       # 512 FG/pose, 256 BG (trainer.py:754-758)
    activation: Any = leaky_relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = FCResTrunk(self.repeat_num, self.hidden_num, self.activation,
                       first_activation=self.activation, dtype=self.dtype)(z)
        return nn.Dense(self.out_dim, dtype=self.dtype, kernel_init=xavier())(x)
