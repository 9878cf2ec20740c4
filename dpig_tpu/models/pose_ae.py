"""FC-residual pose autoencoder (models.py:488-515).

Encoder: 54-dim normalized (r,c,v)*18 -> hidden 512, 4 res blocks -> z 32.
Decoder: z -> hidden (NO first activation, models.py:504), 4 res blocks ->
  coords head (K*2, linear) + visibility head (K, sigmoid -> STE round).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.ste import binary_round
from .layers import Dtype, FCResTrunk, leaky_relu, xavier


class PoseEncoderFC(nn.Module):
    z_num: int = 32
    repeat_num: int = 4
    hidden_num: int = 512
    activation: Any = leaky_relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pose_rcv_flat):
        x = FCResTrunk(self.repeat_num, self.hidden_num, self.activation,
                       first_activation=self.activation,
                       dtype=self.dtype)(pose_rcv_flat)
        return nn.Dense(self.z_num, dtype=self.dtype, kernel_init=xavier())(x)


class PoseDecoderFC(nn.Module):
    keypoint_num: int = 18
    repeat_num: int = 4
    hidden_num: int = 512
    activation: Any = leaky_relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = FCResTrunk(self.repeat_num, self.hidden_num, self.activation,
                       first_activation=None, dtype=self.dtype)(z)
        coords = nn.Dense(self.keypoint_num * 2, dtype=self.dtype,
                          kernel_init=xavier(), name="coords")(x)
        vis = nn.sigmoid(nn.Dense(self.keypoint_num, dtype=self.dtype,
                                  kernel_init=xavier(), name="visible")(x))
        vis = binary_round(vis)
        return coords, vis


def assemble_pose_rcv(coords, vis, keypoint_num=18):
    """[B,K*2] coords + [B,K] vis -> [B,K,3] rcv (trainer.py:657)."""
    b = coords.shape[0]
    return jnp.concatenate(
        [coords.reshape(b, keypoint_num, 2), vis[..., None]], axis=-1)
