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

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, d_init, leaky_relu, xavier


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


class RegionDiscriminator(nn.Module):
    """DCGANDiscriminatorRegion (wgan_gp.py:513-546): 3x stride-2 5x5 convs
    then a stride-1 conv to a 1-channel per-region score map [B, H/8, W/8].
    Selectable via --D_arch=DCGANRegion* (trainer.py:156-157)."""
    dim: int = 64
    mode: str = "dcgan"
    bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        ch = self.dim
        for stage in range(3):
            x = nn.Conv(ch, (5, 5), strides=(2, 2), dtype=self.dtype,
                        kernel_init=d_init())(x)
            if stage > 0 and self.bn:
                if self.mode == "wgan-gp":
                    x = nn.LayerNorm(dtype=self.dtype)(x)
                else:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=self.dtype)(x)
            x = leaky_relu(x)
            ch *= 2
        x = nn.Conv(1, (5, 5), strides=(1, 1), dtype=self.dtype,
                    kernel_init=d_init())(x)
        return x[..., 0]  # [B, H/8, W/8] score map


class PatchDiscriminator(nn.Module):
    """pix2pix-style PatchGAN critic (wgan_gp.py:549-576): 4x4 convs with
    reflect padding, stride-2 except the two last layers, 1-ch logit map."""
    dim: int = 64
    n_layers: int = 3
    mode: str = "dcgan"
    bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        def conv_reflect(z, ch, stride):
            z = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            return nn.Conv(ch, (4, 4), strides=(stride, stride),
                           padding="VALID", dtype=self.dtype,
                           kernel_init=d_init())(z)

        if x.shape[1] < 2 ** (self.n_layers + 1) or \
                x.shape[2] < 2 ** (self.n_layers + 1):
            raise ValueError(
                f"PatchDiscriminator needs inputs >= "
                f"{2 ** (self.n_layers + 1)}px per side (got {x.shape}); "
                "the stride chain would produce an empty logit map")
        x = leaky_relu(conv_reflect(x, self.dim, 2))
        for i in range(self.n_layers):
            ch = self.dim * min(2 ** (i + 1), 8)
            stride = 1 if i == self.n_layers - 1 else 2
            x = conv_reflect(x, ch, stride)
            if self.bn:
                if self.mode == "wgan-gp":
                    x = nn.LayerNorm(dtype=self.dtype)(x)
                else:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=self.dtype)(x)
            x = leaky_relu(x)
        x = conv_reflect(x, 1, 1)
        return x[..., 0]


def get_discriminator(arch: str, *, n_stages: int = 4, mode: str = "dcgan",
                      dtype=jnp.float32):
    """--D_arch selector (trainer.py:151-158): DCGAN | FCDis | DCGANRegion*
    (+ Patch* as optional parity)."""
    if arch == "DCGAN":
        return DCGANDiscriminator(n_stages=n_stages, mode=mode, dtype=dtype)
    if arch == "FCDis":
        return FCDiscriminator(dtype=dtype)
    if arch.startswith("DCGANRegion"):
        return RegionDiscriminator(mode=mode, dtype=dtype)
    if arch.startswith("Patch"):
        return PatchDiscriminator(mode=mode, dtype=dtype)
    raise ValueError(f"You must choose an architecture! (got {arch!r})")


class DCGANDiscriminatorAttr(nn.Module):
    """Attribute head D (wgan_gp.py:442-472): two 5x5/2 convs with dropout
    -> 512 FC -> attr_num logits. The reference feeds it 8x4 maps."""
    attr_num: int = 27
    dim: int = 64
    keep_prob: float = 1.0
    bn: bool = True
    mode: str = "dcgan"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True, dropout_rng=None):
        def drop(h):
            if self.keep_prob >= 1.0 or not train:
                return h
            return nn.Dropout(rate=1.0 - self.keep_prob,
                              deterministic=False)(h, rng=dropout_rng)

        x = nn.Conv(self.dim, (5, 5), strides=(2, 2), dtype=self.dtype,
                    kernel_init=d_init())(x)
        x = drop(leaky_relu(x))
        x = nn.Conv(2 * self.dim, (5, 5), strides=(2, 2), dtype=self.dtype,
                    kernel_init=d_init())(x)
        if self.bn:
            if self.mode == "wgan-gp":
                x = nn.LayerNorm(dtype=self.dtype)(x)
            else:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype)(x)
        x = drop(leaky_relu(x))
        x = x.reshape(x.shape[0], -1)
        x = drop(leaky_relu(nn.Dense(512, dtype=self.dtype,
                                     kernel_init=d_init())(x)))
        return nn.Dense(self.attr_num, dtype=self.dtype,
                        kernel_init=d_init())(x)


class MultiplicativeDCGANDiscriminator(nn.Module):
    """Gated-nonlinearity DCGAN D (wgan_gp.py:347-372): each conv emits
    2x channels split into sigmoid/tanh gates."""
    dim: int = 64
    n_stages: int = 4
    bn: bool = True
    mode: str = "dcgan"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        from .zoo import pixcnn_gated
        ch = self.dim
        for stage in range(self.n_stages):
            x = nn.Conv(2 * ch, (5, 5), strides=(2, 2), dtype=self.dtype,
                        kernel_init=d_init())(x)
            if stage > 0 and self.bn:
                if self.mode == "wgan-gp":
                    x = nn.LayerNorm(dtype=self.dtype)(x)
                else:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=self.dtype)(x)
            # NHWC: even/odd channel split mirrors the NCHW [:, ::2]/[1::2]
            x = pixcnn_gated(x[..., ::2], x[..., 1::2])
            if stage < self.n_stages - 1:
                ch = min(ch * 2, self.dim * 8)
        x = x.reshape(x.shape[0], -1)
        logit = nn.Dense(1, dtype=self.dtype, kernel_init=d_init(),
                         name="logit")(x)
        return logit.reshape(-1)


class ResnetDiscriminator(nn.Module):
    """Deep resnet D (wgan_gp.py:374-397): 1x1 stem, 5-6 residual blocks
    per scale with 4 downsamples, logits/5."""
    dim: int = 64
    blocks_per_scale: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        from .zoo import WGANResidualBlock
        ch = self.dim // 2
        x = nn.Conv(ch, (1, 1), dtype=self.dtype, kernel_init=xavier(),
                    name="stem")(x)
        for _ in range(self.blocks_per_scale - 1):
            x = WGANResidualBlock(ch, 3, dtype=self.dtype)(x, train=train)
        for _scale in range(4):
            ch *= 2
            x = WGANResidualBlock(ch, 3, resample="down",
                                  dtype=self.dtype)(x, train=train)
            for _ in range(self.blocks_per_scale):
                x = WGANResidualBlock(ch, 3, dtype=self.dtype)(x,
                                                               train=train)
        x = x.reshape(x.shape[0], -1)
        logit = nn.Dense(1, dtype=self.dtype, kernel_init=d_init(),
                         name="logit")(x)
        return logit.reshape(-1) / 5.0
