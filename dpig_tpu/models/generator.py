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


def _constant_input_stem(kernel, bias, embs, pose, dtype):
    """Exact stem conv for concat(tile(embs), pose) without the tiled map.

    kernel: [3,3,D+P,hid]; embs: [B,D]; pose: [B,H,W,P].
    conv(tile(e))[i,j] = e @ (sum of kernel taps valid at (i,j)) — with
    SAME padding the valid-tap set has 9 border classes (3 row x 3 col),
    so the embedding contributes 9 per-sample bias vectors selected by
    position. The pose channels are convolved normally.
    """
    d = embs.shape[-1]
    _, h, w, _p = pose.shape
    k_pose = kernel[:, :, d:, :].astype(dtype)

    pose_part = jax.lax.conv_general_dilated(
        pose.astype(dtype), k_pose, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return pose_part + _stem_bias_map(kernel, bias, embs, h, w, dtype)


def _stem_bias_map(kernel, bias, embs, h, w, dtype):
    """Constant-embedding contribution of the stem conv: the 9
    border-class bias vectors selected per pixel (see
    `_constant_input_stem`), plus the conv bias. Shared with the int8
    stem in models/quant.py, whose pose conv runs s8 while this map
    stays float."""
    d = embs.shape[-1]
    k_emb = kernel[:, :, :d, :].astype(jnp.float32)       # [3,3,D,hid]

    # T[r, c] = sum over taps valid for row-class r / col-class c.
    # row class 0 = top (kernel row 0 falls outside), 1 = interior,
    # 2 = bottom; same for columns. Tap (kr, kc) with offset kr-1:
    # top rows exclude kr=0, bottom rows exclude kr=2.
    def class_slices(idx):
        return {0: slice(1, 3), 1: slice(0, 3), 2: slice(0, 2)}[idx]

    t = jnp.stack([
        jnp.stack([k_emb[class_slices(r), class_slices(c)].sum((0, 1))
                   for c in range(3)]) for r in range(3)])   # [3,3,D,hid]
    biases = jnp.einsum("bd,rcdh->brch", embs.astype(jnp.float32), t)
    biases = biases.astype(dtype)                            # [B,3,3,hid]

    # Select the border-class bias per pixel with iota compares instead of
    # materializing a full-resolution bias map: nested `where`s on tiny
    # [B,1/row,1/col,hid] operands fuse into the pose conv's epilogue
    # (measured on the v5e: the concat construction costs a full-res
    # bf16 broadcast+concat pass, ~0.5 ms/256-batch).
    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)

    def sel_col(three):  # [B,3,hid] -> [B,1,W,hid]
        top, mid, bot = (three[:, 0, None, None, :],
                         three[:, 1, None, None, :],
                         three[:, 2, None, None, :])
        return jnp.where(col == 0, top,
                         jnp.where(col == w - 1, bot, mid))

    # bias_map[b,i,j] = biases[b, row_cls(i), col_cls(j)]: select columns
    # within each row class, then rows.
    per_row = [sel_col(biases[:, r]) for r in range(3)]      # [B,1,W,hid]*3
    bias_map = jnp.where(row == 0, per_row[0],
                         jnp.where(row == h - 1, per_row[2], per_row[1]))
    return bias_map + bias.astype(dtype)


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
    def __call__(self, x, pose=None, *, rng=None, embs_const=None):
        """Either `x` is an [B,H,W,C] map (general path), or `embs_const`
        is a [B,D] per-sample constant whose tiled map would be the input
        — the DPIG case (trainer.py:588-590 tiles the embedding over HxW).

        With `embs_const`, the stem conv is decomposed exactly: a
        spatially-constant input contributes only a per-sample bias whose
        value depends on the SAME-padding border class (9 classes for a
        3x3 kernel), so the 352-channel map is never materialized and the
        stem convolves only the 18 pose channels — ~8% of generator FLOPs
        and the map's HBM traffic saved, bit-compatible gradients included.
        """
        act = self.activation
        if embs_const is not None:
            assert x is None and pose is not None
            in_ch = embs_const.shape[-1] + pose.shape[-1]
            kernel = self.param(
                "stem_kernel", xavier(), (3, 3, in_ch, self.hidden_num))
            bias = self.param("stem_bias", nn.initializers.zeros,
                              (self.hidden_num,))
            x = _constant_input_stem(kernel, bias, embs_const, pose,
                                     self.dtype)
        else:
            if pose is not None:
                x = jnp.concatenate([x, pose.astype(x.dtype)], axis=-1)
            in_ch = x.shape[-1]
            kernel = self.param(
                "stem_kernel", xavier(), (3, 3, in_ch, self.hidden_num))
            bias = self.param("stem_bias", nn.initializers.zeros,
                              (self.hidden_num,))
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + bias.astype(self.dtype)
        x = act(x)
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
