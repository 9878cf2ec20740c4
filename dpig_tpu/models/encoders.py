"""Appearance encoders (reference models.py:224-471).

Three variants, all built on a weight-shared ROI tower:
  * RoiEncoder          — models.py:275-325  (no visibility masking)
  * RoiEncoderVis       — models.py:328-388  (per-part visibility zeroing)
  * RoiEncoderFgBg      — models.py:390-471  (FG ROI branch + BG branch,
                          the Market Stage-I encoder)
  * PlainEncoder        — models.py:224-250  (conv AE encoder)

TPU design: the P per-part crops are folded into the batch axis
([P*B, roi, roi, C]) so the shared tower runs as one big conv stack on the
MXU instead of P small ones.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.crop import crop_body_rois_mm as crop_body_rois
from ..ops.ste import bernoulli_sample
from .layers import ConvBlockTower, Dtype, xavier


class _Stem(nn.Module):
    """Stem conv + one res block (models.py:396-400)."""
    hidden_num: int
    activation: Any = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = self.activation
        x = act(nn.Conv(self.hidden_num, (3, 3), dtype=self.dtype,
                        kernel_init=xavier())(x))
        res = x
        x = act(nn.Conv(self.hidden_num, (3, 3), dtype=self.dtype,
                        kernel_init=xavier())(x))
        x = act(nn.Conv(self.hidden_num, (3, 3), dtype=self.dtype,
                        kernel_init=xavier())(x))
        return x + res


class _RoiTower(nn.Module):
    """Weight-shared tower over stacked ROIs -> per-part z (models.py:420-431)."""
    z_num: int
    repeat_num: int
    hidden_num: int
    activation: Any = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rois):  # [P*B, roi, roi, C]
        x = ConvBlockTower(self.repeat_num, self.hidden_num, self.activation,
                           dtype=self.dtype)(rois)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.z_num, dtype=self.dtype, kernel_init=xavier())(x)


def _apply_vis_and_dropout(fea, part_vis, part_num, z_num, keep_part_prob, rng):
    """Visibility zeroing (models.py:433-442) + optional Bernoulli part
    dropout with straight-through gradient (models.py:443-451).

    fea: [P*B, z] part-major; part_vis: [B, P] or None.
    Returns [B, P*z].
    """
    pb, z = fea.shape
    b = pb // part_num
    fea = fea.reshape(part_num, b, z)
    if part_vis is not None:
        vis = part_vis.astype(fea.dtype).T[:, :, None]  # [P,B,1]
        fea = fea * vis
    if keep_part_prob < 1.0 and rng is not None:
        probs = jnp.full((part_num, b, 1), keep_part_prob, dtype=fea.dtype)
        mask = bernoulli_sample(probs, rng)
        fea = fea * mask
    # Concat parts along features: [B, P*z]
    return jnp.transpose(fea, (1, 0, 2)).reshape(b, part_num * z)


class RoiEncoder(nn.Module):
    """7-part ROI encoder, no visibility (models.py:275-325).

    Used by Market model 1 (trainer.py:272) and tester model 11.
    """
    part_num: int = 7
    z_num: int = 32
    repeat_num: int = 5
    hidden_num: int = 128
    roi_size: int = 48
    activation: Any = nn.relu
    keep_part_prob: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, part_bbox, part_vis=None, *, rng=None):
        x = _Stem(self.hidden_num, self.activation, self.dtype)(x)
        rois = crop_body_rois(x, part_bbox, self.roi_size)
        fea = _RoiTower(self.z_num, self.repeat_num, self.hidden_num,
                        self.activation, self.dtype)(rois)
        return _apply_vis_and_dropout(fea, part_vis, self.part_num, self.z_num,
                                      self.keep_part_prob, rng)


class RoiEncoderFgBg(nn.Module):
    """FG/BG two-branch ROI encoder (models.py:390-471) — the Market
    Stage-I appearance encoder (trainer.py:581).

    FG: feature map masked by fg_mask, 7 ROI crops -> shared tower -> 7*z.
    BG: feature map masked by (1-fg_mask) -> own tower -> 4*z code.
    Output: [B, part_num*z + 4*z]  (352 dims for z=32, P=7).
    """
    part_num: int = 7
    z_num: int = 32
    repeat_num: int = 5
    hidden_num: int = 128
    roi_size: int = 48
    activation: Any = nn.relu
    keep_part_prob: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fg_mask, part_bbox, part_vis, *, rng=None):
        x = _Stem(self.hidden_num, self.activation, self.dtype)(x)
        m = fg_mask.astype(x.dtype)
        x_fg = x * m
        x_bg = x * (1.0 - m)

        rois = crop_body_rois(x_fg, part_bbox, self.roi_size)
        fea = _RoiTower(self.z_num, self.repeat_num, self.hidden_num,
                        self.activation, self.dtype, name="fg_tower")(rois)
        fg = _apply_vis_and_dropout(fea, part_vis, self.part_num, self.z_num,
                                    self.keep_part_prob, rng)

        bg = ConvBlockTower(self.repeat_num, self.hidden_num, self.activation,
                            dtype=self.dtype, name="bg_tower")(x_bg)
        bg = bg.reshape(bg.shape[0], -1)
        bg = nn.Dense(self.z_num * 4, dtype=self.dtype, kernel_init=xavier(),
                      name="bg_fc")(bg)
        return jnp.concatenate([fg, bg], axis=-1)


class PlainEncoder(nn.Module):
    """Plain conv encoder (models.py:224-250 GeneratorCNN_ID_Encoder)."""
    z_num: int = 64
    repeat_num: int = 5
    hidden_num: int = 128
    activation: Any = nn.elu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pose=None):
        if pose is not None:
            x = jnp.concatenate([x, pose], axis=-1)
        x = self.activation(nn.Conv(self.hidden_num, (3, 3), dtype=self.dtype,
                                    kernel_init=xavier())(x))
        x = ConvBlockTower(self.repeat_num, self.hidden_num, self.activation,
                           dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.z_num, dtype=self.dtype, kernel_init=xavier())(x)


def tile_embedding(embs: jax.Array, img_h: int, img_w: int) -> jax.Array:
    """Broadcast a [B, D] embedding to an NHWC [B, H, W, D] map.

    Matches trainer.py:588-590 (tile over H*W then NCHW->NHWC); on TPU this
    is a free broadcast that XLA fuses into the consuming conv.
    """
    return jnp.broadcast_to(embs[:, None, None, :],
                            (embs.shape[0], img_h, img_w, embs.shape[-1]))
