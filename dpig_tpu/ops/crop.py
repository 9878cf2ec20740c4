"""Static-shape bilinear ROI crop (TPU replacement for tf.image.crop_and_resize).

The reference encoder crops 7 body-part ROIs per image with
`tf.image.crop_and_resize` (models.py:297,350,415), normalizing the integer
pixel bboxes by H/W (NOT H-1/W-1 — models.py:292-296; replicated exactly).

TF crop_and_resize bilinear semantics (crop size > 1):
    in_y(i) = y1*(H-1) + i * (y2-y1)*(H-1)/(crop_h-1)
samples outside the image read extrapolation_value=0.

On TPU we implement it as a gather-free weighted sum of 4 dynamic gathers
along each axis — actually as one-hot matmuls would burn MXU time, so we use
`jax.vmap`-ed take-along-axis gathers with static output shapes.  ROIs are
folded into the batch axis exactly as the reference stacks them
(models.py:420 `tf.concat(body_roi_list, axis=0)`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_and_resize(
    feat: jax.Array,
    boxes: jax.Array,
    crop_h: int,
    crop_w: int,
) -> jax.Array:
    """Bilinear crop+resize with TF semantics.

    Args:
      feat: [B, H, W, C] feature map.
      boxes: [B, 4] normalized (y1, x1, y2, x2) — each box crops its own
        batch element (the reference always uses box_ind = range(B)).
      crop_h, crop_w: static output size.

    Returns:
      [B, crop_h, crop_w, C].
    """
    b, h, w, c = feat.shape
    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    def axis_coords(lo, hi, size, crop_size):
        # TF: crop>1 -> lo*(S-1) + i*(hi-lo)*(S-1)/(crop-1); crop==1 -> center.
        i = jnp.arange(crop_size, dtype=jnp.float32)
        if crop_size > 1:
            return lo[:, None] * (size - 1) + i[None, :] * (
                (hi - lo)[:, None] * (size - 1) / (crop_size - 1)
            )
        return 0.5 * (lo + hi)[:, None] * (size - 1) + 0.0 * i[None, :]

    ys = axis_coords(y1, y2, h, crop_h)  # [B, crop_h]
    xs = axis_coords(x1, x2, w, crop_w)  # [B, crop_w]

    def sample_one(img, ys_i, xs_i):
        # img: [H, W, C]; ys_i: [crop_h]; xs_i: [crop_w]
        y0 = jnp.floor(ys_i)
        x0 = jnp.floor(xs_i)
        wy = ys_i - y0
        wx = xs_i - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        def gather_rows(yi):
            valid = (yi >= 0) & (yi < h)
            rows = jnp.take(img, jnp.clip(yi, 0, h - 1), axis=0)
            return rows * valid[:, None, None].astype(img.dtype)

        def gather_cols(rows, xi):
            valid = (xi >= 0) & (xi < w)
            cols = jnp.take(rows, jnp.clip(xi, 0, w - 1), axis=1)
            return cols * valid[None, :, None].astype(rows.dtype)

        top = gather_rows(y0i)          # [crop_h, W, C]
        bot = gather_rows(y0i + 1)
        rows = top * (1.0 - wy)[:, None, None] + bot * wy[:, None, None]
        left = gather_cols(rows, x0i)   # [crop_h, crop_w, C]
        right = gather_cols(rows, x0i + 1)
        out = left * (1.0 - wx)[None, :, None] + right * wx[None, :, None]
        # TF zeroes samples whose *box coordinate* is outside the image.
        y_in = (ys_i >= 0) & (ys_i <= h - 1)
        x_in = (xs_i >= 0) & (xs_i <= w - 1)
        return out * y_in[:, None, None] * x_in[None, :, None]

    return jax.vmap(sample_one)(feat, ys, xs)


def crop_body_rois(
    feat: jax.Array,
    part_bbox: jax.Array,
    roi_size: int,
) -> jax.Array:
    """Crop the selected body-part ROIs, folding parts into the batch axis.

    Args:
      feat: [B, H, W, C].
      part_bbox: [B, P, 4] integer pixel (y1, x1, y2, x2).

    Returns:
      [P*B, roi_size, roi_size, C] — part-major stacking, matching the
      reference's `tf.concat([roi_0..roi_P], axis=0)` (models.py:405-420).
    """
    b, h, w, _ = feat.shape
    p = part_bbox.shape[1]
    bb = part_bbox.astype(jnp.float32)
    # Normalize by H/W (reference models.py:292-296 divides by H, not H-1).
    norm = jnp.array([h, w, h, w], dtype=jnp.float32)
    boxes = bb / norm  # [B, P, 4]
    boxes = jnp.transpose(boxes, (1, 0, 2)).reshape(p * b, 4)
    feat_rep = jnp.tile(feat, (p, 1, 1, 1))
    return crop_and_resize(feat_rep, boxes, roi_size, roi_size)
