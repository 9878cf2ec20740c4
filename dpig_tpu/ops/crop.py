"""Static-shape bilinear ROI crop (TPU replacement for tf.image.crop_and_resize).

The reference encoder crops 7 body-part ROIs per image with
`tf.image.crop_and_resize` (models.py:297,350,415), normalizing the integer
pixel bboxes by H/W (NOT H-1/W-1 — models.py:292-296; replicated exactly).

TF crop_and_resize bilinear semantics (crop size > 1):
    in_y(i) = y1*(H-1) + i * (y2-y1)*(H-1)/(crop_h-1)
samples outside the image read extrapolation_value=0.

Two TPU implementations, numerically identical (rtol 1e-6):
  * `crop_and_resize` / `crop_body_rois` — vmap-ed take() gathers. Simple,
    but XLA's TPU gather lowering stalls (~43 ms per 7x256 Market ROI
    batch, measured).
  * `crop_and_resize_mm` / `crop_body_rois_mm` — bilinear resampling
    expressed as two small batched MXU contractions (the interpolation
    matrix has 2 nonzeros per row). ~250 GFLOP of matmul replaces the
    gather stalls; this is the default used by the encoders.
ROIs are folded into the batch axis exactly as the reference stacks them
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


def _interp_matrix(lo, hi, size, crop_size):
    """Per-box bilinear interpolation matrix M [crop_size, size]:
    out = M @ input  along one axis, with TF crop_and_resize semantics
    (including zero extrapolation). lo/hi: [N] normalized box coords.
    Returns [N, crop_size, size].
    """
    n = lo.shape[0]
    i = jnp.arange(crop_size, dtype=jnp.float32)
    if crop_size > 1:
        coords = lo[:, None] * (size - 1) + i[None, :] * (
            (hi - lo)[:, None] * (size - 1) / (crop_size - 1))
    else:
        coords = 0.5 * (lo + hi)[:, None] * (size - 1) + 0.0 * i[None, :]
    c0 = jnp.floor(coords)
    w = coords - c0                                      # [N, crop]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    c0i = c0[..., None].astype(jnp.int32)                # [N, crop, 1]
    m = ((idx == c0i).astype(jnp.float32) * (1.0 - w)[..., None]
         + (idx == c0i + 1).astype(jnp.float32) * w[..., None])
    # TF zeroes samples whose box coordinate is outside the image.
    valid = ((coords >= 0) & (coords <= size - 1)).astype(jnp.float32)
    return m * valid[..., None]


def crop_and_resize_mm(feat: jax.Array, boxes: jax.Array, crop_h: int,
                       crop_w: int) -> jax.Array:
    """crop_and_resize as two batched MXU contractions (no gathers).

    Bilinear resampling along an axis is a sparse linear map; materializing
    it as a dense [crop, size] matrix turns the TPU-hostile gather into two
    small matmuls (~250 GFLOP per 7x256 Market ROI batch vs ~43 ms of
    gather stalls — measured 17x faster end-to-end on v5e). Exact same
    arithmetic as `crop_and_resize` (the matrices have the identical two
    weights per row; remaining terms are exact zeros).
    """
    b, h, w, c = feat.shape
    boxes = boxes.astype(jnp.float32)
    my = _interp_matrix(boxes[:, 0], boxes[:, 2], h, crop_h)  # [B,ch,H]
    mx = _interp_matrix(boxes[:, 1], boxes[:, 3], w, crop_w)  # [B,cw,W]
    rows = jax.lax.dot_general(
        my, feat.astype(jnp.float32).reshape(b, h, w * c),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # [B,ch,W*C]
    rows = rows.reshape(b, crop_h, w, c)
    out = jax.lax.dot_general(
        mx, rows,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # [B,cw,ch,C]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(feat.dtype)


def crop_body_rois_mm(feat: jax.Array, part_bbox: jax.Array,
                      roi_size: int) -> jax.Array:
    """MXU-matmul variant of crop_body_rois (same part-major stacking).

    Avoids tiling the feature map P times: the row contraction batches
    over B with all P interpolation matrices stacked per sample.
    """
    b, h, w, c = feat.shape
    p = part_bbox.shape[1]
    norm = jnp.array([h, w, h, w], dtype=jnp.float32)
    boxes = part_bbox.astype(jnp.float32) / norm              # [B,P,4]
    my = _interp_matrix(boxes[..., 0].reshape(-1), boxes[..., 2].reshape(-1),
                        h, roi_size).reshape(b, p, roi_size, h)
    mx = _interp_matrix(boxes[..., 1].reshape(-1), boxes[..., 3].reshape(-1),
                        w, roi_size).reshape(b, p, roi_size, w)
    f32 = feat.astype(jnp.float32)
    # rows[b,p,y,w,c] = sum_h my[b,p,y,h] * feat[b,h,w,c]
    rows = jax.lax.dot_general(
        my.reshape(b, p * roi_size, h), f32.reshape(b, h, w * c),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    rows = rows.reshape(b, p, roi_size, w, c)
    # out[b,p,j,y,c] = sum_w mx[b,p,j,w] * rows[b,p,y,w,c]
    out = jax.lax.dot_general(
        mx, rows,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)                   # [B,P,j,y,C]
    out = jnp.transpose(out, (1, 0, 3, 2, 4))                 # [P,B,y,j,C]
    return out.reshape(p * b, roi_size, roi_size, c).astype(feat.dtype)
