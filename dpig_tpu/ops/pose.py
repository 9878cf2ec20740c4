"""Pose-keypoint rendering ops — the hot preprocessing path.

The reference renders an 18-channel pose map in two graph ops: a one-pixel
scatter (utils.py:237-287 `coord2channel_simple_rcv`) followed by a 29-term
shifted pad/crop sum (utils.py:289-318 `tf_poseInflate`) or a numpy fallback
(utils.py:320-346 `py_poseInflate`).  The composition is mathematically a
*dense Euclidean-disc rasterization*: channel k is +1 inside a radius-r disc
around keypoint k (if visible, in-bounds) and -1 elsewhere.

On TPU we compute that closed form directly as one fused elementwise pass —
no scatter, no 29 intermediate HxW tensors, no host round-trip.  XLA fuses
the broadcasts/compares into a single VPU kernel writing B*H*W*K elements.

All functions are shape-static and jit/vmap/shard-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pose_rcv_denormalize(rcv: jax.Array, img_h: int, img_w: int) -> jax.Array:
    """[-1,1]-normalized (row,col) -> clipped pixel coords.

    Matches reference utils.py:249-254: r=(r+1)/2*H clipped to [0, H-1].
    rcv: [..., K, 3] (row, col, visibility). Returns same shape.
    """
    r = (rcv[..., 0] + 1.0) / 2.0 * img_h
    c = (rcv[..., 1] + 1.0) / 2.0 * img_w
    r = jnp.clip(r, 0.0, img_h - 1.0)
    c = jnp.clip(c, 0.0, img_w - 1.0)
    return jnp.stack([r, c, rcv[..., 2]], axis=-1)


def pose_rcv_normalize(rcv: jax.Array, img_h: int, img_w: int) -> jax.Array:
    """Pixel (row,col,vis) -> ([-1,1] row, [-1,1] col, vis).

    Matches reference trainer.py:642-646 (PoseAE input normalization):
    r/H*2-1, c/W*2-1, v unchanged.
    """
    r = rcv[..., 0].astype(jnp.float32) / float(img_h) * 2.0 - 1.0
    c = rcv[..., 1].astype(jnp.float32) / float(img_w) * 2.0 - 1.0
    v = rcv[..., 2].astype(jnp.float32)
    return jnp.stack([r, c, v], axis=-1)


def render_pose_maps(
    rcv: jax.Array,
    img_h: int,
    img_w: int,
    keypoint_num: int = 18,
    radius: int = 4,
    normalized: bool = False,
) -> jax.Array:
    """Fused keypoint -> inflated disc channel maps, in [-1, 1].

    Equivalent to reference `coord2channel_simple_rcv` + `tf_poseInflate`
    (radius>0) or `coord2channel_simple_rcv` alone (radius=0), and to
    `py_poseInflate` when `normalized=True`.

    Args:
      rcv: [B, K*3] or [B, K, 3] float (row, col, visibility).
      normalized: coords are in [-1,1] (decoded poses) vs raw pixels (data).

    Returns:
      [B, img_h, img_w, K] float32 in {-1, +1}: +1 on the radius-`radius`
      Euclidean disc around each visible, in-bounds keypoint.
    """
    b = rcv.shape[0]
    rcv = rcv.reshape(b, keypoint_num, 3).astype(jnp.float32)
    if normalized:
        rcv = pose_rcv_denormalize(rcv, img_h, img_w)
        # In-bounds by construction after clipping.
        in_bounds = jnp.ones((b, keypoint_num), dtype=bool)
        r = jnp.floor(rcv[..., 0]).astype(jnp.int32)
        c = jnp.floor(rcv[..., 1]).astype(jnp.int32)
    else:
        # Raw pixel coords: the reference scatter drops out-of-range indices
        # (tf.scatter_nd GPU semantics); emulate by masking. tf.to_int32
        # truncates toward zero, so r in (-1, 0) lands on row 0.
        r = jnp.trunc(rcv[..., 0]).astype(jnp.int32)
        c = jnp.trunc(rcv[..., 1]).astype(jnp.int32)
        in_bounds = (r >= 0) & (r < img_h) & (c >= 0) & (c < img_w)
    vis = (rcv[..., 2] > 0.0) & in_bounds  # [B, K]

    rows = jax.lax.broadcasted_iota(jnp.int32, (img_h, 1), 0)  # [H,1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, img_w), 1)  # [1,W]
    # [B,1,1,K] vs [H,1]->[1,H,1,1] broadcast: compute squared distance.
    dr = rows[None, :, :, None] - r[:, None, None, :]          # [B,H,1,K]
    dc = cols[None, :, :, None] - c[:, None, None, :]          # [B,1,W,K]
    dist2 = dr * dr + dc * dc                                   # [B,H,W,K]
    on = (dist2 <= radius * radius) & vis[:, None, None, :]
    return on.astype(jnp.float32) * 2.0 - 1.0


def render_pose_points(
    rcv: jax.Array,
    img_h: int,
    img_w: int,
    keypoint_num: int = 18,
    normalized: bool = True,
) -> jax.Array:
    """Single-pixel channel maps (reference coord2channel_simple_rcv only).

    Used where the reference feeds un-inflated maps (e.g. sampled-pose
    previews before inflation). radius=0 disc == exact pixel.
    """
    return render_pose_maps(
        rcv, img_h, img_w, keypoint_num, radius=0, normalized=normalized
    )


def pose_maps_to_image(pose_maps: jax.Array) -> jax.Array:
    """Collapse K channels to a displayable 3-channel [0,255] image.

    Matches reference preview rendering (trainer.py:659):
    denorm(tile(max_k(pose), 3)).
    """
    m = jnp.max(pose_maps, axis=-1, keepdims=True)
    m = jnp.tile(m, (1, 1, 1, 3))
    return jnp.clip((m + 1.0) * 127.5, 0.0, 255.0)
