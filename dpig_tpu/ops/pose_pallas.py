"""Pallas TPU kernel for the fused pose-disc rasterizer.

Computes the same closed form as ops/pose.py:render_pose_maps — channel k
is +1 on the radius-r Euclidean disc around visible keypoint k, else -1 —
as ONE VPU pass per batch element over an (H, W*K) tile, with no
intermediate [B,H,1,K]/[B,1,W,K] broadcast materialization.

Layout: the output [B, H, W, K] is viewed as [B, H, W*K]; W*K for the
Market config is 64*18 = 1152 = 9 lanes of 128, H = 128 sublanes — a
perfectly tiled VMEM block. Per-lane keypoint data (r, c, vis broadcast
over W) is precomputed host-side as three tiny [B, W*K] arrays so the
kernel body is pure elementwise compare/select.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pose import pose_rcv_denormalize


def _kernel(rk_ref, ck_ref, vk_ref, out_ref, *, radius: int):
    h = out_ref.shape[1]
    wk = out_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (h, wk), 0).astype(jnp.float32)
    dr = row - rk_ref[0, 0, :]    # [H, W*K] - [W*K] broadcast
    dc = ck_ref[0, 0, :]          # holds (col - c_k) precomputed per lane
    dist2 = dr * dr + dc * dc
    on = (dist2 <= float(radius * radius)) & (vk_ref[0, 0, :] > 0.0)
    out_ref[0] = jnp.where(on, 1.0, -1.0)


def render_pose_maps_pallas(
    rcv: jax.Array,
    img_h: int,
    img_w: int,
    keypoint_num: int = 18,
    radius: int = 4,
    normalized: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.pose.render_pose_maps on TPU.

    interpret=True runs the Pallas interpreter (CPU tests).
    """
    b = rcv.shape[0]
    k = keypoint_num
    rcv = rcv.reshape(b, k, 3).astype(jnp.float32)
    if normalized:
        rcv = pose_rcv_denormalize(rcv, img_h, img_w)
        r = jnp.floor(rcv[..., 0])
        c = jnp.floor(rcv[..., 1])
        in_bounds = jnp.ones((b, k), bool)
    else:
        r = jnp.trunc(rcv[..., 0])
        c = jnp.trunc(rcv[..., 1])
        in_bounds = ((r >= 0) & (r < img_h) & (c >= 0) & (c < img_w))
    vis = ((rcv[..., 2] > 0.0) & in_bounds).astype(jnp.float32)

    # Per-lane tables [B, W*K]: lane j*K+k -> r_k, (j - c_k), vis_k.
    cols = jnp.arange(img_w, dtype=jnp.float32)
    rk = jnp.tile(r[:, None, :], (1, img_w, 1)).reshape(b, 1, img_w * k)
    ck = (cols[None, :, None] - c[:, None, :]).reshape(b, 1, img_w * k)
    vk = jnp.tile(vis[:, None, :], (1, img_w, 1)).reshape(b, 1, img_w * k)

    table_spec = pl.BlockSpec((1, 1, img_w * k), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, radius=radius),
        grid=(b,),
        in_specs=[table_spec, table_spec, table_spec],
        out_specs=pl.BlockSpec((1, img_h, img_w * k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, img_h, img_w * k), jnp.float32),
        interpret=interpret,
    )(rk, ck, vk)
    return out.reshape(b, img_h, img_w, k)
