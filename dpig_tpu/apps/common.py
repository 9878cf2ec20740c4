"""Shared glue for the model apps (trainer-class equivalents)."""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.pose import render_pose_maps


def critic_batches_per_step(cfg: Config) -> int:
    """Loader batches a stage-2 WGAN step consumes: 1+CRITIC_ITERS under
    the reference's fresh-batch-per-critic-iteration queue semantics
    (--critic_batch_mode=fresh, the measured default — docs/
    critic_ab_r5.json), 1 for the fused reused-batch step."""
    from ..losses import gan
    if cfg.critic_batch_mode not in ("fresh", "reused"):
        raise ValueError(
            f"--critic_batch_mode must be 'fresh' or 'reused', "
            f"got {cfg.critic_batch_mode!r}")
    return 1 + gan.CRITIC_ITERS if cfg.critic_batch_mode == "fresh" else 1


def select_parts(batch_bbox: jax.Array, batch_vis: jax.Array, n: int = 7):
    """Take the first n of the 37 stored part bboxes (trainer.py:576-578)."""
    return batch_bbox[:, :n, :], batch_vis[:, :n].astype(jnp.float32)


def pose_maps_from_batch(batch: Dict[str, jax.Array], cfg: Config,
                         key: str = "pose_rcv") -> jax.Array:
    """Render the 18-ch inflated pose map on-device from raw rcv coords.

    TPU-first replacement for the reference's input-graph scatter+inflate
    (trainer.py:559-562): ship 54 floats per sample to the device and
    rasterize there, fused into the step. --pose_raster=pallas selects the
    hand-written VPU kernel (ops/pose_pallas.py); 'xla' the jnp closed
    form. Measured at bs256 on the v5e both are sub-ms and the surrounding
    XLA fusion makes the closed form the safer default.
    """
    if getattr(cfg, "pose_raster", "xla") == "pallas":
        from ..ops.pose_pallas import render_pose_maps_pallas
        return render_pose_maps_pallas(batch[key], cfg.img_H, cfg.img_W,
                                       cfg.keypoint_num, radius=4,
                                       normalized=False)
    return render_pose_maps(batch[key], cfg.img_H, cfg.img_W,
                            cfg.keypoint_num, radius=4, normalized=False)


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def masked_l1_loss(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """PoseMaskLoss (trainer.py:606): mean(|a-b| * mask)."""
    return jnp.mean(jnp.abs(a - b) * mask)
