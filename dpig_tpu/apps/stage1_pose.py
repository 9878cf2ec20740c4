"""Stage-I pose autoencoder (reference model 2 / 102,
trainer.py:629-711 DPIG_PoseRCV_AE_BodyROI).

18x(row,col,vis) normalized to [-1,1] -> FC-res AE; loss = 20 * MSE;
Adam(b1=0.5); visibility decoded through the straight-through binary round.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.pose_ae import PoseDecoderFC, PoseEncoderFC, assemble_pose_rcv
from ..ops.pose import pose_rcv_normalize, render_pose_maps
from ..train.state import GanState, make_optimizer


class Stage1PoseApp:
    """Trainer bundle for the pose AE."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.encoder = PoseEncoderFC(z_num=32, repeat_num=4, hidden_num=512)
        self.decoder = PoseDecoderFC(keypoint_num=cfg.keypoint_num,
                                     repeat_num=4, hidden_num=512)

    def init_state(self, rng: jax.Array) -> GanState:
        cfg = self.cfg
        r_enc, r_dec = jax.random.split(rng)
        flat = jnp.zeros((2, cfg.keypoint_num * 3), jnp.float32)

        def _init(r_enc, r_dec):
            enc_vars = self.encoder.init(r_enc, flat)
            z = self.encoder.apply(enc_vars, flat)
            dec_vars = self.decoder.init(r_dec, z)
            return enc_vars, dec_vars

        enc_vars, dec_vars = jax.jit(_init)(r_enc, r_dec)
        g_tx = make_optimizer("ae", cfg.g_lr, cfg.lr_update_step)
        return GanState.create(
            g_params={"PoseAE": {"G_Pose_Encoder": enc_vars["params"],
                                 "G_Pose_Decoder": dec_vars["params"]}},
            d_params=None, g_tx=g_tx, d_tx=None, step=cfg.start_step)

    # ------------------------------------------------------------ forward
    def autoencode(self, params, pose_rcv_norm_flat):
        z = self.encoder.apply(
            {"params": params["PoseAE"]["G_Pose_Encoder"]}, pose_rcv_norm_flat)
        coords, vis = self.decoder.apply(
            {"params": params["PoseAE"]["G_Pose_Decoder"]}, z)
        return assemble_pose_rcv(coords, vis, self.cfg.keypoint_num), z

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GanState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[GanState, Dict[str, jax.Array]]:
        cfg = self.cfg
        rcv_norm = pose_rcv_normalize(batch["pose_rcv"], cfg.img_H, cfg.img_W)
        flat = rcv_norm.reshape(rcv_norm.shape[0], -1)

        def loss_fn(params):
            recon, _ = self.autoencode(params, flat)
            mse = jnp.mean((rcv_norm - recon) ** 2)
            return mse * 20.0, mse  # trainer.py:670 (loss*20)

        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params)
        state = state.apply_g(grads).replace(step=state.step + 1)
        return state, {"reconstruct_loss": mse, "loss": loss}

    @functools.partial(jax.jit, static_argnums=0)
    def decode_pose(self, params, z):
        """z -> rcv (normalized coords) + rendered point map preview."""
        coords, vis = self.decoder.apply(
            {"params": params["PoseAE"]["G_Pose_Decoder"]}, z)
        rcv = assemble_pose_rcv(coords, vis, self.cfg.keypoint_num)
        maps = render_pose_maps(rcv, self.cfg.img_H, self.cfg.img_W,
                                self.cfg.keypoint_num, radius=0,
                                normalized=True)
        return rcv, maps
