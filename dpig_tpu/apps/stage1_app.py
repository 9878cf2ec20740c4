"""Stage-I appearance reconstruction (reference models 1 & 101).

Market (model 1, trainer.py:567-625): FG/BG two-branch ROI encoder ->
tiled 352-d embedding + 18-ch pose map -> U-net generator; DCGAN image
discriminator; G loss = adv + 20*L1; 1 critic iter per G iter.

DeepFashion (model 101, trainer_256.py:10-265): single-branch ROI-vis
encoder with roi_size=64 and repeat_num+1 stages; generator at
repeat_num-1; same loss recipe.

The whole G-step + D-step pair runs inside ONE jitted function; pose maps
are rasterized on-device from the 54-float rcv coords.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..losses import gan
from ..models.discriminators import get_discriminator
from ..models.encoders import RoiEncoder, RoiEncoderFgBg
from ..models.generator import UAEGenerator
from ..train.state import GanState, make_optimizer
from .common import l1_loss, masked_l1_loss, pose_maps_from_batch, select_parts

GAN_MODE = "dcgan"  # trainer.py:257


class Stage1App:
    """Trainer/tester bundle for Stage-I appearance reconstruction."""

    def __init__(self, cfg: Config, fg_bg: bool = True):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        is_256 = cfg.img_H >= 256
        # The FgBg two-branch encoder exists only for the 128x64 Market
        # family (trainer.py:573 vs trainer_256.py:118); normalize here so
        # fg_bg=True at 256 can't select the wrong _encode signature.
        fg_bg = fg_bg and not is_256
        self.fg_bg = fg_bg
        enc_repeat = cfg.repeat_num + 1 if is_256 else cfg.repeat_num
        gen_repeat = cfg.repeat_num - 1 if is_256 else cfg.repeat_num
        roi_size = 64 if is_256 else 48
        act = nn.relu
        enc_cls = RoiEncoderFgBg if fg_bg else RoiEncoder
        if cfg.remat:  # --remat covers the encoder too (bs256 training
            enc_cls = nn.remat(enc_cls)  # OOMs by ~58M with gen-only remat)
        self.encoder = enc_cls(
            part_num=cfg.roi_part_num, z_num=cfg.roi_z_num,
            repeat_num=enc_repeat, hidden_num=cfg.conv_hidden_num,
            roi_size=roi_size, activation=act, dtype=dtype)
        gen_cls = nn.remat(UAEGenerator) if cfg.remat else UAEGenerator
        self.generator = gen_cls(
            out_channels=3, z_num=cfg.z_num, repeat_num=gen_repeat,
            hidden_num=cfg.conv_hidden_num, activation=act, dtype=dtype)
        self.disc = get_discriminator(cfg.D_arch, n_stages=5 if is_256 else 4,
                                      mode=GAN_MODE, dtype=dtype)

    # ---------------------------------------------------------------- init
    def init_state(self, rng: jax.Array) -> GanState:
        cfg = self.cfg
        r_enc, r_gen, r_disc = jax.random.split(rng, 3)
        x = jnp.zeros((2, cfg.img_H, cfg.img_W, 3), jnp.float32)
        mask = jnp.zeros((2, cfg.img_H, cfg.img_W, 1), jnp.float32)
        bbox = jnp.zeros((2, cfg.roi_part_num, 4), jnp.int32)
        vis = jnp.ones((2, cfg.roi_part_num), jnp.float32)
        pose = jnp.zeros((2, cfg.img_H, cfg.img_W, cfg.keypoint_num), jnp.float32)

        # One jitted init: eager per-op dispatch is pathological on remote-
        # compile backends, and jit also gets free CSE/fusion for the probes.
        def _init(r_enc, r_gen, r_disc):
            enc_vars = (self.encoder.init(r_enc, x, mask, bbox, vis)
                        if self.fg_bg else self.encoder.init(r_enc, x, bbox, vis))
            embs = self._encode(enc_vars["params"], x, mask, bbox, vis)
            gen_vars = self.generator.init(r_gen, None, pose, embs_const=embs)
            disc_vars = self.disc.init(r_disc, x, train=True)
            return enc_vars, gen_vars, disc_vars

        enc_vars, gen_vars, disc_vars = jax.jit(_init)(r_enc, r_gen, r_disc)

        g_tx = make_optimizer(GAN_MODE, cfg.g_lr, cfg.lr_update_step)
        d_tx = make_optimizer(GAN_MODE, cfg.d_lr, cfg.lr_update_step)
        return GanState.create(
            g_params={"Encoder": enc_vars["params"], "ID_AE": gen_vars["params"]},
            d_params={"Discriminator": disc_vars["params"]},
            d_stats=disc_vars.get("batch_stats", {}),
            g_tx=g_tx, d_tx=d_tx, step=cfg.start_step)

    # ------------------------------------------------------------ forward
    def _encode(self, enc_params, x, mask, bbox, vis):
        if self.fg_bg:
            return self.encoder.apply({"params": enc_params}, x, mask, bbox, vis)
        return self.encoder.apply({"params": enc_params}, x, bbox, vis)

    def g_forward(self, g_params, x, pose, mask, bbox, vis):
        embs = self._encode(g_params["Encoder"], x, mask, bbox, vis)
        # embs_const: exact stem decomposition, no tiled-map materialization
        g_raw, z = self.generator.apply({"params": g_params["ID_AE"]},
                                        None, pose, embs_const=embs)
        return g_raw.astype(jnp.float32), embs

    def _disc_apply(self, d_params, d_stats, img, train=True):
        out, new_vars = self.disc.apply(
            {"params": d_params["Discriminator"], "batch_stats": d_stats},
            img, train=train, mutable=["batch_stats"])
        return out.astype(jnp.float32), new_vars["batch_stats"]

    # --------------------------------------------------------------- step
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GanState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[GanState, Dict[str, jax.Array]]:
        cfg = self.cfg
        x = batch["x"]
        mask = batch["mask_r6"]
        pose = pose_maps_from_batch(batch, cfg)
        bbox, vis = select_parts(batch["part_bbox"], batch["part_vis"],
                                 cfg.roi_part_num)

        # ---- G update (adv + 20*L1, trainer.py:605-623)
        def g_loss_fn(g_params):
            g_raw, _ = self.g_forward(g_params, x, pose, mask, bbox, vis)
            d_fake, _ = self._disc_apply(state.d_params, state.d_stats, g_raw)
            l1 = l1_loss(g_raw, x)
            adv = gan.g_loss(GAN_MODE, d_fake)
            loss = adv + cfg.L1Loss_weight * l1
            pm = masked_l1_loss(g_raw, x, mask)
            return loss, (g_raw, l1, adv, pm)

        (g_total, (g_raw, l1, g_adv, pose_mask_loss)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params))
        state = state.apply_g(g_grads)

        # ---- D update (1 iter for dcgan, trainer.py:340-344).
        # Reference-faithful: the d_optim sess.run re-executes the graph
        # with the post-G-update params, so D scores fresh fakes
        # (trainer.py:337-345). --fast_gan_step reuses the G-step's output
        # (pre-update params) and saves a full generator+encoder forward.
        if cfg.fast_gan_step:
            g_raw_new = jax.lax.stop_gradient(g_raw)
        else:
            g_raw_new, _ = self.g_forward(state.g_params, x, pose, mask,
                                          bbox, vis)
            g_raw_new = jax.lax.stop_gradient(g_raw_new)

        def d_loss_fn(d_params):
            d_real, stats1 = self._disc_apply(d_params, state.d_stats, x)
            d_fake, stats2 = self._disc_apply(d_params, stats1, g_raw_new)
            return gan.d_loss(GAN_MODE, d_real, d_fake), stats2

        (d_total, new_stats), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params))
        state = state.apply_d(d_grads).replace(
            d_stats=new_stats, step=state.step + 1)

        metrics = {"g_loss": g_total, "g_loss_only": g_adv, "d_loss": d_total,
                   "L1Loss": l1, "PoseMaskLoss": pose_mask_loss}
        return state, metrics

    # ----------------------------------------------------------- generate
    @functools.partial(jax.jit, static_argnums=0)
    def generate_step(self, g_params, x, pose, mask, bbox, vis):
        """Reconstruction preview -> [0,255] images (trainer.py:514-526)."""
        g_raw, _ = self.g_forward(g_params, x, pose, mask, bbox, vis)
        return jnp.clip((g_raw + 1.0) * 127.5, 0.0, 255.0)

    @functools.partial(jax.jit, static_argnums=0)
    def transfer_step(self, g_params, x, pose_target, mask, bbox, vis):
        """PG2-style conditional transfer (tester.py:677-681): encode the
        source appearance, decode under the *target* pose."""
        return self.generate_step(g_params, x, pose_target, mask, bbox, vis)
