"""DF Stage-II appearance sampler — single mapper variant (reference
model 103, trainer_256.py:266-403 DPIG_Encoder_subSampleAppNet_GAN_BodyROI_256).

One Gaussian->embedding mapper over the full 7*32-d appearance embedding
(G_OUTPUT_DIM = 7*32, trainer.py:1336), scope 'Gaussian_FC'; one FC critic;
WGAN with 5 critic iters + weight clipping, mirroring the Market twin.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..losses import gan
from ..models.discriminators import FCDiscriminator
from ..models.mappers import GaussianMapper, sample_mapper_noise
from ..train.state import GanState, make_optimizer
from .common import critic_batches_per_step, pose_maps_from_batch, select_parts
from .stage1_app import Stage1App

GAN_MODE = "wgan"


class Stage2AppSingleApp:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.stage1 = Stage1App(cfg, fg_bg=False)
        self.app_dim = cfg.roi_part_num * cfg.roi_z_num  # 224
        self.mapper = GaussianMapper(out_dim=self.app_dim, hidden_num=512)
        self.disc = FCDiscriminator(fc_dim=512, n_layers=3)
        # Batches the harness feeds per step: 1+CRITIC_ITERS under the
        # reference's fresh-batch critic semantics (default), else 1.
        self.batches_per_step = critic_batches_per_step(cfg)

    def init_state(self, rng: jax.Array, frozen_params=None) -> GanState:
        cfg = self.cfg
        if frozen_params is None:
            frozen_params = self.stage1.init_state(rng).g_params
        r1, r2, rn = jax.random.split(rng, 3)

        def _init(r1, r2, rn):
            z = sample_mapper_noise(rn, 2, self.app_dim)
            m = self.mapper.init(r1, z)
            d = self.disc.init(r2, jnp.zeros((2, self.app_dim)))
            return m, d

        m, d = jax.jit(_init)(r1, r2, rn)
        g_tx = make_optimizer(GAN_MODE, cfg.g_lr, cfg.lr_update_step)
        d_tx = make_optimizer(GAN_MODE, cfg.d_lr, cfg.lr_update_step)
        return GanState.create(
            g_params={"Gaussian_FC": m["params"]},
            d_params={"FCDis": d["params"]},
            g_tx=g_tx, d_tx=d_tx, frozen_params=frozen_params,
            step=cfg.start_step)

    def real_embs(self, frozen_params, batch):
        cfg = self.cfg
        bbox, vis = select_parts(batch["part_bbox"], batch["part_vis"],
                                 cfg.roi_part_num)
        embs = self.stage1._encode(frozen_params["Encoder"], batch["x"],
                                   batch["mask_r6"], bbox, vis)
        return jax.lax.stop_gradient(embs)

    def sample_embs(self, g_params, rng, batch_size):
        z = sample_mapper_noise(rng, batch_size, self.app_dim)
        return self.mapper.apply({"params": g_params["Gaussian_FC"]}, z)

    def train_step(self, state: GanState, batch,
                   rng: jax.Array) -> Tuple[GanState, Dict[str, jax.Array]]:
        """Sequence of 1+CRITIC_ITERS batch dicts -> reference fresh-batch
        critic semantics (the --critic_batch_mode=fresh default); single
        dict -> fused reused-batch step. See stage2_app.train_step."""
        if isinstance(batch, (list, tuple)):
            return self.train_step_fresh(state, tuple(batch), rng)
        return self._train_step_reused(state, batch, rng)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step_reused(self, state: GanState, batch: Dict[str, jax.Array],
                           rng: jax.Array
                           ) -> Tuple[GanState, Dict[str, jax.Array]]:
        return self._step_impl(state, batch, rng, None)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step_fresh(self, state: GanState, batches,
                         rng: jax.Array
                         ) -> Tuple[GanState, Dict[str, jax.Array]]:
        """Reference queue semantics (trainer_256.py:372-381): every
        critic sess.run pulls its own batch; batches[0] feeds G."""
        critic_reals = [self.real_embs(state.frozen_params, b)
                        for b in batches[1:]]
        return self._step_impl(state, batches[0], rng, critic_reals)

    def _step_impl(self, state: GanState, batch: Dict[str, jax.Array],
                   rng: jax.Array, critic_reals
                   ) -> Tuple[GanState, Dict[str, jax.Array]]:
        b = batch["x"].shape[0]
        real = self.real_embs(state.frozen_params, batch)
        rngs = jax.random.split(rng, 1 + gan.CRITIC_ITERS)

        def g_loss_fn(g_params, r):
            fake = self.sample_embs(g_params, r, b)
            d_fake = self.disc.apply({"params": state.d_params["FCDis"]}, fake)
            return gan.g_loss(GAN_MODE, d_fake)

        g_l, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params, rngs[0])
        state = state.apply_g(g_grads)

        d_l = jnp.float32(0)
        for i in range(gan.CRITIC_ITERS):
            fake = jax.lax.stop_gradient(
                self.sample_embs(state.g_params, rngs[1 + i], b))
            it_real = critic_reals[i] if critic_reals else real

            def d_loss_fn(d_params):
                d_real = self.disc.apply({"params": d_params["FCDis"]}, it_real)
                d_fake = self.disc.apply({"params": d_params["FCDis"]}, fake)
                return gan.d_loss(GAN_MODE, d_real, d_fake)

            d_l, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            state = state.apply_d(d_grads)
            state = state.replace(d_params=gan.clip_params(state.d_params))

        state = state.replace(step=state.step + 1)
        return state, {"g_loss_embs": g_l, "d_loss_embs": d_l}

    @functools.partial(jax.jit, static_argnums=0)
    def preview_step(self, state: GanState, batch: Dict[str, jax.Array],
                     rng: jax.Array):
        cfg = self.cfg
        b = batch["x"].shape[0]
        pose = pose_maps_from_batch(batch, cfg)
        app = self.sample_embs(state.g_params, rng, b)
        g_raw, _ = self.stage1.generator.apply(
            {"params": state.frozen_params["ID_AE"]}, None, pose,
            embs_const=app)
        return jnp.clip((g_raw.astype(jnp.float32) + 1.0) * 127.5, 0.0, 255.0)
