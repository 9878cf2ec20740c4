"""Stage-II appearance samplers (reference model 3 / 103,
trainer.py:715-867 DPIG_Encoder_subSampleAppNetFgBg_GAN_BodyROI).

Two Gaussian->embedding mappers (FG: 7*32-d out, hidden 512; BG: 128-d out,
hidden 256) trained adversarially (WGAN + weight clip, 5 critic iters) in
embedding space against the *frozen* Stage-I encoder's embeddings.

TPU design: the G update and all critic iterations run inside one jitted
step. The reference pulls a fresh input batch per sess.run (queue
semantics, trainer.py:821-845); that is the default here too
(`--critic_batch_mode=fresh`: the harness feeds 1+CRITIC_ITERS batches
per step and each critic iteration sees its own real embeddings). The
fused single-batch variant (`reused`: critic iterations reuse the step's
batch with fresh mapper noise) costs 6x fewer frozen-encoder forwards
but measured worse on the fg sampler's moment match
(scripts/critic_batch_ab.py, docs/critic_ab_r5.json).

For the Market model the FG and BG samplers train side by side
(trainer.py:821-845); the DF model 103 has a single 7*32-d sampler
(trainer.py:1336 G_OUTPUT_DIM=7*32) — select with `split_fg_bg=False`.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..losses import gan
from ..models.discriminators import FCDiscriminator
from ..models.mappers import GaussianMapper, sample_mapper_noise
from ..train.state import GanState, make_optimizer
from .common import critic_batches_per_step, pose_maps_from_batch, select_parts
from .stage1_app import Stage1App

GAN_MODE = "wgan"  # trainer.py:720-725


class Stage2AppApp:
    """Trainer bundle for the appearance (FG/BG) samplers."""

    def __init__(self, cfg: Config, split_fg_bg: bool = True):
        self.cfg = cfg
        self.split_fg_bg = split_fg_bg
        # How many loader batches the harness must feed train_step:
        # 1+CRITIC_ITERS under the reference's fresh-batch-per-critic-
        # iteration semantics (the default), 1 for the fused reused step.
        self.batches_per_step = critic_batches_per_step(cfg)
        self.stage1 = Stage1App(cfg, fg_bg=split_fg_bg and cfg.img_H < 256)
        self.fg_dim = cfg.roi_part_num * cfg.roi_z_num          # 224
        self.bg_dim = cfg.roi_z_num * 4                          # 128
        self.mapper_fg = GaussianMapper(out_dim=self.fg_dim, hidden_num=512)
        self.mapper_bg = GaussianMapper(out_dim=self.bg_dim, hidden_num=256)
        self.disc_fg = FCDiscriminator(fc_dim=512, n_layers=3)
        self.disc_bg = FCDiscriminator(fc_dim=512, n_layers=3)

    # ---------------------------------------------------------------- init
    def init_state(self, rng: jax.Array, frozen_params=None) -> GanState:
        """frozen_params: {'Encoder':..., 'ID_AE':...} from Stage-I.

        If None (tests / cold start), a fresh Stage-I init is used.
        """
        cfg = self.cfg
        if frozen_params is None:
            frozen_params = self.stage1.init_state(rng).g_params
        r1, r2, r3, r4, rn = jax.random.split(rng, 5)

        def _init(r1, r2, r3, r4, rn):
            zf = sample_mapper_noise(rn, 2, self.fg_dim)
            zb = sample_mapper_noise(rn, 2, self.bg_dim)
            mf = self.mapper_fg.init(r1, zf)
            mb = self.mapper_bg.init(r2, zb)
            df = self.disc_fg.init(r3, jnp.zeros((2, self.fg_dim)))
            db = self.disc_bg.init(r4, jnp.zeros((2, self.bg_dim)))
            return mf, mb, df, db

        mf, mb, df, db = jax.jit(_init)(r1, r2, r3, r4, rn)
        g_tx = make_optimizer(GAN_MODE, cfg.g_lr, cfg.lr_update_step)
        d_tx = make_optimizer(GAN_MODE, cfg.d_lr, cfg.lr_update_step)
        return GanState.create(
            g_params={"Gaussian_FC_Fg": mf["params"],
                      "Gaussian_FC_Bg": mb["params"]},
            d_params={"Fg_FCDis": df["params"], "Bg_FCDis": db["params"]},
            g_tx=g_tx, d_tx=d_tx, frozen_params=frozen_params,
            step=cfg.start_step)

    # ------------------------------------------------------------ helpers
    def real_embs(self, frozen_params, batch):
        """Frozen-encoder embeddings, split FG/BG (trainer.py:741-742)."""
        cfg = self.cfg
        bbox, vis = select_parts(batch["part_bbox"], batch["part_vis"],
                                 cfg.roi_part_num)
        embs = self.stage1._encode(frozen_params["Encoder"], batch["x"],
                                   batch["mask_r6"], bbox, vis)
        embs = jax.lax.stop_gradient(embs)
        return embs[:, :self.fg_dim], embs[:, self.fg_dim:]

    def sample_embs(self, g_params, rng, batch_size):
        rf, rb = jax.random.split(rng)
        zf = sample_mapper_noise(rf, batch_size, self.fg_dim)
        zb = sample_mapper_noise(rb, batch_size, self.bg_dim)
        fg = self.mapper_fg.apply({"params": g_params["Gaussian_FC_Fg"]}, zf)
        bg = self.mapper_bg.apply({"params": g_params["Gaussian_FC_Bg"]}, zb)
        return fg, bg

    # --------------------------------------------------------------- step
    def train_step(self, state: GanState, batch,
                   rng: jax.Array) -> Tuple[GanState, Dict[str, jax.Array]]:
        """Dispatch on the batch form: a sequence of 1+CRITIC_ITERS batch
        dicts runs the reference's fresh-batch-per-critic-iteration
        semantics (what the harness feeds under the default
        --critic_batch_mode=fresh); a single batch dict runs the fused
        reused-batch step (critic iterations reuse it with fresh mapper
        noise — measured A/B in docs/critic_ab_r5.json)."""
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
        """Reference queue semantics (trainer.py:821-845): every critic
        sess.run pulls its own input batch. `batches` is a sequence of
        1 + CRITIC_ITERS batch dicts; batches[0] feeds the G update and
        the hist summaries, batches[1:] feed the critic iterations."""
        critic_reals = [self.real_embs(state.frozen_params, b)
                        for b in batches[1:]]
        return self._step_impl(state, batches[0], rng, critic_reals)

    def _step_impl(self, state: GanState, batch: Dict[str, jax.Array],
                   rng: jax.Array, critic_reals
                   ) -> Tuple[GanState, Dict[str, jax.Array]]:
        b = batch["x"].shape[0]
        real_fg, real_bg = self.real_embs(state.frozen_params, batch)
        rngs = jax.random.split(rng, 2 + 2 * gan.CRITIC_ITERS)

        # ---- G updates (both mappers)
        def g_loss_fn(g_params, r):
            fg, bg = self.sample_embs(g_params, r, b)
            d_fg = self.disc_fg.apply({"params": state.d_params["Fg_FCDis"]}, fg)
            d_bg = self.disc_bg.apply({"params": state.d_params["Bg_FCDis"]}, bg)
            gl_fg = gan.g_loss(GAN_MODE, d_fg)
            gl_bg = gan.g_loss(GAN_MODE, d_bg)
            return gl_fg + gl_bg, (gl_fg, gl_bg)

        (_, (gl_fg, gl_bg)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, rngs[0])
        state = state.apply_g(g_grads)

        # ---- critic iterations (5 for wgan) + weight clipping
        dl_fg = dl_bg = jnp.float32(0)
        for i in range(gan.CRITIC_ITERS):
            fg_fake, bg_fake = self.sample_embs(state.g_params, rngs[2 + i], b)
            fg_fake = jax.lax.stop_gradient(fg_fake)
            bg_fake = jax.lax.stop_gradient(bg_fake)
            it_real_fg, it_real_bg = (critic_reals[i] if critic_reals
                                      else (real_fg, real_bg))

            def d_loss_fn(d_params):
                dr_fg = self.disc_fg.apply({"params": d_params["Fg_FCDis"]}, it_real_fg)
                df_fg = self.disc_fg.apply({"params": d_params["Fg_FCDis"]}, fg_fake)
                dr_bg = self.disc_bg.apply({"params": d_params["Bg_FCDis"]}, it_real_bg)
                df_bg = self.disc_bg.apply({"params": d_params["Bg_FCDis"]}, bg_fake)
                l_fg = gan.d_loss(GAN_MODE, dr_fg, df_fg)
                l_bg = gan.d_loss(GAN_MODE, dr_bg, df_bg)
                return l_fg + l_bg, (l_fg, l_bg)

            (_, (dl_fg, dl_bg)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params)
            state = state.apply_d(d_grads)
            state = state.replace(d_params=gan.clip_params(state.d_params))

        state = state.replace(step=state.step + 1)
        # hist/: embedding-distribution observability (reference
        # trainer.py:796-804 histogram summaries for app samplers).
        # Reuses the LAST critic iteration's fake samples — a fresh rng
        # here would pay an extra mapper forward on every step that XLA
        # cannot CSE away (the harness only reads hists at log steps).
        return state, {"g_loss_embs_fg": gl_fg, "g_loss_embs_bg": gl_bg,
                       "d_loss_embs_fg": dl_fg, "d_loss_embs_bg": dl_bg,
                       "hist/embs_real_fg": real_fg,
                       "hist/embs_fake_fg": fg_fake,
                       "hist/embs_real_bg": real_bg,
                       "hist/embs_fake_bg": bg_fake}

    # ----------------------------------------------------------- sampling
    @functools.partial(jax.jit, static_argnums=0)
    def preview_step(self, state: GanState, batch: Dict[str, jax.Array],
                     rng: jax.Array):
        """Fix-FG/vary-BG composed preview (trainer.py:779-793).

        First half of the batch shares one FG code with varying BG; second
        half shares one BG code with varying FG.
        """
        cfg = self.cfg
        b = batch["x"].shape[0]
        pose = pose_maps_from_batch(batch, cfg)
        fg, bg = self.sample_embs(state.g_params, rng, b)
        half = b // 2
        fix_fg = jnp.tile(fg[:1], (half, 1))
        vary_fg = fg[half:]
        fix_bg = jnp.tile(bg[:1], (half, 1))
        vary_bg = bg[half:]
        app = jnp.concatenate([
            jnp.concatenate([fix_fg, vary_fg], axis=0),
            jnp.concatenate([vary_bg, fix_bg], axis=0)], axis=-1)
        g_raw, _ = self.stage1.generator.apply(
            {"params": state.frozen_params["ID_AE"]}, None, pose,
            embs_const=app)
        return jnp.clip((g_raw.astype(jnp.float32) + 1.0) * 127.5, 0.0, 255.0)
