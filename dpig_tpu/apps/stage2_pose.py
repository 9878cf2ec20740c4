"""Stage-II pose sampler (reference model 4 / 104,
trainer.py:870-1033 DPIG_subnetSamplePoseRCV_GAN_BodyROI).

Gaussian->pose-embedding mapper ("PoseGaussian") trained adversarially
(WGAN, 5 critic iters + clip) against the frozen PoseAE encoder's
embeddings; the frozen PoseAE decoder turns sampled embeddings into
(r,c,v) poses for preview generation through the frozen Stage-I nets.

TPU note: the reference detours through numpy for disc inflation
(py_poseInflate via a feed_dict placeholder, trainer.py:940-941,1011-1014)
because the TF scatter graph couldn't express it; here the fused
`render_pose_maps(..., normalized=True)` keeps the whole preview on-device.
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
from ..ops.pose import pose_rcv_normalize, render_pose_maps
from ..train.state import GanState, make_optimizer
from .common import critic_batches_per_step, select_parts
from .stage1_app import Stage1App
from .stage1_pose import Stage1PoseApp

GAN_MODE = "wgan"  # trainer.py:875
POSE_Z = 32


class Stage2PoseApp:
    """Trainer bundle for the pose sampler."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.pose_ae = Stage1PoseApp(cfg)
        self.stage1 = Stage1App(cfg, fg_bg=cfg.img_H < 256)
        self.mapper = GaussianMapper(out_dim=POSE_Z, hidden_num=512)
        self.disc = FCDiscriminator(fc_dim=512, n_layers=3)
        # Batches the harness feeds per step: 1+CRITIC_ITERS under the
        # reference's fresh-batch critic semantics (default), else 1.
        self.batches_per_step = critic_batches_per_step(cfg)

    def init_state(self, rng: jax.Array, frozen_params=None) -> GanState:
        """frozen_params: {'PoseAE': ..., 'Encoder': ..., 'ID_AE': ...}."""
        cfg = self.cfg
        if frozen_params is None:
            frozen_params = dict(self.pose_ae.init_state(rng).g_params)
            frozen_params.update(self.stage1.init_state(rng).g_params)
        r1, r2, rn = jax.random.split(rng, 3)

        def _init(r1, r2, rn):
            z = sample_mapper_noise(rn, 2, POSE_Z)
            m = self.mapper.init(r1, z)
            d = self.disc.init(r2, jnp.zeros((2, POSE_Z)))
            return m, d

        m, d = jax.jit(_init)(r1, r2, rn)
        g_tx = make_optimizer(GAN_MODE, cfg.g_lr, cfg.lr_update_step)
        d_tx = make_optimizer(GAN_MODE, cfg.d_lr, cfg.lr_update_step)
        return GanState.create(
            g_params={"PoseGaussian": m["params"]},
            d_params={"Pose_emb_FCDis": d["params"]},
            g_tx=g_tx, d_tx=d_tx, frozen_params=frozen_params,
            step=cfg.start_step)

    # ------------------------------------------------------------ helpers
    def real_pose_embs(self, frozen_params, batch):
        cfg = self.cfg
        rcv_norm = pose_rcv_normalize(batch["pose_rcv"], cfg.img_H, cfg.img_W)
        flat = rcv_norm.reshape(rcv_norm.shape[0], -1)
        embs = self.pose_ae.encoder.apply(
            {"params": frozen_params["PoseAE"]["G_Pose_Encoder"]}, flat)
        return jax.lax.stop_gradient(embs)

    def sample_pose_embs(self, g_params, rng, batch_size):
        z = sample_mapper_noise(rng, batch_size, POSE_Z)
        return self.mapper.apply({"params": g_params["PoseGaussian"]}, z)

    # --------------------------------------------------------------- step
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
        """Reference queue semantics (trainer.py:975-989): every critic
        sess.run pulls its own batch; batches[0] feeds the G update."""
        critic_reals = [self.real_pose_embs(state.frozen_params, b)
                        for b in batches[1:]]
        return self._step_impl(state, batches[0], rng, critic_reals)

    def _step_impl(self, state: GanState, batch: Dict[str, jax.Array],
                   rng: jax.Array, critic_reals
                   ) -> Tuple[GanState, Dict[str, jax.Array]]:
        b = batch["pose_rcv"].shape[0]
        real = self.real_pose_embs(state.frozen_params, batch)
        rngs = jax.random.split(rng, 1 + gan.CRITIC_ITERS)

        def g_loss_fn(g_params, r):
            fake = self.sample_pose_embs(g_params, r, b)
            d_fake = self.disc.apply(
                {"params": state.d_params["Pose_emb_FCDis"]}, fake)
            return gan.g_loss(GAN_MODE, d_fake)

        g_l, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params, rngs[0])
        state = state.apply_g(g_grads)

        d_l = jnp.float32(0)
        for i in range(gan.CRITIC_ITERS):
            fake = jax.lax.stop_gradient(
                self.sample_pose_embs(state.g_params, rngs[1 + i], b))
            it_real = critic_reals[i] if critic_reals else real

            def d_loss_fn(d_params):
                d_real = self.disc.apply(
                    {"params": d_params["Pose_emb_FCDis"]}, it_real)
                d_fake = self.disc.apply(
                    {"params": d_params["Pose_emb_FCDis"]}, fake)
                return gan.d_loss(GAN_MODE, d_real, d_fake)

            d_l, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            state = state.apply_d(d_grads)
            state = state.replace(d_params=gan.clip_params(state.d_params))

        state = state.replace(step=state.step + 1)
        # hist/: embedding-distribution observability (reference
        # trainer.py:956-958 tf.summary.histogram on real/fake embeddings).
        fake_last = jax.lax.stop_gradient(
            self.sample_pose_embs(state.g_params, rngs[-1], b))
        return state, {"g_loss_embs": g_l, "d_loss_embs": d_l,
                       "hist/embs_real": real, "hist/embs_fake": fake_last}

    # ----------------------------------------------------------- sampling
    @functools.partial(jax.jit, static_argnums=(0, 3))
    def sample_poses(self, state: GanState, rng: jax.Array, batch_size: int):
        """Sampled pose rcv + inflated maps, fully on-device."""
        cfg = self.cfg
        embs = self.sample_pose_embs(state.g_params, rng, batch_size)
        rcv, _ = self.pose_ae.decode_pose(state.frozen_params, embs)
        maps = render_pose_maps(rcv, cfg.img_H, cfg.img_W, cfg.keypoint_num,
                                radius=4, normalized=True)
        return rcv, maps

    @functools.partial(jax.jit, static_argnums=0)
    def preview_step(self, state: GanState, batch: Dict[str, jax.Array],
                     rng: jax.Array):
        """Generate people under sampled poses with the frozen Stage-I nets
        (trainer.py:917-946, minus the host detour)."""
        cfg = self.cfg
        b = batch["x"].shape[0]
        _, pose_maps = self.sample_poses(state, rng, b)
        bbox, vis = select_parts(batch["part_bbox"], batch["part_vis"],
                                 cfg.roi_part_num)
        embs = self.stage1._encode(state.frozen_params["Encoder"], batch["x"],
                                   batch["mask_r6"], bbox, vis)
        g_raw, _ = self.stage1.generator.apply(
            {"params": state.frozen_params["ID_AE"]}, None, pose_maps,
            embs_const=embs)
        return jnp.clip((g_raw.astype(jnp.float32) + 1.0) * 127.5, 0.0, 255.0)
