"""Embedding inversion (the capability behind the reference's
inverse_fg/bg/pose flags, config.py:74-77 — captured at trainer.py:101-103
but never wired; implemented here as noise-space optimization).

Given a real image, find the Gaussian-mapper inputs z such that
mapper(z) ~= encoder(image) for the toggled factors — i.e. project a real
person into the sampler's latent space (useful for editing: invert, then
interpolate/resample factors). Adam on ||mapper(z) - emb||^2, fully jitted
with a lax.fori_loop.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.mappers import GaussianMapper
from .testers import _TesterBase


class InversionTool(_TesterBase):
    REQUIRED = {"Encoder", "ID_AE", "Gaussian_FC_Fg", "Gaussian_FC_Bg"}

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.fg_dim = cfg.roi_part_num * cfg.roi_z_num
        self.bg_dim = cfg.roi_z_num * 4
        self.mapper_fg = GaussianMapper(out_dim=self.fg_dim, hidden_num=512)
        self.mapper_bg = GaussianMapper(out_dim=self.bg_dim, hidden_num=256)

    def invert(self, batch: Dict[str, jax.Array], rng: jax.Array,
               lr: float = 0.05, steps: int = 300, invert_bg: bool = True
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (z_fg, z_bg, final_loss)."""
        # NOTE: params are a traced jit ARGUMENT — embedding the full tree
        # (incl. the Stage-I Encoder used by _encode_app) as closure
        # constants blows the remote-compile payload limit (commit 616da35).
        return self._invert(self.params, batch, rng, lr, steps, invert_bg)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
    def _invert(self, params, batch: Dict[str, jax.Array], rng: jax.Array,
                lr: float, steps: int, invert_bg: bool
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        embs = self._encode_app(params, batch)
        target_fg = embs[:, :self.fg_dim]
        target_bg = embs[:, self.fg_dim:]
        b = embs.shape[0]
        r1, r2 = jax.random.split(rng)
        z0 = {"fg": jax.random.normal(r1, (b, self.fg_dim)) * 0.2,
              "bg": jax.random.normal(r2, (b, self.bg_dim)) * 0.2}
        tx = optax.adam(lr)

        def loss_fn(z):
            out_fg = self.mapper_fg.apply(
                {"params": params["Gaussian_FC_Fg"]}, z["fg"])
            loss = jnp.mean((out_fg - target_fg) ** 2)
            if invert_bg:
                out_bg = self.mapper_bg.apply(
                    {"params": params["Gaussian_FC_Bg"]}, z["bg"])
                loss = loss + jnp.mean((out_bg - target_bg) ** 2)
            return loss

        def body(_, carry):
            z, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(z)
            updates, opt_state = tx.update(grads, opt_state, z)
            return optax.apply_updates(z, updates), opt_state

        z, _ = jax.lax.fori_loop(0, steps, body, (z0, tx.init(z0)))
        return z["fg"], z["bg"], loss_fn(z)
