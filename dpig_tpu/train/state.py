"""GAN train state + optimizer factory.

Optimizer table matches reference trainer.py:116-149:
  wgan   -> RMSProp (g_lr / d_lr) + weight clipping (done by the step fn)
  wgan-gp-> Adam(b1=0.5, b2=0.9)
  dcgan  -> Adam(b1=0.5)
  lsgan  -> RMSProp
LR schedule: halve every `lr_update_step` steps (trainer.py:56-59,362-363),
expressed as a closed-form optax schedule lr * 0.5^(step // interval).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


def halving_schedule(base_lr: float, interval: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(count):
        return base_lr * (0.5 ** (count // interval))
    return schedule


def make_optimizer(mode: str, base_lr: float, lr_update_step: int) -> optax.GradientTransformation:
    lr = halving_schedule(base_lr, lr_update_step)
    if mode in ("wgan", "lsgan"):
        # TF RMSPropOptimizer defaults: decay .9, momentum 0, eps 1e-10.
        return optax.rmsprop(learning_rate=lr, decay=0.9, eps=1e-10)
    if mode == "wgan-gp":
        return optax.adam(learning_rate=lr, b1=0.5, b2=0.9)
    if mode == "dcgan":
        return optax.adam(learning_rate=lr, b1=0.5, b2=0.999)
    if mode == "ae":  # plain reconstruction (model 2): Adam b1=0.5
        return optax.adam(learning_rate=lr, b1=0.5, b2=0.999)
    raise ValueError(f"unknown optimizer mode {mode!r}")


class GanState(struct.PyTreeNode):
    """Generator/discriminator parameter + optimizer state bundle.

    `g_params` / `d_params` are dicts of named sub-trees so partial
    checkpoint composition (reference trainer.py:180-213) maps 1:1 onto
    orbax sub-tree restore.
    """
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    d_stats: Any = None          # BatchNorm running stats for D (if any)
    frozen_params: Any = None    # pretrained, non-trained sub-trees

    g_tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, *, g_params, d_params, g_tx, d_tx, d_stats=None,
               frozen_params=None, step=0):
        if frozen_params is not None:
            # Private copy: train steps donate the whole state, which would
            # otherwise delete the caller's buffers (e.g. a restored
            # checkpoint subtree shared across several stages).
            frozen_params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), frozen_params)
        return cls(
            step=jnp.asarray(step, jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_tx.init(g_params) if g_tx is not None else None,
            d_opt_state=d_tx.init(d_params) if d_params is not None and d_tx is not None else None,
            d_stats=d_stats,
            frozen_params=frozen_params,
            g_tx=g_tx,
            d_tx=d_tx,
        )

    def apply_g(self, grads):
        updates, new_opt = self.g_tx.update(grads, self.g_opt_state, self.g_params)
        return self.replace(g_params=optax.apply_updates(self.g_params, updates),
                            g_opt_state=new_opt)

    def apply_d(self, grads):
        updates, new_opt = self.d_tx.update(grads, self.d_opt_state, self.d_params)
        return self.replace(d_params=optax.apply_updates(self.d_params, updates),
                            d_opt_state=new_opt)
