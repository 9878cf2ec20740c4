"""Straight-through estimators (reference models.py:91-130).

The reference implements these with TF gradient_override_map gymnastics;
in JAX the identity-gradient trick is a one-liner with stop_gradient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_round(x: jax.Array) -> jax.Array:
    """Round [0,1] -> {0,1} with identity (straight-through) gradient.

    Reference models.py:97-111 `binaryRound`.
    """
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def bernoulli_sample(x: jax.Array, rng: jax.Array) -> jax.Array:
    """Sample {0,1} with P(1)=x, straight-through gradient w.r.t. x.

    Reference models.py:113-130 `bernoulliSample` (ceil(x - U) with
    identity gradient to x, zero to the noise).
    """
    u = jax.random.uniform(rng, x.shape, dtype=x.dtype)
    hard = jnp.ceil(x - u)
    return x + jax.lax.stop_gradient(hard - x)
