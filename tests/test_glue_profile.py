"""HLO-attribution unit tests for scripts/glue_profile.py.

The profiler's value rests on bucketing trace events correctly from the
compiled HLO text (a conv hiding inside a `clamp_convert_fusion` must be
counted as conv, and in train mode fwd/bwd convs must split on the
autodiff `transpose(` scope).  These tests compile tiny CPU graphs and
assert the attribution lands the right buckets.
"""
from __future__ import annotations

import importlib.util
import os

import jax
import jax.numpy as jnp
import pytest


def _load_glue_profile():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "glue_profile.py")
    spec = importlib.util.spec_from_file_location("glue_profile", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def gp():
    return _load_glue_profile()


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_attribution_buckets_inference(gp):
    def f(x, w, m):
        y = jax.nn.leaky_relu(_conv(x, w))           # conv + fused epilogue
        z = jnp.concatenate([y, y], axis=-1)          # glue:concat
        d = z.reshape(z.shape[0], -1) @ m             # dense(mapper)
        return jnp.clip(d, -1, 1).astype(jnp.int8)    # glue:quant

    x = jnp.zeros((2, 8, 8, 4), jnp.float32)
    w = jnp.zeros((3, 3, 4, 4), jnp.float32)
    m = jnp.zeros((8 * 8 * 8, 16), jnp.float32)
    text = jax.jit(f).lower(x, w, m).compile().as_text()
    attr = gp.hlo_attribution(text)
    buckets = {b for b, _, _ in attr.values()}
    assert "conv(+fused epilogue)" in buckets
    assert "dense(mapper)" in buckets
    # every HLO instruction got *some* bucket (no crashes / misparses)
    assert all(b for b, _, _ in attr.values())


def test_attribution_train_splits_fwd_bwd_convs(gp):
    def loss(w, x):
        return jnp.sum(jax.nn.leaky_relu(_conv(x, w)) ** 2)

    x = jnp.ones((2, 8, 8, 4), jnp.float32)
    w = jnp.ones((3, 3, 4, 4), jnp.float32)
    text = jax.jit(jax.grad(loss)).lower(w, x).compile().as_text()
    attr = gp.hlo_attribution(text, train=True)
    buckets = {b for b, _, _ in attr.values()}
    # the wgrad conv appears under the autodiff transpose scope
    assert "conv-bwd(d/wgrad)" in buckets
    # and no inference-mode label leaks into train mode
    assert "conv(+fused epilogue)" not in buckets
    assert "dense(mapper)" not in buckets


def test_attribution_train_reduce_bucket(gp):
    def loss(x):
        return jnp.sum(x * x)

    text = jax.jit(loss).lower(jnp.ones((64, 64))).compile().as_text()
    attr = gp.hlo_attribution(text, train=True)
    buckets = {b for b, _, _ in attr.values()}
    assert "reduce(loss/stats)" in buckets
