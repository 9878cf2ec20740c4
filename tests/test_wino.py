"""Winograd F(2x2,3x3) transform-domain conv: exactness + int8 error."""
import numpy as np
import jax
import jax.numpy as jnp

from dpig_tpu.ops import wino


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_wino_float_equals_direct_conv(rng):
    for (h, w, ci, co) in [(8, 4, 5, 7), (16, 8, 3, 3), (4, 4, 1, 1)]:
        x = jnp.asarray(rng.normal(0, 1, (2, h, w, ci)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.5, (3, 3, ci, co)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
        got = wino.wino_conv(x, k, b)
        want = _direct(x, k) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_wino_int8_close_to_direct(rng):
    """Per-point int8 error should be in the same class as direct int8
    (per-tensor) quantization error."""
    h, w, ci, co = 16, 8, 32, 32
    x = jnp.asarray(rng.normal(0, 1.0, (4, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, ci, co)), jnp.float32)

    w8, w_scale = wino.quantize_wino_weights(np.asarray(k))
    u_scale = wino.calibrate_u_scales(x)
    got = wino.wino_conv_int8(x, w8, w_scale, u_scale)
    want = _direct(x, k)

    err = np.abs(np.asarray(got) - np.asarray(want))
    ref = np.abs(np.asarray(want)).mean()
    assert err.mean() / ref < 0.02, (err.mean(), ref)


def test_wino_weight_transform_shape(rng):
    k = jnp.asarray(rng.normal(0, 1, (3, 3, 6, 10)), jnp.float32)
    v = wino.transform_weights(k)
    assert v.shape == (16, 6, 10)
    w8, ws = wino.quantize_wino_weights(np.asarray(k))
    assert w8.shape == (16, 6, 10) and ws.shape == (16, 10)
    assert w8.dtype == jnp.int8
