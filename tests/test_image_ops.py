"""ops/image.py: upsample variants + the custom-VJP backward."""
import numpy as np
import jax
import jax.numpy as jnp

from dpig_tpu.ops.image import upscale_nn, upscale_nn_concat, _upscale_nn_raw


def test_upscale_nn_matches_reference_semantics(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 5, 4)).astype(np.float32))
    up = np.asarray(upscale_nn(x, 2))
    ref = np.asarray(x)
    for i in range(6):
        for j in range(10):
            np.testing.assert_array_equal(up[:, i, j], ref[:, i // 2, j // 2])


def test_upscale_nn_concat_bit_identical(rng):
    xi = jnp.asarray(rng.integers(-127, 128, (3, 5, 7, 9)).astype(np.int8))
    np.testing.assert_array_equal(np.asarray(upscale_nn(xi)),
                                  np.asarray(upscale_nn_concat(xi)))


def test_upscale_custom_vjp_matches_autodiff(rng):
    """The strided-slice backward equals the broadcast form's autodiff
    gradient (up to f32 summation order)."""
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    ga = jax.grad(lambda x: jnp.vdot(upscale_nn(x), g))(x)
    gb = jax.grad(lambda x: jnp.vdot(_upscale_nn_raw(x, 2), g))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)
    # analytic check: each input cell's grad is the sum of its 2x2 group
    want = (np.asarray(g)[:, ::2, ::2] + np.asarray(g)[:, 1::2, ::2]
            + np.asarray(g)[:, ::2, 1::2] + np.asarray(g)[:, 1::2, 1::2])
    np.testing.assert_allclose(np.asarray(ga), want, atol=1e-6)
