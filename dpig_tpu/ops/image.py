"""Image normalization / resizing primitives.

Reference semantics: utils.py:102-107 (process/unprocess), utils.py:88-89
(denorm+clip), utils.py:70-72 (nearest-neighbor upscale).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def process_image(image: jax.Array, mean_pixel: float = 127.5, norm: float = 127.5) -> jax.Array:
    """uint8-range image -> [-1, 1] floats. (reference utils.py:102-103)"""
    return (image - mean_pixel) / norm


def unprocess_image(image: jax.Array, mean_pixel: float = 127.5, norm: float = 127.5) -> jax.Array:
    """[-1, 1] floats -> uint8-range. (reference utils.py:106-107)"""
    return image * norm + mean_pixel


def denorm_img(norm: jax.Array) -> jax.Array:
    """[-1,1] -> [0,255] clipped (reference utils.py:88-89). NHWC only."""
    return jnp.clip((norm + 1.0) * 127.5, 0.0, 255.0)


def _upscale_nn_raw(x: jax.Array, scale: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


@jax.custom_vjp
def _upscale_nn_2x(x: jax.Array) -> jax.Array:
    return _upscale_nn_raw(x, 2)


def _upscale_fwd(x):
    return _upscale_nn_2x(x), None


def _upscale_bwd(_, g):
    # Gradient of NN 2x upsample = sum over each 2x2 duplicate group.
    # Expressed as four strided slices added elementwise: XLA fuses this
    # into one pass, where the generic reduce over the reshaped 6-D view
    # is emitted ~6x over its bandwidth floor on the v5e
    # (estimated_cycles oracle, train-step dump).
    return (g[:, ::2, ::2] + g[:, 1::2, ::2]
            + g[:, ::2, 1::2] + g[:, 1::2, 1::2],)


_upscale_nn_2x.defvjp(_upscale_fwd, _upscale_bwd)


def upscale_nn(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor 2x upsample of an NHWC tensor.

    Matches tf.image.resize_nearest_neighbor for integer scale factors
    (reference utils.py:61-72). Implemented as reshape+broadcast so XLA
    lowers it to a cheap layout change instead of a gather; the 2x path
    carries a custom VJP (strided-slice sum, see _upscale_bwd).
    """
    if scale == 2:
        return _upscale_nn_2x(x)
    return _upscale_nn_raw(x, scale)


def upscale_nn_concat(x: jax.Array, scale: int = 2) -> jax.Array:
    """upscale_nn via channel-concat + reshape (bit-identical output).

    [B,H,W,C] -> concat 2x along C -> [B,H,2W,C] duplicates each pixel
    along W (row-major: w*2C+c maps to (2w+c//C)*C + c%C), then the same
    along H. MEASURED DEAD END on the v5e (estimated_cycles oracle,
    round 3): the reshapes force layout copies around the pad_add concat
    fusion (~14 ms est vs ~7.4 ms for the 6-D broadcast form in the
    bs256 generator) — kept as the calibrated alternative; use
    `upscale_nn`."""
    assert scale == 2, "concat form implemented for 2x only"
    b, h, w, c = x.shape
    x = jnp.concatenate([x, x], axis=-1).reshape(b, h, 2 * w, c)
    x = jnp.concatenate([x.reshape(b, h, 1, 2 * w * c)] * 2, axis=2)
    return x.reshape(b, 2 * h, 2 * w, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2/2 average pool, SAME padding, NHWC (for MS-SSIM pyramid)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    ) / 4.0


def slerp(val, low, high):
    """Spherical interpolation (reference utils.py:91-97). Works on 1-D
    embedding vectors; falls back to lerp for (near-)parallel inputs."""
    import numpy as np
    low = np.asarray(low)
    high = np.asarray(high)
    omega = np.arccos(np.clip(
        np.dot(low / np.linalg.norm(low), high / np.linalg.norm(high)),
        -1, 1))
    so = np.sin(omega)
    if so == 0:
        return (1.0 - val) * low + val * high
    return (np.sin((1.0 - val) * omega) / so * low
            + np.sin(val * omega) / so * high)
