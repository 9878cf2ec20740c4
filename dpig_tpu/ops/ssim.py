"""In-graph SSIM / MS-SSIM (reference models.py:19-87 tf_ssim/tf_ms_ssim).

Gaussian-window SSIM on NHWC single-channel images, VALID padding, L=1.
Kept for loss/monitoring parity; the *evaluation* protocol (skimage-style
uniform-window SSIM, score.py:59-64) lives in dpig_tpu/eval/metrics.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .image import avg_pool_2x


def _fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial('gaussian') (reference models.py:19-34)."""
    coords = np.mgrid[-size // 2 + 1 : size // 2 + 1, -size // 2 + 1 : size // 2 + 1]
    x, y = coords[0], coords[1]
    g = np.exp(-((x ** 2 + y ** 2) / (2.0 * sigma ** 2)))
    return (g / g.sum()).astype(np.float32)


def _conv_valid(img: jax.Array, window: jax.Array) -> jax.Array:
    """Depthless VALID conv of [B,H,W,1] with [kh,kw] window."""
    kern = window[:, :, None, None]  # HWIO
    return jax.lax.conv_general_dilated(
        img, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    cs_map: bool = False,
    mean_metric: bool = True,
    size: int = 11,
    sigma: float = 1.5,
):
    """Gaussian-window SSIM, L=1, K1=.01, K2=.03 (models.py:37-62)."""
    window = jnp.asarray(_fspecial_gauss(size, sigma))
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    mu1 = _conv_valid(img1, window)
    mu2 = _conv_valid(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _conv_valid(img1 * img1, window) - mu1_sq
    sigma2_sq = _conv_valid(img2 * img2, window) - mu2_sq
    sigma12 = _conv_valid(img1 * img2, window) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if cs_map:
        cs = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
        if mean_metric:
            return jnp.mean(ssim_map), jnp.mean(cs)
        return ssim_map, cs
    return jnp.mean(ssim_map) if mean_metric else ssim_map


def ms_ssim(img1: jax.Array, img2: jax.Array, level: int = 5) -> jax.Array:
    """Multi-scale SSIM (models.py:65-87)."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    mssim, mcs = [], []
    for _ in range(level):
        s, cs = ssim(img1, img2, cs_map=True, mean_metric=True)
        mssim.append(s)
        mcs.append(cs)
        img1 = avg_pool_2x(img1)
        img2 = avg_pool_2x(img2)
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    return jnp.prod(mcs[: level - 1] ** weights[: level - 1]) * (
        mssim[level - 1] ** weights[level - 1]
    )
