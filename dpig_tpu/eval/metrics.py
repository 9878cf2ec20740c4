"""Evaluation metrics — exact protocol parity with score.py / score_mask.py.

skimage is not in the TPU image, so the scoring primitives are
re-implemented here and unit-tested against the published algorithms:

  * rgb2gray:      Y = 0.2125 R + 0.7154 G + 0.0721 B on [0,1] floats
                   (skimage.color.rgb2gray on uint8 input).
  * ssim:          skimage compare_ssim defaults — 7x7 uniform window,
                   sample covariance (N/(N-1)), K1=.01, K2=.03, with the
                   protocol's data_range = x.max()-x.min() (score.py:62-64).
  * psnr:          10*log10(data_range^2 / MSE) (score.py:66).
  * l1/l2 means:   score.py:22-30.
  * masked SSIM:   multichannel (channel-mean) SSIM on mask-multiplied RGB
                   (score_mask.py:80-86).
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter

_GRAY_W = np.array([0.2125, 0.7154, 0.0721])


def rgb2gray(img: np.ndarray) -> np.ndarray:
    """uint8-range [H,W,3] -> [H,W] float in [0,1] (skimage convention)."""
    img = np.asarray(img, dtype=np.float64)
    if img.max() > 1.0 + 1e-6:
        img = img / 255.0
    return img @ _GRAY_W


def ssim(im1: np.ndarray, im2: np.ndarray, data_range: float,
         win_size: int = 7) -> float:
    """skimage.compare_ssim(multichannel=False) defaults."""
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    np_ = win_size ** im1.ndim
    cov_norm = np_ / (np_ - 1)  # sample covariance (use_sample_covariance)
    filt = lambda x: uniform_filter(x, size=win_size)  # noqa: E731
    ux, uy = filt(im1), filt(im2)
    uxx, uyy, uxy = filt(im1 * im1), filt(im2 * im2), filt(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1, a2 = 2 * ux * uy + c1, 2 * vxy + c2
    b1, b2 = ux ** 2 + uy ** 2 + c1, vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    pad = (win_size - 1) // 2
    return float(s[pad:-pad or None, pad:-pad or None].mean())


def ssim_multichannel(im1: np.ndarray, im2: np.ndarray,
                      data_range: float) -> float:
    """Channel-mean SSIM (skimage multichannel=True; score_mask.py:80-82)."""
    return float(np.mean([ssim(im1[..., c], im2[..., c], data_range)
                          for c in range(im1.shape[-1])]))


def psnr(im_true: np.ndarray, im_test: np.ndarray, data_range: float) -> float:
    mse = np.mean((np.asarray(im_true, np.float64)
                   - np.asarray(im_test, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range ** 2) / mse))


def l1_mean_dist(x: np.ndarray, y: np.ndarray) -> float:
    diff = np.asarray(x, float) - np.asarray(y, float)
    return float(np.sum(np.abs(diff)) / np.prod(x.shape))


def l2_mean_dist(x: np.ndarray, y: np.ndarray) -> float:
    diff = np.asarray(x, float) - np.asarray(y, float)
    return float(np.sqrt(np.sum(diff ** 2)) / np.prod(x.shape))


def score_pair_gray(g: np.ndarray, x_target: np.ndarray) -> dict:
    """Per-image scoring protocol (score.py:59-68): grayscale, target's
    data range, SSIM/PSNR/L1/L2."""
    g_gray = rgb2gray(np.clip(g, 0, 255))
    x_gray = rgb2gray(np.clip(x_target, 0, 255))
    dr = x_gray.max() - x_gray.min()
    return {
        "ssim": ssim(g_gray, x_gray, data_range=dr),
        "psnr": psnr(x_gray, g_gray, data_range=dr),
        "l1": l1_mean_dist(g_gray, x_gray),
        "l2": l2_mean_dist(g_gray, x_gray),
    }


def apply_mask_uint8(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Reference masking op `np.uint8(mask[:,:,None]/255. * img)`
    (score_mask.py:80-81,121): graded [0,255] mask scaled to [0,1],
    multiplied, then truncated to uint8 — NOT binarized."""
    m = np.asarray(mask, np.float64) / 255.0
    if m.ndim == 2:
        m = m[..., None]
    return (m * np.asarray(img, np.float64)).astype(np.uint8)


def score_pair_masked(g: np.ndarray, x_target: np.ndarray,
                      mask: np.ndarray) -> dict:
    """Masked RGB scoring (score_mask.py:80-86): both images mask-multiplied
    and cast to uint8, multichannel SSIM/PSNR with skimage's uint8 default
    data_range of 255 (no data_range argument is passed in the reference)."""
    gm = apply_mask_uint8(g, mask)
    xm = apply_mask_uint8(x_target, mask)
    return {
        "ssim": ssim_multichannel(gm, xm, data_range=255),
        "psnr": psnr(xm, gm, data_range=255),
        "l1": l1_mean_dist(gm, xm),
        "l2": l2_mean_dist(gm, xm),
    }


def ssim_images(g_batch: np.ndarray, x_batch: np.ndarray) -> np.ndarray:
    """Batched grayscale SSIM (the trainer preview metric,
    trainer.py:516-521)."""
    g_batch = np.asarray(g_batch)
    x_batch = np.asarray(x_batch)
    out = []
    for i in range(g_batch.shape[0]):
        g_gray = rgb2gray(np.clip(g_batch[i], 0, 255).astype(np.uint8))
        x_gray = rgb2gray(np.clip(x_batch[i], 0, 255).astype(np.uint8))
        dr = x_gray.max() - x_gray.min()
        out.append(ssim(g_gray, x_gray, data_range=dr if dr > 0 else 1.0))
    return np.asarray(out)
