"""Metric-protocol checks: naive direct SSIM as an independent golden."""
import numpy as np

from dpig_tpu.eval import metrics


def naive_ssim(im1, im2, data_range, win=7):
    """O(N*win^2) direct transcription of the skimage algorithm."""
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    h, w = im1.shape
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    pad = win // 2
    vals = []
    for i in range(pad, h - pad):
        for j in range(pad, w - pad):
            p1 = im1[i - pad:i + pad + 1, j - pad:j + pad + 1]
            p2 = im2[i - pad:i + pad + 1, j - pad:j + pad + 1]
            ux, uy = p1.mean(), p2.mean()
            vx = cov_norm * (np.mean(p1 * p1) - ux * ux)
            vy = cov_norm * (np.mean(p2 * p2) - uy * uy)
            vxy = cov_norm * (np.mean(p1 * p2) - ux * uy)
            vals.append(((2 * ux * uy + c1) * (2 * vxy + c2))
                        / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    return float(np.mean(vals))


def test_ssim_matches_naive(rng):
    a = rng.uniform(0, 1, (20, 14))
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    dr = b.max() - b.min()
    got = metrics.ssim(a, b, data_range=dr)
    want = naive_ssim(a, b, dr)
    assert abs(got - want) < 1e-9


def test_ssim_identity():
    a = np.random.default_rng(1).uniform(0, 1, (16, 16))
    assert abs(metrics.ssim(a, a, data_range=1.0) - 1.0) < 1e-12


def test_psnr_analytic():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.1)
    # MSE = 0.01, dr = 1 -> 10*log10(1/0.01) = 20
    assert abs(metrics.psnr(a, b, 1.0) - 20.0) < 1e-9


def test_l1_l2_mean():
    a = np.zeros((2, 2))
    b = np.full((2, 2), 2.0)
    assert metrics.l1_mean_dist(a, b) == 2.0
    assert abs(metrics.l2_mean_dist(a, b) - np.sqrt(16.0) / 4) < 1e-12


def test_rgb2gray_weights():
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = 255
    g = metrics.rgb2gray(img)
    assert abs(g[0, 0] - 0.2125) < 1e-6


def test_score_pair_masked_runs(rng):
    g = rng.integers(0, 255, (16, 8, 3)).astype(np.float64)
    x = rng.integers(0, 255, (16, 8, 3)).astype(np.float64)
    m = (rng.uniform(size=(16, 8)) > 0.5).astype(np.float64) * 255
    out = metrics.score_pair_masked(g, x, m)
    assert set(out) == {"ssim", "psnr", "l1", "l2"}
    assert all(np.isfinite(v) for v in out.values())


def test_score_pair_masked_matches_reference_transcription(rng):
    """Golden: direct transcription of score_mask.py:80-86 — graded
    [0,255] mask scaled by /255, uint8 truncation, skimage uint8 default
    data_range=255 for both SSIM (multichannel) and PSNR."""
    g = rng.integers(0, 256, (20, 14, 3)).astype(np.uint8)
    x = rng.integers(0, 256, (20, 14, 3)).astype(np.uint8)
    # graded mask incl. mid values — binarizing it would change the result
    m = rng.integers(0, 256, (20, 14)).astype(np.uint8)

    # reference lines, verbatim semantics
    masked_g = np.uint8(m[:, :, np.newaxis] / 255. * g)
    masked_x = np.uint8(m[:, :, np.newaxis] / 255. * x)
    want_ssim = float(np.mean(
        [naive_ssim(masked_g[..., c].astype(np.float64),
                    masked_x[..., c].astype(np.float64), 255)
         for c in range(3)]))
    mse = np.mean((masked_x.astype(float) - masked_g.astype(float)) ** 2)
    want_psnr = 10 * np.log10(255.0 ** 2 / mse)
    diff = masked_g.astype(float) - masked_x.astype(float)
    want_l1 = np.sum(np.abs(diff)) / np.prod(masked_g.shape)
    want_l2 = np.sqrt(np.sum(diff ** 2)) / np.prod(masked_g.shape)

    out = metrics.score_pair_masked(g, x, m)
    assert abs(out["ssim"] - want_ssim) < 1e-9
    assert abs(out["psnr"] - want_psnr) < 1e-9
    assert abs(out["l1"] - want_l1) < 1e-12
    assert abs(out["l2"] - want_l2) < 1e-12


def test_apply_mask_uint8_graded_truncation():
    img = np.full((2, 2, 3), 200, np.uint8)
    m = np.array([[0, 128], [255, 51]], np.uint8)
    out = metrics.apply_mask_uint8(img, m)
    # np.uint8(128/255*200)=100 (truncated), 51/255*200=40, etc.
    assert out[0, 0, 0] == 0
    assert out[0, 1, 0] == int(128 / 255 * 200)
    assert out[1, 0, 0] == 200
    assert out[1, 1, 0] == int(51 / 255 * 200)


def test_batched_ssim_preview_metric(rng):
    g = rng.integers(0, 255, (3, 16, 8, 3)).astype(np.float32)
    out = metrics.ssim_images(g, g)
    np.testing.assert_allclose(out, 1.0, atol=1e-9)
