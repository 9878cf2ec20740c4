"""crop_and_resize parity vs tf.image.crop_and_resize (the exact op the
reference uses, models.py:297/350/415). TF is present in the dev image; the
test is skipped if unavailable so the suite stays hermetic.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dpig_tpu.ops.crop import crop_and_resize, crop_body_rois

tf = pytest.importorskip("tensorflow")


def test_matches_tf_crop_and_resize(rng):
    B, H, W, C = 3, 32, 16, 5
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # boxes normalized by H/W like the reference (int pixel / size)
    y1 = rng.integers(0, H // 2, B)
    x1 = rng.integers(0, W // 2, B)
    y2 = y1 + rng.integers(2, H // 2, B)
    x2 = x1 + rng.integers(2, W // 2, B)
    boxes = np.stack([y1 / H, x1 / W, y2 / H, x2 / W], -1).astype(np.float32)

    want = tf.image.crop_and_resize(
        feat, boxes, np.arange(B, dtype=np.int32), [12, 12]).numpy()
    got = np.asarray(crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes),
                                     12, 12))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_out_of_bounds_boxes_zero_fill(rng):
    B, H, W, C = 2, 16, 16, 3
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    boxes = np.array([[-0.5, -0.5, 1.5, 1.5],
                      [0.2, 0.2, 0.8, 0.8]], np.float32)
    want = tf.image.crop_and_resize(
        feat, boxes, np.arange(B, dtype=np.int32), [8, 8]).numpy()
    got = np.asarray(crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes), 8, 8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_crop_body_rois_part_major_stacking(rng):
    B, H, W, C, P, S = 2, 32, 16, 4, 3, 8
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    bbox = np.zeros((B, P, 4), np.int32)
    for b in range(B):
        for p in range(P):
            bbox[b, p] = [p, p, p + 8, p + 8]
    out = np.asarray(crop_body_rois(jnp.asarray(feat), jnp.asarray(bbox), S))
    assert out.shape == (P * B, S, S, C)
    # part-major: rows [0:B] are part 0 of every batch element
    boxes0 = (bbox[:, 0].astype(np.float32)
              / np.array([H, W, H, W], np.float32))
    want0 = tf.image.crop_and_resize(
        feat, boxes0, np.arange(B, dtype=np.int32), [S, S]).numpy()
    np.testing.assert_allclose(out[:B], want0, rtol=1e-5, atol=1e-5)
