"""Pose-op parity vs. numpy transcriptions of the reference algorithms
(utils.py:237-346). The goldens below re-implement the reference math
independently (scatter + shifted-add inflation), NOT the fused closed form
under test.
"""
import numpy as np
import jax.numpy as jnp

from dpig_tpu.ops.pose import (
    pose_rcv_normalize, render_pose_maps, render_pose_points)

# tf_poseInflate's shifted-add offsets (utils.py:300-314)
_OFFSETS = ([(-4, 0), (4, 0)]
            + [(x, y) for x in (-3, 3) for y in range(-2, 3)]
            + [(x, y) for x in (-2, 2) for y in range(-3, 4)]
            + [(x, y) for x in (-1, 1) for y in range(-3, 4)]
            + [(0, y) for y in range(-4, 5)]
            + [(0, 0)])


def golden_coord2channel(rcv, H, W, K, normalized):
    """utils.py:237-287 (scatter, clip-if-normalized, vis multiply)."""
    B = rcv.shape[0]
    out = np.zeros((B, H, W, K), np.float32)
    for b in range(B):
        for k in range(K):
            r, c, v = rcv[b, k]
            if normalized:
                r = np.clip((r + 1) / 2.0 * H, 0, H - 1)
                c = np.clip((c + 1) / 2.0 * W, 0, W - 1)
            ri, ci = int(r), int(c)
            if 0 <= ri < H and 0 <= ci < W:
                out[b, ri, ci, k] = 2.0 * v
    return out - 1.0


def golden_inflate(pose, H, W):
    """utils.py:289-318 (pad/crop shifted adds, min 1)."""
    p = (pose + 1.0) / 2.0
    acc = np.zeros_like(p)
    for dx, dy in _OFFSETS:
        shifted = np.zeros_like(p)
        ys = slice(max(0, -dx), min(H, H - dx))
        xs = slice(max(0, -dy), min(W, W - dy))
        ys_src = slice(max(0, dx), min(H, H + dx))
        xs_src = slice(max(0, dy), min(W, W + dy))
        shifted[:, ys, xs, :] = p[:, ys_src, xs_src, :]
        acc += shifted
    return np.minimum(acc, 1.0) * 2.0 - 1.0


def test_render_pixel_coords_matches_scatter_plus_inflate(rng):
    H, W, K, B = 32, 16, 18, 3
    r = rng.uniform(-2, H + 2, (B, K, 1))  # includes out-of-bounds
    c = rng.uniform(-2, W + 2, (B, K, 1))
    v = (rng.uniform(size=(B, K, 1)) > 0.3).astype(np.float32)
    rcv = np.concatenate([r, c, v], -1).astype(np.float32)

    golden = golden_inflate(
        golden_coord2channel(rcv, H, W, K, normalized=False), H, W)
    got = np.asarray(render_pose_maps(jnp.asarray(rcv), H, W, K, radius=4,
                                      normalized=False))
    np.testing.assert_array_equal(got, golden)


def test_render_normalized_matches_py_pose_inflate(rng):
    """normalized path == py_poseInflate (utils.py:320-346)."""
    H, W, K, B = 32, 16, 18, 2
    rcv = np.stack([
        rng.uniform(-1.3, 1.3, (B, K)),
        rng.uniform(-1.3, 1.3, (B, K)),
        (rng.uniform(size=(B, K)) > 0.3).astype(np.float32),
    ], axis=-1).astype(np.float32)

    # direct transcription of py_poseInflate
    golden = np.zeros((B, H, W, K), np.float32)
    radius = 4
    for b in range(B):
        for k in range(K):
            r, c, v = rcv[b, k]
            r = np.clip((r + 1) / 2.0 * H, 0, H - 1)
            c = np.clip((c + 1) / 2.0 * W, 0, W - 1)
            if v:
                for i in range(-radius, radius + 1):
                    for j in range(-radius, radius + 1):
                        if (np.sqrt(i ** 2 + j ** 2) <= radius
                                and 0 <= int(r + i) < H and 0 <= int(c + j) < W):
                            golden[b, int(r + i), int(c + j), k] = 1
    golden = golden * 2.0 - 1.0

    got = np.asarray(render_pose_maps(jnp.asarray(rcv), H, W, K, radius=4,
                                      normalized=True))
    np.testing.assert_array_equal(got, golden)


def test_render_points_radius0(rng):
    H, W, K, B = 16, 8, 18, 2
    rcv = np.stack([
        rng.uniform(0, H - 1, (B, K)),
        rng.uniform(0, W - 1, (B, K)),
        np.ones((B, K), np.float32),
    ], axis=-1).astype(np.float32)
    got = np.asarray(render_pose_points(jnp.asarray(rcv), H, W, K,
                                        normalized=False))
    golden = golden_coord2channel(rcv, H, W, K, normalized=False)
    np.testing.assert_array_equal(got, golden)


def test_pose_rcv_normalize():
    rcv = np.array([[[64.0, 32.0, 1.0], [0.0, 0.0, 0.0]]], np.float32)
    out = np.asarray(pose_rcv_normalize(jnp.asarray(rcv), 128, 64))
    np.testing.assert_allclose(out[0, 0], [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [-1.0, -1.0, 0.0], atol=1e-6)
