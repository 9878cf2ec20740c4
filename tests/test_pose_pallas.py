"""Pallas pose-rasterizer kernel == jnp reference (interpreter mode)."""
import numpy as np
import jax.numpy as jnp

from dpig_tpu.ops.pose import render_pose_maps
from dpig_tpu.ops.pose_pallas import render_pose_maps_pallas


def test_pallas_matches_jnp_pixel_coords(rng):
    B, H, W, K = 2, 64, 32, 18
    rcv = np.stack([
        rng.uniform(-2, H + 2, (B, K)),
        rng.uniform(-2, W + 2, (B, K)),
        (rng.uniform(size=(B, K)) > 0.3).astype(np.float32)],
        -1).astype(np.float32)
    a = np.asarray(render_pose_maps(jnp.asarray(rcv), H, W, K, 4, False))
    b = np.asarray(render_pose_maps_pallas(jnp.asarray(rcv), H, W, K, 4,
                                           False, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_matches_jnp_normalized(rng):
    B, H, W, K = 2, 64, 32, 18
    rcv = np.stack([
        rng.uniform(-1.2, 1.2, (B, K)),
        rng.uniform(-1.2, 1.2, (B, K)),
        (rng.uniform(size=(B, K)) > 0.3).astype(np.float32)],
        -1).astype(np.float32)
    a = np.asarray(render_pose_maps(jnp.asarray(rcv), H, W, K, 4, True))
    b = np.asarray(render_pose_maps_pallas(jnp.asarray(rcv), H, W, K, 4,
                                           True, interpret=True))
    np.testing.assert_array_equal(a, b)
