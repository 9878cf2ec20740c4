"""Smoke tests: pose AE (model 2) and Stage-II samplers (models 3/4)."""
import numpy as np
import jax
import jax.numpy as jnp

from dpig_tpu.apps.stage1_pose import Stage1PoseApp
from dpig_tpu.apps.stage2_app import Stage2AppApp
from dpig_tpu.apps.stage2_pose import Stage2PoseApp
from dpig_tpu.config import Config
from dpig_tpu.data.synthetic import SyntheticLoader


def small_cfg(**kw):
    d = dict(img_H=32, img_W=16, batch_size=8, conv_hidden_num=16, z_num=16,
             g_lr=2e-4, d_lr=2e-4, lr_update_step=1000, model_dir="/tmp/t")
    d.update(kw)
    return Config(**d)


def test_pose_ae_loss_decreases():
    cfg = small_cfg(batch_size=16)
    app = Stage1PoseApp(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=3)
    batch = next(loader)
    first = None
    for i in range(10):
        state, m = app.train_step(state, dict(batch), jax.random.PRNGKey(i))
        if first is None:
            first = float(m["reconstruct_loss"])
    assert float(m["reconstruct_loss"]) < first
    # decode path: binary visibility, maps in [-1, 1]
    z = jnp.zeros((4, 32))
    rcv, maps = app.decode_pose(state.g_params, z)
    assert rcv.shape == (4, cfg.keypoint_num, 3)
    assert maps.shape == (4, cfg.img_H, cfg.img_W, cfg.keypoint_num)
    assert set(np.unique(np.asarray(rcv[..., 2]))).issubset({0.0, 1.0})


def test_stage2_app_wgan_clip_and_losses():
    cfg = small_cfg()
    app = Stage2AppApp(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=5))
    for i in range(2):
        state, m = app.train_step(state, dict(batch), jax.random.PRNGKey(i))
    for k, v in m.items():
        if k.startswith("hist/"):
            assert np.all(np.isfinite(np.asarray(v)))
        else:
            assert np.isfinite(float(v))
    # WGAN weight clipping applied to the critics
    for leaf in jax.tree_util.tree_leaves(state.d_params):
        assert float(jnp.max(jnp.abs(leaf))) <= 0.01 + 1e-6
    # preview composes fix/vary FG-BG halves
    out = app.preview_step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                           jax.random.PRNGKey(9))
    assert out.shape == (cfg.batch_size, cfg.img_H, cfg.img_W, 3)


def test_stage2_pose_sampler():
    cfg = small_cfg()
    app = Stage2PoseApp(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=6))
    state, m = app.train_step(state, dict(batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["g_loss_embs"]))
    assert np.isfinite(float(m["d_loss_embs"]))
    rcv, maps = app.sample_poses(state, jax.random.PRNGKey(2), 4)
    assert rcv.shape == (4, cfg.keypoint_num, 3)
    assert maps.shape == (4, cfg.img_H, cfg.img_W, cfg.keypoint_num)
    out = app.preview_step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                           jax.random.PRNGKey(3))
    assert out.shape == (cfg.batch_size, cfg.img_H, cfg.img_W, 3)


def test_stage2_app_single_mapper_df():
    """DF model 103: one Gaussian_FC mapper over the 7*32-d embedding."""
    import jax.numpy as jnp
    from dpig_tpu.apps.stage2_app_single import Stage2AppSingleApp
    cfg = small_cfg()
    app = Stage2AppSingleApp(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    assert set(state.g_params) == {"Gaussian_FC"}
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=7))
    state, m = app.train_step(state, dict(batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["g_loss_embs"]))
    for leaf in jax.tree_util.tree_leaves(state.d_params):
        assert float(jnp.max(jnp.abs(leaf))) <= 0.01 + 1e-6
    out = app.preview_step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                           jax.random.PRNGKey(9))
    assert out.shape == (cfg.batch_size, cfg.img_H, cfg.img_W, 3)
