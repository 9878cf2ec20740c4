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


def test_stage2_fresh_critic_batches_identical_when_same_batch():
    """train_step_fresh (reference queue semantics, trainer.py:821-845)
    must equal the fused reused-batch step bitwise when every critic
    'fresh' batch IS the step batch — pins that the only difference
    between the modes is which real samples the critics see."""
    cfg = small_cfg()
    app = Stage2AppApp(cfg)
    state_a = app.init_state(jax.random.PRNGKey(0))
    state_b = app.init_state(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W,
                                  seed=11)).items()}
    from dpig_tpu.losses import gan
    r = jax.random.PRNGKey(4)
    state_a, m_a = app.train_step(state_a, dict(batch), r)
    state_b, m_b = app.train_step_fresh(
        state_b, [dict(batch) for _ in range(1 + gan.CRITIC_ITERS)], r)
    for k in m_a:
        np.testing.assert_array_equal(np.asarray(m_a[k]),
                                      np.asarray(m_b[k]), err_msg=k)
    for la, lb in zip(jax.tree_util.tree_leaves((state_a.g_params,
                                                 state_a.d_params)),
                      jax.tree_util.tree_leaves((state_b.g_params,
                                                 state_b.d_params))):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_stage2_batches_per_step_follows_critic_batch_mode():
    """--critic_batch_mode=fresh (default) makes every stage-2 app ask the
    harness for 1+CRITIC_ITERS batches/step; 'reused' asks for one."""
    from dpig_tpu.apps.stage2_app_single import Stage2AppSingleApp
    from dpig_tpu.losses import gan
    n = 1 + gan.CRITIC_ITERS
    for cls in (Stage2AppApp, Stage2PoseApp, Stage2AppSingleApp):
        assert cls(small_cfg()).batches_per_step == n, cls
        assert cls(small_cfg(critic_batch_mode="reused")).batches_per_step == 1
    import pytest
    with pytest.raises(ValueError, match="critic_batch_mode"):
        Stage2AppApp(small_cfg(critic_batch_mode="frsh"))


def test_stage2_pose_fresh_equals_reused_on_same_batch():
    """Pose-sampler fresh step == fused step bitwise when all critic
    batches ARE the step batch (mirrors the Stage2AppApp pin)."""
    from dpig_tpu.losses import gan
    cfg = small_cfg()
    app = Stage2PoseApp(cfg)
    state_a = app.init_state(jax.random.PRNGKey(0))
    state_b = app.init_state(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W,
                                  seed=13)).items()}
    r = jax.random.PRNGKey(4)
    state_a, m_a = app.train_step(state_a, dict(batch), r)
    # tuple input -> the dispatcher routes to the fresh-jitted step
    state_b, m_b = app.train_step(
        state_b, tuple(dict(batch) for _ in range(1 + gan.CRITIC_ITERS)), r)
    for k in m_a:
        np.testing.assert_array_equal(np.asarray(m_a[k]),
                                      np.asarray(m_b[k]), err_msg=k)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.g_params),
                      jax.tree_util.tree_leaves(state_b.g_params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_stage2_single_fresh_equals_reused_on_same_batch():
    from dpig_tpu.apps.stage2_app_single import Stage2AppSingleApp
    from dpig_tpu.losses import gan
    cfg = small_cfg()
    app = Stage2AppSingleApp(cfg)
    state_a = app.init_state(jax.random.PRNGKey(0))
    state_b = app.init_state(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W,
                                  seed=14)).items()}
    r = jax.random.PRNGKey(4)
    state_a, m_a = app.train_step(state_a, dict(batch), r)
    state_b, m_b = app.train_step(
        state_b, tuple(dict(batch) for _ in range(1 + gan.CRITIC_ITERS)), r)
    for k in m_a:
        np.testing.assert_array_equal(np.asarray(m_a[k]),
                                      np.asarray(m_b[k]), err_msg=k)


def test_harness_feeds_fresh_critic_batches(tmp_path):
    """End-to-end: the Trainer pulls batches_per_step batches per step for
    a stage-2 app under the fresh default (reference trainer.py:821-845
    queue semantics) and one per step under --critic_batch_mode=reused."""
    from dpig_tpu.losses import gan
    from dpig_tpu.train.harness import Trainer

    class CountingLoader:
        def __init__(self, inner):
            self.inner, self.pulls = inner, 0

        def __next__(self):
            self.pulls += 1
            return next(self.inner)

    for mode, per_step in (("fresh", 1 + gan.CRITIC_ITERS), ("reused", 1)):
        cfg = small_cfg(max_step=2, log_step=1,
                        model_dir=str(tmp_path / mode),
                        critic_batch_mode=mode)
        app = Stage2AppApp(cfg)
        loader = CountingLoader(
            SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=15))
        Trainer(cfg, app, loader).train()
        # +1: the fixed preview batch pulled before the loop
        assert loader.pulls == 1 + cfg.max_step * per_step, mode


def test_stage2_fresh_critic_batches_distinct_runs():
    """Fresh mode with genuinely distinct critic batches runs and stays
    finite + clipped (the mode scripts/critic_batch_ab.py measures)."""
    cfg = small_cfg()
    app = Stage2AppApp(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    from dpig_tpu.losses import gan
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=12)
    bs = [{k: jnp.asarray(v) for k, v in next(loader).items()}
          for _ in range(1 + gan.CRITIC_ITERS)]
    state, m = app.train_step_fresh(state, bs, jax.random.PRNGKey(5))
    for k, v in m.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    for leaf in jax.tree_util.tree_leaves(state.d_params):
        assert float(jnp.max(jnp.abs(leaf))) <= 0.01 + 1e-6
