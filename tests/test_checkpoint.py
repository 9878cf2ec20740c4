"""Checkpoint round-trip + 4-subnet partial composition (SURVEY §5.4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpig_tpu.apps.stage1_app import Stage1App
from dpig_tpu.apps.stage1_pose import Stage1PoseApp
from dpig_tpu.config import Config
from dpig_tpu.data.synthetic import SyntheticLoader
from dpig_tpu.train import checkpoint as ckpt


def small_cfg(model_dir, **kw):
    d = dict(img_H=32, img_W=16, batch_size=4, conv_hidden_num=16, z_num=16,
             model_dir=str(model_dir))
    d.update(kw)
    return Config(**d)


def tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return len(fa) == len(fb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


def test_save_restore_roundtrip(tmp_path):
    cfg = small_cfg(tmp_path / "m")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    batch = next(SyntheticLoader(4, 32, 16, seed=1))
    state, _ = app.train_step(state, dict(batch), jax.random.PRNGKey(1))

    path = ckpt.save_checkpoint(cfg.model_dir, int(state.step), state)
    assert ckpt.latest_checkpoint(cfg.model_dir) == path

    state2 = app.init_state(jax.random.PRNGKey(42))
    assert not tree_equal(state.g_params, state2.g_params)
    state2 = ckpt.restore_into_state(path, state2)
    assert tree_equal(state.g_params, state2.g_params)
    assert tree_equal(state.d_params, state2.d_params)
    assert int(state2.step) == int(state.step)

    # training continues from the restored state
    state2, m = app.train_step(state2, dict(batch), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["g_loss"]))


def test_partial_subtree_composition(tmp_path):
    cfg1 = small_cfg(tmp_path / "stage1")
    app1 = Stage1App(cfg1)
    s1 = app1.init_state(jax.random.PRNGKey(0))
    p1 = ckpt.save_checkpoint(cfg1.model_dir, 0, s1)

    cfg2 = small_cfg(tmp_path / "poseae")
    app2 = Stage1PoseApp(cfg2)
    s2 = app2.init_state(jax.random.PRNGKey(1))
    p2 = ckpt.save_checkpoint(cfg2.model_dir, 0, s2)

    # the model-11 style composition
    merged = {}
    merged.update(ckpt.restore_subtrees(p1, ["Encoder", "ID_AE"]))
    merged.update(ckpt.restore_subtrees(p2, ["PoseAE"]))
    assert set(merged) == {"Encoder", "ID_AE", "PoseAE"}
    assert tree_equal(merged["Encoder"], s1.g_params["Encoder"])
    assert tree_equal(merged["PoseAE"], s2.g_params["PoseAE"])

    with pytest.raises(KeyError):
        ckpt.restore_subtrees(p1, ["PoseGaussian"])


def test_compose_pretrained_flags(tmp_path):
    cfg1 = small_cfg(tmp_path / "stage1")
    s1 = Stage1App(cfg1).init_state(jax.random.PRNGKey(0))
    p1 = ckpt.save_checkpoint(cfg1.model_dir, 0, s1)
    cfg = small_cfg(tmp_path / "x", pretrained_path=p1)
    merged = ckpt.compose_pretrained(cfg)
    assert set(merged) == {"Encoder", "ID_AE"}


def test_pretrained_path_accepts_model_dir(tmp_path):
    """--pretrained_* flags take a model DIRECTORY like the reference
    (tf.train.latest_checkpoint semantics): resolve_checkpoint maps it to
    the newest ckpt/step_* inside."""
    cfg1 = small_cfg(tmp_path / "stage1")
    s1 = Stage1App(cfg1).init_state(jax.random.PRNGKey(0))
    ckpt.save_checkpoint(cfg1.model_dir, 0, s1)
    newest = ckpt.save_checkpoint(cfg1.model_dir, 7, s1)

    assert ckpt.resolve_checkpoint(cfg1.model_dir) == newest
    # a step dir passes through untouched
    assert ckpt.resolve_checkpoint(newest) == newest

    # restore through the model_dir form end-to-end
    merged = ckpt.restore_subtrees(cfg1.model_dir, ["Encoder", "ID_AE"])
    assert tree_equal(merged["Encoder"], s1.g_params["Encoder"])


def test_harness_auto_resume(tmp_path):
    """Trainer picks up the newest checkpoint without --ckpt_path."""
    from dpig_tpu.data.synthetic import SyntheticLoader
    from dpig_tpu.train.harness import Trainer

    cfg = small_cfg(tmp_path / "m", max_step=2, log_step=1)
    app = Stage1App(cfg)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=1)
    t = Trainer(cfg, app, loader, use_mesh=False)
    state = t.train()
    assert int(state.step) == 2

    # second trainer resumes from the saved final checkpoint
    cfg2 = small_cfg(tmp_path / "m", max_step=3, log_step=1)
    t2 = Trainer(cfg2, Stage1App(cfg2), loader, use_mesh=False)
    s2 = t2.init_state(jax.random.PRNGKey(5))
    assert int(s2.step) == 2


def test_frozen_params_survive_donation(tmp_path):
    """Train steps donate their state; a restored frozen subtree shared by
    two stages must not be deleted by the first stage's step (regression:
    'Array has been deleted')."""
    from dpig_tpu.apps.stage2_app import Stage2AppApp
    from dpig_tpu.apps.stage2_pose import Stage2PoseApp
    from dpig_tpu.apps.stage1_pose import Stage1PoseApp
    from dpig_tpu.data.synthetic import SyntheticLoader

    cfg = small_cfg(tmp_path / "s1")
    s1 = Stage1App(cfg).init_state(jax.random.PRNGKey(0))
    p1 = ckpt.save_checkpoint(cfg.model_dir, 0, s1)
    pose = Stage1PoseApp(cfg).init_state(jax.random.PRNGKey(1))
    p2 = ckpt.save_checkpoint(str(tmp_path / "pae"), 0, pose)

    frozen = ckpt.restore_subtrees(p1, ["Encoder", "ID_AE"])
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=2))

    app3 = Stage2AppApp(cfg)
    st3 = app3.init_state(jax.random.PRNGKey(2), frozen_params=frozen)
    st3, _ = app3.train_step(st3, dict(batch), jax.random.PRNGKey(3))

    # reuse the SAME restored subtree for the next stage
    frozen4 = dict(ckpt.restore_subtrees(p2, ["PoseAE"]))
    frozen4.update(frozen)
    app4 = Stage2PoseApp(cfg)
    st4 = app4.init_state(jax.random.PRNGKey(4), frozen_params=frozen4)
    st4, m = app4.train_step(st4, dict(batch), jax.random.PRNGKey(5))
    assert np.isfinite(float(m["g_loss_embs"]))
