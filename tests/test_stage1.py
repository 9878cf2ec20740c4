"""End-to-end smoke: Stage-I (model 1) trains on synthetic fixtures and the
L1 reconstruction loss decreases. Also exercises the 8-device CPU mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dpig_tpu.apps.stage1_app import Stage1App
from dpig_tpu.config import Config
from dpig_tpu.data.synthetic import SyntheticLoader
from dpig_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def small_cfg(**kw):
    d = dict(img_H=32, img_W=16, batch_size=8, conv_hidden_num=16, z_num=16,
             g_lr=2e-4, d_lr=2e-4, lr_update_step=1000, model_dir="/tmp/t")
    d.update(kw)
    return Config(**d)


def test_stage1_train_smoke():
    cfg = small_cfg()
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=1)
    batch = next(loader)

    l1_first = None
    rng = jax.random.PRNGKey(2)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = app.train_step(state, dict(batch), sub)
        for v in metrics.values():
            assert np.isfinite(np.asarray(v)), metrics
        if l1_first is None:
            l1_first = float(metrics["L1Loss"])
    assert int(state.step) == 8
    assert float(metrics["L1Loss"]) < l1_first  # reconstruction improves


def test_stage1_mesh_sharded_step():
    cfg = small_cfg()
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh()
    assert len(jax.devices()) == 8  # conftest forced 8 CPU devices
    state = replicate(state, mesh)
    batch = shard_batch(next(SyntheticLoader(cfg.batch_size, cfg.img_H,
                                             cfg.img_W, seed=1)), mesh)
    state, metrics = app.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))


def test_stage1_generate_and_transfer():
    cfg = small_cfg()
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=1))
    from dpig_tpu.apps.common import pose_maps_from_batch, select_parts
    pose = pose_maps_from_batch({k: jnp.asarray(v) for k, v in batch.items()}, cfg)
    bbox, vis = select_parts(jnp.asarray(batch["part_bbox"]),
                             jnp.asarray(batch["part_vis"]))
    out = app.generate_step(state.g_params, jnp.asarray(batch["x"]), pose,
                            jnp.asarray(batch["mask_r6"]), bbox, vis)
    assert out.shape == (cfg.batch_size, cfg.img_H, cfg.img_W, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 255.0


def test_stage1_fast_gan_step_matches_g_update():
    """--fast_gan_step only changes which fakes D trains on (pre- vs
    post-update G); the G update itself must be IDENTICAL to parity mode,
    and the step must remain finite/trainable."""
    batch = next(SyntheticLoader(8, 32, 16, seed=3))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(4)

    app_a = Stage1App(small_cfg())
    app_b = Stage1App(small_cfg(fast_gan_step=True))
    s0 = app_a.init_state(jax.random.PRNGKey(0))
    sa, ma = app_a.train_step(s0, jb, rng)
    s0b = app_b.init_state(jax.random.PRNGKey(0))
    sb, mb = app_b.train_step(s0b, jb, rng)

    # identical G params after the step
    ga = jax.tree_util.tree_leaves(sa.g_params)
    gb = jax.tree_util.tree_leaves(sb.g_params)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    # D trained on different fakes -> d_params differ (it DID update)
    da = jax.tree_util.tree_leaves(sa.d_params)
    db = jax.tree_util.tree_leaves(sb.d_params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
               for a, b in zip(da, db))
    for k, v in mb.items():
        assert np.isfinite(float(v)), (k, v)
