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
