"""Tester app smoke tests (models 11/12/13 dir trees + factor toggles)."""
import os

import numpy as np
import jax.numpy as jnp

from dpig_tpu.apps import testers
from dpig_tpu.config import Config
from dpig_tpu.data.synthetic import SyntheticLoader


def small_cfg(tmp_path, **kw):
    d = dict(img_H=32, img_W=16, batch_size=4, conv_hidden_num=16, z_num=16,
             model_dir=str(tmp_path))
    d.update(kw)
    return Config(**d)


def test_full_sampling_tester(tmp_path):
    cfg = small_cfg(tmp_path, sample_app=True, one_app_per_batch=True)
    t = testers.FullSamplingTester(cfg)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=1)
    out = t.run(loader, test_batch_num=2)
    for sub in ("x", "G", "pose"):
        files = os.listdir(os.path.join(out, sub))
        assert len(files) == 2 * cfg.batch_size, (sub, files)


def test_full_sampling_pose_sources(tmp_path):
    cfg = small_cfg(tmp_path, sample_app=True)
    t = testers.FullSamplingTester(cfg)
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    import jax
    for src in ("real", "reconstructed", "sampled"):
        g, pose, score, g_rcv = t.sample_step(t.params, jb,
                                              jax.random.PRNGKey(0), src)
        assert g.shape == (cfg.batch_size, cfg.img_H, cfg.img_W, 3)
        assert np.isfinite(np.asarray(score)).all()


def test_sample_pose_cli_wiring(tmp_path):
    """--sample_pose=true on model 11 must switch the tester into the
    reference's decode-real-pose-embedding mode (tester.py:93-95):
    pose_source='reconstructed', reflected in the output tree name."""
    import main as cli
    cfg = small_cfg(tmp_path, model=11, synthetic_data=True,
                    test_batch_num=1, sample_pose=True, sample_app=True)
    cli.test_model(cfg)
    trees = os.listdir(tmp_path)
    assert any("Pose-reconstructed" in t for t in trees), trees

    cfg2 = small_cfg(tmp_path, model=11, synthetic_data=True,
                     test_batch_num=1, sample_pose=False, sample_app=True)
    cli.test_model(cfg2)
    trees = os.listdir(tmp_path)
    assert any("Pose-real" in t for t in trees), trees

    # --pose_source overrides, exposing the paper's intended sampler
    cfg3 = small_cfg(tmp_path, model=11, synthetic_data=True,
                     test_batch_num=1, pose_source="sampled")
    cli.test_model(cfg3)
    trees = os.listdir(tmp_path)
    assert any("Pose-sampled" in t for t in trees), trees


def test_int8_calibration_covers_sampled_embeddings(tmp_path):
    """With sample_app=True the int8 calibration must include a
    mapper-sampled embedding batch (sampled embs can exceed the
    encoder-derived absmax and would be clipped otherwise)."""
    import jax
    cfg = small_cfg(tmp_path, sample_app=True, inference_dtype="int8")
    t = testers.FullSamplingTester(cfg)
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W,
                                 seed=11))
    sampled = t._sampled_calib_embs(t.params, cfg.batch_size,
                                    jax.random.PRNGKey(0))
    assert sampled is not None
    assert sampled.shape == (cfg.batch_size,
                             cfg.roi_part_num * cfg.roi_z_num
                             + cfg.roi_z_num * 4)
    # without sampling flags there is nothing extra to calibrate on
    cfg2 = small_cfg(tmp_path, inference_dtype="int8")
    t2 = testers.FullSamplingTester(cfg2)
    assert t2._sampled_calib_embs(t2.params, cfg.batch_size,
                                  jax.random.PRNGKey(0)) is None


def test_factor_sampling_fixed_factors_are_tiled(tmp_path):
    # with nothing sampled, all outputs in a batch share factor embeddings
    cfg = small_cfg(tmp_path, sample_fg=False, sample_bg=False,
                    sample_pose=False)
    t = testers.FactorSamplingTester(cfg)
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=2))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    import jax
    g, pose, score = t.sample_step(t.params, jb, jax.random.PRNGKey(0))
    g = np.asarray(g)
    # identical embeddings + identical pose -> identical images
    np.testing.assert_allclose(g[0], g[1], atol=1e-3)

    cfg2 = small_cfg(tmp_path, sample_fg=True, sample_bg=True,
                     sample_pose=False)
    t2 = testers.FactorSamplingTester(cfg2)
    t2.params = t.params
    g2, _, _ = t2.sample_step(t2.params, jb, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(g2)[0], np.asarray(g2)[1], atol=1e-3)


def test_conditional_transfer_tester(tmp_path):
    cfg = small_cfg(tmp_path)
    t = testers.ConditionalTransferTester(cfg)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=3)
    out = t.run(loader, test_batch_num=2)
    for sub in ("x", "x_target", "G", "pose", "pose_target", "mask",
                "mask_target"):
        files = os.listdir(os.path.join(out, sub))
        assert len(files) == 2 * cfg.batch_size, (sub, files)


def test_interpolation_tester(tmp_path):
    cfg = small_cfg(tmp_path, interpolate_fg=True, interpolate_pose=True)
    t = testers.InterpolationTester(cfg)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=4)
    out = t.run(loader, n_steps=4)
    assert os.path.exists(os.path.join(out, "interpolation.png"))


def test_demo_one_by_one(tmp_path, rng):
    import pickle
    from PIL import Image
    from dpig_tpu.apps.demo import run_one_by_one
    h, w = 32, 16
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    names = ["a.jpg", "b.jpg"]
    all_peaks, subsets = {}, {}
    for n in names:
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / n)
        pk = [[(float(rng.integers(2, w - 2)), float(rng.integers(2, h - 2)),
                0.9, k)] for k in range(18)]
        all_peaks[n] = pk
        s = np.zeros((1, 20)); s[0, :18] = np.arange(18); s[0, -2] = 1.0
        subsets[n] = s
    pairs = [("a.jpg", "b.jpg")]
    for obj, fn in ((pairs, "pairs.p"), (all_peaks, "peaks.p"),
                    (subsets, "subsets.p")):
        with open(tmp_path / fn, "wb") as f:
            pickle.dump(obj, f)
    cfg = small_cfg(tmp_path, batch_size=1)
    out = run_one_by_one(cfg, str(img_dir), str(tmp_path / "pairs.p"),
                         str(tmp_path / "peaks.p"),
                         str(tmp_path / "subsets.p"), pair_num=1,
                         shuffle=False)
    assert len(os.listdir(os.path.join(out, "G"))) == 1


def test_factor_sampling_256_single_mapper(tmp_path):
    import jax
    import jax.numpy as jnp
    # square 64 keeps CPU cost low but is_256 requires >=256: use a tiny
    # hidden size at 256 and batch 2, single step
    cfg = small_cfg(tmp_path, img_H=256, img_W=256, batch_size=2,
                    conv_hidden_num=4, z_num=4, sample_fg=True,
                    sample_pose=False)
    t = testers.FactorSamplingTester(cfg)
    assert "Gaussian_FC" in t.REQUIRED
    batch = next(SyntheticLoader(2, 256, 256, seed=8))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    g, pose, score = t.sample_step(t.params, jb, jax.random.PRNGKey(0))
    assert g.shape == (2, 256, 256, 3)


def test_inversion_tool(tmp_path):
    import jax
    import jax.numpy as jnp
    from dpig_tpu.apps.inversion import InversionTool
    cfg = small_cfg(tmp_path)
    tool = InversionTool(cfg)
    batch = next(SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=9))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    # loss after optimization should be far below the initial random loss
    zf0, zb0, loss0 = tool.invert(jb, jax.random.PRNGKey(0), steps=1)
    zf, zb, loss = tool.invert(jb, jax.random.PRNGKey(0), steps=200)
    assert zf.shape == (cfg.batch_size, 7 * 32)
    assert float(loss) < float(loss0) * 0.5, (float(loss0), float(loss))


def test_transfer_tester_int8(tmp_path):
    """--inference_dtype=int8 runs the PTQ encoder+generator in the tester
    and stays close to the bf16 output on the same weights."""
    cfg = small_cfg(tmp_path)
    t = testers.ConditionalTransferTester(cfg)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=5)
    batch = next(loader)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    g_bf, _, _ = t.transfer_step(t.params, jb)

    cfg8 = small_cfg(tmp_path, inference_dtype="int8")
    t8 = testers.ConditionalTransferTester(cfg8)
    t8.params = t.params
    params8 = t8._inference_params(batch)
    assert "_quant_gen" in params8 and "_quant_enc" in params8
    g_q, _, _ = t8.transfer_step(params8, jb)
    a, b = np.asarray(g_bf), np.asarray(g_q)
    assert np.isfinite(b).all()
    # images are in [0,255]; PTQ on random weights stays within a few LSBs
    assert np.abs(a - b).mean() < 8.0, np.abs(a - b).mean()


def test_full_sampling_tester_int8(tmp_path):
    cfg = small_cfg(tmp_path, sample_app=True, inference_dtype="int8")
    t = testers.FullSamplingTester(cfg)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=6)
    out = t.run(loader, test_batch_num=2)
    files = os.listdir(os.path.join(out, "G"))
    assert len(files) == 2 * cfg.batch_size


def test_factor_sampling_tester_int8_256(tmp_path):
    """DF 256 family (models 1001/1002 dispatch to FactorSamplingTester's
    single-Gaussian_FC branch): int8 generator; the encoder stays bf16
    (QuantizedEncoder mirrors the FgBg Market encoder only)."""
    cfg = Config(img_H=256, img_W=256, batch_size=2, conv_hidden_num=4,
                 z_num=8, model_dir=str(tmp_path), sample_app=True,
                 inference_dtype="int8")
    t = testers.FactorSamplingTester(cfg)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=7)
    batch = next(loader)
    params = t._inference_params(batch)
    assert "_quant_gen" in params and "_quant_enc" not in params
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    import jax
    g, pose, score = t.sample_step(params, jb, jax.random.PRNGKey(0))
    assert g.shape == (2, 256, 256, 3)
    assert np.isfinite(np.asarray(g)).all()


def test_transfer_tester_int8_fallback_layers(tmp_path):
    """--int8_fallback_layers keeps named generator convs in exact bf16
    inside the int8 path (legacy per-layer-quant routing): the quant
    table must omit them, the step must run, and the output must change
    vs plain chained int8 while staying close to bf16."""
    import jax
    cfg = small_cfg(tmp_path)
    t = testers.ConditionalTransferTester(cfg)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=5)
    batch = next(loader)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    g_bf, _, _ = t.transfer_step(t.params, jb)

    tail = f"dec/Conv_{3 * cfg.repeat_num - 2},to_rgb"
    cfg_fb = small_cfg(tmp_path, inference_dtype="int8",
                       int8_fallback_layers=tail)
    t_fb = testers.ConditionalTransferTester(cfg_fb)
    t_fb.params = t.params
    params_fb = t_fb._inference_params(batch)
    for name in tail.split(","):
        assert name not in params_fb["_quant_gen"]["weights"], name
    g_fb, _, _ = t_fb.transfer_step(params_fb, jb)

    cfg8 = small_cfg(tmp_path, inference_dtype="int8")
    t8 = testers.ConditionalTransferTester(cfg8)
    t8.params = t.params
    g_q, _, _ = t8.transfer_step(t8._inference_params(batch), jb)

    a, fb, q = (np.asarray(x) for x in (g_bf, g_fb, g_q))
    assert np.isfinite(fb).all()
    assert np.abs(fb - q).mean() > 1e-3   # the routing actually changed
    assert np.abs(a - fb).mean() < 8.0, np.abs(a - fb).mean()


def test_int8_calibration_flag_variants(tmp_path):
    """--int8_calibration selects the calibration scheme: 'channel' folds
    per-channel scales (vector act_scales + act_folded marker),
    'percentile:P' clips, bad specs fail loudly."""
    loader = SyntheticLoader(4, 32, 16, seed=9)
    batch = next(loader)

    cfg_c = small_cfg(tmp_path, inference_dtype="int8",
                      int8_calibration="channel")
    t_c = testers.ConditionalTransferTester(cfg_c)
    params_c = t_c._inference_params(batch)
    q = params_c["_quant_gen"]
    assert "act_folded" in q
    some = next(iter(q["weights"]))
    assert q["act_scales"][some].ndim == 1
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    g, _, _ = t_c.transfer_step(params_c, jb)
    assert np.isfinite(np.asarray(g)).all()

    cfg_p = small_cfg(tmp_path, inference_dtype="int8",
                      int8_calibration="percentile:99.9")
    t_p = testers.ConditionalTransferTester(cfg_p)
    t_p.params = t_c.params
    params_p = t_p._inference_params(batch)
    assert params_p["_quant_gen"]["act_scales"][some].ndim == 0

    import pytest
    cfg_bad = small_cfg(tmp_path, inference_dtype="int8",
                        int8_calibration="bogus")
    with pytest.raises(ValueError, match="int8_calibration"):
        testers.ConditionalTransferTester(cfg_bad)._inference_params(batch)
