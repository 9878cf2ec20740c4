"""int8 generator path: float re-implementation == module apply; quantized
output within PTQ tolerance; conv/upscale reorder exactness."""
import numpy as np
import jax
import jax.numpy as jnp

from dpig_tpu.models.generator import UAEGenerator
from dpig_tpu.models import quant

B, H, W = 2, 32, 16
REPEAT, HID, Z = 3, 8, 16


def _setup(rng):
    gen = UAEGenerator(out_channels=3, z_num=Z, repeat_num=REPEAT,
                       hidden_num=HID)
    embs = jnp.asarray(rng.standard_normal((B, 52)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((B, H, W, 18)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), None, pose,
                      embs_const=embs)["params"]
    return gen, params, embs, pose


def test_float_forward_matches_module(rng):
    gen, params, embs, pose = _setup(rng)
    out_mod, z_mod = gen.apply({"params": params}, None, pose,
                               embs_const=embs)
    out_fn, z_fn = quant.uae_forward(params, embs, pose, REPEAT, HID)
    np.testing.assert_allclose(np.asarray(out_mod), np.asarray(out_fn),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_mod), np.asarray(z_fn),
                               rtol=1e-5, atol=1e-5)


def test_quantized_forward_close_to_float(rng):
    gen, params, embs, pose = _setup(rng)
    q = quant.QuantizedGenerator(params, REPEAT, HID)
    q.calibrate([embs], [pose])
    out_f, _ = quant.uae_forward(params, embs, pose, REPEAT, HID)
    out_q, _ = q(embs, pose)
    out_f = np.asarray(out_f)
    out_q = np.asarray(out_q)
    # PTQ on a random (untrained) net: expect small relative error
    rel = np.abs(out_q - out_f).mean() / (np.abs(out_f).mean() + 1e-9)
    assert rel < 0.15, rel
    # and strong correlation
    cc = np.corrcoef(out_f.ravel(), out_q.ravel())[0, 1]
    assert cc > 0.99, cc


def test_layer_name_enumeration():
    enc = quant.enc_layer_names(3)
    assert [n for _, n in enc] == [f"Conv_{i}" for i in range(8)]
    assert [k for k, _ in enc] == ["res", "res", "down", "res", "res",
                                   "down", "res", "res"]
    dec = quant.dec_layer_names(3)
    assert [k for k, _ in dec] == ["res", "res", "up1x1", "res", "res",
                                   "up1x1", "res", "res"]


def test_conv_upscale_commute(rng):
    """1x1 conv then NN-upscale == NN-upscale then 1x1 conv (exact)."""
    from dpig_tpu.ops.image import upscale_nn
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 6)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 6, 5)).astype(np.float32))
    a = quant._conv(upscale_nn(x, 2), k)
    b = upscale_nn(quant._conv(x, k), 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_encoder_forward_matches_module_and_int8_close():
    """roi_fgbg_forward float path == RoiEncoderFgBg.apply; int8 error in
    the same class as the generator's."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dpig_tpu.models import quant as q
    from dpig_tpu.models.encoders import RoiEncoderFgBg

    repeat, hidden, z, parts, roi = 3, 16, 8, 7, 12
    enc = RoiEncoderFgBg(part_num=parts, z_num=z, repeat_num=repeat,
                         hidden_num=hidden, roi_size=roi)
    rng = np.random.default_rng(0)
    b, h, w = 2, 32, 16
    x = jnp.asarray(rng.normal(0, 0.5, (b, h, w, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (b, h, w, 1)), jnp.float32)
    bbox = jnp.asarray(
        np.stack([[0, 0, 16, 8]] * parts * b).reshape(b, parts, 4))
    vis = jnp.ones((b, parts))
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), x, mask, bbox,
                               vis)["params"]

    want = enc.apply({"params": params}, x, mask, bbox, vis)
    got = q.roi_fgbg_forward(params, x, mask, bbox, vis, repeat, hidden,
                             part_num=parts, roi_size=roi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    qe = q.QuantizedEncoder(params, repeat, hidden, roi_size=roi,
                            part_num=parts)
    qe.calibrate([(x, mask, bbox, vis)])
    got8 = qe(x, mask, bbox, vis)
    err = np.abs(np.asarray(got8) - np.asarray(want)).mean()
    ref = np.abs(np.asarray(want)).mean() + 1e-9
    assert err / ref < 0.08, (err, ref)

    # selective bf16 fallback: an all-layers fallback must approach the
    # bf16 floor (encoder carries bf16 between layers already)
    all_names = (["stem/Conv_1", "stem/Conv_2"]
                 + [f"fg/{n}" for _, n in q.enc_layer_names(repeat)]
                 + [f"bg/{n}" for _, n in q.enc_layer_names(repeat)])
    qfb = q.QuantizedEncoder(params, repeat, hidden, roi_size=roi,
                             part_num=parts,
                             bf16_layers=frozenset(all_names))
    qfb.calibrate([(x, mask, bbox, vis)])
    assert not qfb.quant["weights"]
    err_fb = np.abs(np.asarray(qfb(x, mask, bbox, vis))
                    - np.asarray(want)).mean()
    assert err_fb < err * 0.6, (err_fb, err)
    import pytest
    with pytest.raises(ValueError, match="unknown bf16_layers"):
        q.QuantizedEncoder(params, repeat, hidden, roi_size=roi,
                           part_num=parts,
                           bf16_layers=frozenset(["fg/Conv_99"])
                           ).calibrate([(x, mask, bbox, vis)])


def test_chained_int8_matches_legacy_quant_path():
    """The s8-chained forward must track the legacy per-layer quant path
    closely — the ONLY numeric difference is that residual/skip/concat
    reads see the once-quantized s8 tensors instead of their bf16
    parents (PARITY.md deviation)."""
    import jax
    import jax.numpy as jnp
    from dpig_tpu.models import quant as quant_mod
    from dpig_tpu.models.generator import UAEGenerator
    from flax import linen as nn

    rng = jax.random.PRNGKey(3)
    H, W, hid, rep, z = 32, 16, 16, 3, 16
    gen = UAEGenerator(out_channels=3, z_num=z, repeat_num=rep,
                       hidden_num=hid, activation=nn.relu,
                       dtype=jnp.float32)
    embs = jax.random.normal(rng, (4, 24)) * 0.3
    pose = jax.random.uniform(jax.random.PRNGKey(4), (4, H, W, 18))
    params = jax.jit(gen.init)(rng, None, pose, embs_const=embs)["params"]

    q = quant_mod.QuantizedGenerator(params, rep, hid)
    q.calibrate([embs], [pose])
    out_chained, _ = quant_mod.uae_forward(params, embs, pose, rep, hid,
                                           quant=q.quant)
    out_legacy, _ = quant_mod.uae_forward(params, embs, pose, rep, hid,
                                          quant=q.quant, chained=False)
    a, b = np.asarray(out_chained), np.asarray(out_legacy)
    denom = np.abs(b).mean() + 1e-9
    assert np.abs(a - b).mean() / denom < 0.08, np.abs(a - b).mean() / denom
    # and both track the float forward
    out_f, _ = quant_mod.uae_forward(params, embs, pose, rep, hid)
    corr = np.corrcoef(a.ravel(), np.asarray(out_f).ravel())[0, 1]
    assert corr > 0.99, corr


def test_chained_int8_sharded_over_mesh():
    """int8 generation data-parallel over the 8-device CPU mesh: shard the
    batch, replicate params + quant tables, match the single-device out."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dpig_tpu.models import quant as quant_mod
    from dpig_tpu.models.generator import UAEGenerator
    from dpig_tpu.parallel.mesh import make_mesh

    H, W, hid, rep, z = 32, 16, 16, 3, 16
    gen = UAEGenerator(out_channels=3, z_num=z, repeat_num=rep,
                       hidden_num=hid, activation=nn.relu,
                       dtype=jnp.float32)
    rng = jax.random.PRNGKey(5)
    embs = jax.random.normal(rng, (8, 24)) * 0.3
    pose = jax.random.uniform(jax.random.PRNGKey(6), (8, H, W, 18))
    params = jax.jit(gen.init)(rng, None, pose, embs_const=embs)["params"]
    q = quant_mod.QuantizedGenerator(params, rep, hid)
    q.calibrate([embs], [pose])

    fwd = jax.jit(lambda p, qt, e, m: quant_mod.uae_forward(
        p, e, m, rep, hid, quant=qt)[0])
    ref = np.asarray(fwd(params, q.quant, embs, pose))

    mesh = make_mesh()
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    embs_s = jax.device_put(embs, shard)
    pose_s = jax.device_put(pose, shard)
    params_r = jax.device_put(params, repl)
    quant_r = jax.device_put(q.quant, repl)
    out = np.asarray(fwd(params_r, quant_r, embs_s, pose_s))
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_bf16_raw_forward_matches_module():
    """uae_forward_bf16 (layout-pinned raw-param path, the testers' bf16
    default) must match the flax module at dtype=bf16."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from dpig_tpu.models import quant as quant_mod
    from dpig_tpu.models.generator import UAEGenerator

    H, W, hid, rep, z = 32, 16, 16, 3, 16
    gen = UAEGenerator(out_channels=3, z_num=z, repeat_num=rep,
                       hidden_num=hid, activation=nn.relu,
                       dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(11)
    embs = jax.random.normal(rng, (4, 24)) * 0.3
    pose = jax.random.uniform(jax.random.PRNGKey(12), (4, H, W, 18))
    params = jax.jit(gen.init)(rng, None, pose, embs_const=embs)["params"]

    want, want_z = jax.jit(lambda p: gen.apply(
        {"params": p}, None, pose, embs_const=embs))(params)
    got, got_z = jax.jit(lambda p: quant_mod.uae_forward_bf16(
        p, embs, pose, rep, hid))(params)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=0)
    np.testing.assert_allclose(np.asarray(got_z, np.float32),
                               np.asarray(want_z, np.float32), atol=2e-2)


def test_selective_bf16_fallback():
    """bf16_layers quality fallback: a fallback layer runs as an exact
    bf16 conv (no input/weight/output rounding) via the legacy
    per-layer-quant routing — the decoder-tail fallback must cut the
    error vs float materially, and an all-layers fallback must approach
    the bf16-rounding floor. The chained graph must tolerate a pruned
    weight table (weight-rounding-only branch) without quality loss."""
    rng = np.random.default_rng(7)
    gen, params, embs, pose = _setup(rng)
    out_f, _ = quant.uae_forward(params, embs, pose, REPEAT, HID)
    out_f = np.asarray(out_f)

    def err(bf16_layers):
        q = quant.QuantizedGenerator(params, REPEAT, HID,
                                     bf16_layers=frozenset(bf16_layers))
        q.calibrate([embs], [pose])
        for name in bf16_layers:
            assert name not in q.quant["weights"]
        out_q, _ = q(embs, pose)  # legacy routing when fallback is set
        return np.abs(np.asarray(out_q) - out_f).mean(), q.quant

    e_none, quant_none = err([])
    # output-adjacent tail in bf16 -> error must drop materially
    # (measured 0.0063 vs 0.0146 on this fixture)
    tail = [f"dec/Conv_{i}" for i in range(8)] + ["to_rgb"]
    e_tail, quant_tail = err(tail)
    assert e_tail < e_none * 0.65, (e_tail, e_none)
    # every conv in bf16 -> only bf16 rounding remains (measured 0.0038)
    all_layers = ([f"enc/{n}" for _, n in quant.enc_layer_names(REPEAT)]
                  + [f"dec/{n}" for _, n in quant.dec_layer_names(REPEAT)]
                  + ["to_rgb"])
    e_all, _ = err(all_layers)
    assert e_all < e_none * 0.45, (e_all, e_none)

    # the chained graph accepts a pruned table (bf16 weight branch) and
    # stays as close to float as the fully-quantized chained graph
    out_ch, _ = quant.uae_forward(params, embs, pose, REPEAT, HID,
                                  quant=quant_tail, chained=True)
    e_ch = np.abs(np.asarray(out_ch) - out_f).mean()
    out_ch0, _ = quant.uae_forward(params, embs, pose, REPEAT, HID,
                                   quant=quant_none, chained=True)
    e_ch0 = np.abs(np.asarray(out_ch0) - out_f).mean()
    assert e_ch < e_ch0 * 1.1, (e_ch, e_ch0)

    # unknown layer names fail loudly
    import pytest
    with pytest.raises(ValueError, match="unknown bf16_layers"):
        quant.QuantizedGenerator(params, REPEAT, HID,
                                 bf16_layers=frozenset(["dec/Conv_99"])
                                 ).calibrate([embs], [pose])


def test_kl_threshold_scale_clips_outliers():
    """Entropy calibration must pick a threshold near the bulk of the
    distribution when a rare outlier would otherwise waste the int8
    range, and fall back to absmax-like behavior on a uniform hist."""
    bins = quant._HIST_BINS
    j = np.arange(bins)
    # smooth exponential bulk + thin tail over a [0, 10] range (the
    # realistic activation shape): the KL search must clip the tail
    # (threshold well under amax) while covering the bulk
    hist = 1e6 * np.exp(-j / 12.0) + 0.5
    s = quant._kl_threshold_scale(hist, amax=10.0)
    assert s < 4.0 / 127.0, s          # clips the thin tail
    assert s > 1.0 / 127.0, s          # but covers the bulk (~3 decades)
    # uniform histogram: no reason to clip -> threshold ~ amax
    s_u = quant._kl_threshold_scale(np.ones(bins), amax=10.0)
    assert s_u > 9.0 / 127.0, s_u
    # degenerate inputs
    assert quant._kl_threshold_scale(np.zeros(bins), amax=0.0) > 0


def test_entropy_calibration_end_to_end():
    """calib_method='entropy' produces finite scales <= absmax scales and
    a generator output that still tracks float closely."""
    rng = np.random.default_rng(11)
    gen, params, embs, pose = _setup(rng)
    q_abs = quant.QuantizedGenerator(params, REPEAT, HID)
    q_abs.calibrate([embs], [pose])
    q_ent = quant.QuantizedGenerator(params, REPEAT, HID,
                                     calib_method="entropy")
    q_ent.calibrate([embs], [pose])
    for k, s_ent in q_ent.quant["act_scales"].items():
        s_abs = float(q_abs.quant["act_scales"][k])
        assert 0 < float(s_ent) <= s_abs * 1.01, (k, float(s_ent), s_abs)
    out_f, _ = quant.uae_forward(params, embs, pose, REPEAT, HID)
    out_e, _ = q_ent(embs, pose)
    a, b = np.asarray(out_e), np.asarray(out_f)
    cc = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert cc > 0.98, cc
    import pytest
    with pytest.raises(ValueError, match="unknown calib_method"):
        quant.QuantizedGenerator(params, REPEAT, HID,
                                 calib_method="bogus"
                                 ).calibrate([embs], [pose])


def test_per_channel_uniform_fold_is_bitwise_per_tensor():
    """Folding a UNIFORM per-channel scale vector into the weights must
    reproduce the per-tensor chained path bitwise: absmax(k*s) = s*absmax(k)
    so the quantized weights and the dequant factor are identical."""
    rng = np.random.default_rng(13)
    gen, params, embs, pose = _setup(rng)
    qt = quant.QuantizedGenerator(params, REPEAT, HID)
    qt.calibrate([embs], [pose])
    out_t, _ = qt(embs, pose)

    # hand-build the folded variant with uniform vectors
    vec_scales = {}
    for name, (w8, _) in qt.quant["weights"].items():
        ci = w8.shape[2]
        vec_scales[name] = np.full((ci,), float(qt.quant["act_scales"][name]),
                                   np.float32)
    weights = quant.quantize_weights(params, REPEAT,
                                     fold_act_scales=vec_scales,
                                     emb_dim=embs.shape[-1])
    qc = {"weights": weights,
          "act_scales": {k: jnp.asarray(v) for k, v in vec_scales.items()},
          "act_folded": jnp.int8(1)}
    out_c, _ = quant.uae_forward(params, embs, pose, REPEAT, HID, quant=qc)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_c),
                               rtol=1e-5, atol=1e-5)


def test_per_channel_calibration_end_to_end():
    """calib_granularity='channel' stays at least as accurate as
    per-tensor on both the chained and legacy paths, with vector scales
    of the right length per layer."""
    rng = np.random.default_rng(17)
    gen, params, embs, pose = _setup(rng)
    out_f = np.asarray(quant.uae_forward(params, embs, pose, REPEAT, HID)[0])

    qt = quant.QuantizedGenerator(params, REPEAT, HID)
    qt.calibrate([embs], [pose])
    e_t = np.abs(np.asarray(qt(embs, pose)[0]) - out_f).mean()

    qc = quant.QuantizedGenerator(params, REPEAT, HID,
                                  calib_granularity="channel")
    qc.calibrate([embs], [pose])
    assert "act_folded" in qc.quant
    for name, (w8, _) in qc.quant["weights"].items():
        assert qc.quant["act_scales"][name].shape == (w8.shape[2],), name
    e_c = np.abs(np.asarray(qc(embs, pose)[0]) - out_f).mean()
    assert e_c < e_t * 1.05, (e_c, e_t)

    out_leg, _ = quant.uae_forward(params, embs, pose, REPEAT, HID,
                                   quant=qc.quant, chained=False)
    e_leg = np.abs(np.asarray(out_leg) - out_f).mean()
    assert e_leg < e_t * 1.05, (e_leg, e_t)

    import pytest
    with pytest.raises(ValueError, match="granularity"):
        quant.QuantizedGenerator(params, REPEAT, HID,
                                 calib_granularity="channel",
                                 calib_method="entropy"
                                 ).calibrate([embs], [pose])
    with pytest.raises(ValueError, match="calib_granularity"):
        quant.QuantizedGenerator(params, REPEAT, HID,
                                 calib_granularity="bogus"
                                 ).calibrate([embs], [pose])


def test_shared_skip_downsample_store_matches_dual():
    """Channel calibration pins each downsample conv's input scale to its
    skip's decoder tail scale (quant.calibrate), so the chained graph can
    emit ONE s8 buffer for both consumers. The single-store path (gated
    on 'act_pinned') quantizes conv_b's f32 output directly, where the
    dual-store path rounds through bf16 first — so outputs agree to one
    bf16 rounding (s8 codes move by at most 1), and the shared path's
    error vs float must not regress."""
    rng = np.random.default_rng(23)
    gen, params, embs, pose = _setup(rng)
    out_f = np.asarray(quant.uae_forward(params, embs, pose, REPEAT, HID)[0])
    qc = quant.QuantizedGenerator(params, REPEAT, HID,
                                  calib_granularity="channel")
    qc.calibrate([embs], [pose])
    assert "act_pinned" in qc.quant
    out_shared = np.asarray(qc(embs, pose)[0])

    dual = {k: v for k, v in qc.quant.items() if k != "act_pinned"}
    out_dual = np.asarray(quant.uae_forward(params, embs, pose, REPEAT, HID,
                                            quant=dual)[0])
    np.testing.assert_allclose(out_shared, out_dual, atol=0.08)
    e_shared = np.abs(out_shared - out_f).mean()
    e_dual = np.abs(out_dual - out_f).mean()
    assert e_shared <= e_dual * 1.05, (e_shared, e_dual)

    # the pin itself is a numeric no-op: both vectors measure the same
    # float tensor's per-channel absmax (RAW stats, before calibrate()
    # pins them — pinning must not change any scale)
    import functools
    import jax
    enc_n = [n for _, n in quant.enc_layer_names(REPEAT)]
    dec_n = [n for _, n in quant.dec_layer_names(REPEAT)]
    _, _, stats = jax.jit(functools.partial(
        quant.uae_forward, repeat_num=REPEAT, hidden_num=HID,
        collect_stats=True, calib_channel=True))(params, embs, pose)
    ni = 2
    for idx in range(REPEAT - 1):
        nd, ni = f"enc/{enc_n[ni]}", ni + 3
        dec_c = f"dec/{dec_n[3 * (REPEAT - 1 - idx)]}"
        c = np.asarray(stats[nd]).shape[-1]
        np.testing.assert_allclose(np.asarray(stats[nd]),
                                   np.asarray(stats[dec_c])[-c:], rtol=1e-6)


def test_encoder_per_channel_calibration():
    """QuantizedEncoder granularity='channel': vector scales folded into
    the weights; accuracy at least on par with per-tensor."""
    from dpig_tpu.models.encoders import RoiEncoderFgBg
    repeat, hidden, z, parts, roi = 3, 16, 8, 7, 12
    enc = RoiEncoderFgBg(part_num=parts, z_num=z, repeat_num=repeat,
                         hidden_num=hidden, roi_size=roi)
    rng = np.random.default_rng(23)
    b, h, w = 2, 32, 16
    x = jnp.asarray(rng.normal(0, 0.5, (b, h, w, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (b, h, w, 1)), jnp.float32)
    bbox = jnp.asarray(
        np.stack([[0, 0, 16, 8]] * parts * b).reshape(b, parts, 4))
    vis = jnp.ones((b, parts))
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), x, mask, bbox,
                               vis)["params"]
    want = np.asarray(enc.apply({"params": params}, x, mask, bbox, vis))

    def err(granularity):
        qe = quant.QuantizedEncoder(params, repeat, hidden, roi_size=roi,
                                    part_num=parts,
                                    calib_granularity=granularity)
        qe.calibrate([(x, mask, bbox, vis)])
        if granularity == "channel":
            assert "act_folded" in qe.quant
            for name, (w8, _) in qe.quant["weights"].items():
                assert qe.quant["act_scales"][name].shape == (w8.shape[2],)
        return np.abs(np.asarray(qe(x, mask, bbox, vis)) - want).mean()

    e_t, e_c = err("tensor"), err("channel")
    assert e_c < e_t * 1.05, (e_c, e_t)


def test_island_fallback_matches_legacy_quality():
    """fallback_mode='island' (VERDICT r3 weak #3): exact-bf16 islands
    inside the s8-chained graph. A consecutive tail island
    (dec tail + to_rgb) skips input/weight/output rounding like the
    legacy routing, so its error vs float must drop materially below the
    plain chained error and land near the legacy fallback's — while
    staying a chained graph (no legacy routing)."""
    rng = np.random.default_rng(11)
    gen, params, embs, pose = _setup(rng)
    out_f, _ = quant.uae_forward(params, embs, pose, REPEAT, HID)
    out_f = np.asarray(out_f)
    tail = [f"dec/Conv_{i}" for i in range(4, 8)] + ["to_rgb"]

    def err(**kw):
        q = quant.QuantizedGenerator(params, REPEAT, HID, **kw)
        q.calibrate([embs], [pose])
        out_q, _ = q(embs, pose)
        return np.abs(np.asarray(out_q) - out_f).mean()

    # pin the stem bf16 in every variant: this test isolates the TAIL
    # routing difference, and the legacy route structurally never runs
    # the int8 stem (chained-only), so an int8 stem on the island side
    # would add an error source legacy cannot have. _setup's pose is
    # random-normal — on real {-1,+1} pose maps the stem quantization is
    # lossless (test_int8_stem_lossless_on_real_pose_maps).
    stem_bf = ["g_stem"]
    e_chained = err(bf16_layers=frozenset(stem_bf), fallback_mode="island")
    e_legacy = err(bf16_layers=frozenset(tail), fallback_mode="legacy")
    e_island = err(bf16_layers=frozenset(tail + stem_bf),
                   fallback_mode="island")
    # island must recover most of the legacy fallback's quality gain
    assert e_island < e_chained * 0.75, (e_island, e_chained)
    assert e_island < e_legacy * 1.35, (e_island, e_legacy)

    # encoder-side island (tests bf16 skips + downsample pass-through)
    enc_island = ["enc/Conv_0", "enc/Conv_1", "enc/Conv_2"] + stem_bf
    e_enc = err(bf16_layers=frozenset(enc_island), fallback_mode="island")
    assert np.isfinite(e_enc) and e_enc < e_chained * 1.2, (e_enc, e_chained)

    # island mode with per-channel folded calibration still runs
    e_ch = err(bf16_layers=frozenset(tail + stem_bf),
               fallback_mode="island", calib_granularity="channel")
    assert e_ch < e_chained * 0.9, (e_ch, e_chained)


def test_int8_stem_lossless_on_real_pose_maps():
    """Rendered pose maps are exactly {-1,+1} (render_pose_maps), so the
    stem's input quantization at the calibrated absmax scale (=1/127) is
    LOSSLESS: the chained graph with the int8 stem must sit at the same
    error-vs-float level as the same graph with the stem forced bf16
    (island fallback) — only weight rounding differs."""
    from dpig_tpu.ops.pose import render_pose_maps

    rng = np.random.default_rng(23)
    gen, params, embs, _ = _setup(rng)
    rcv = np.zeros((B, 18, 3), np.float32)
    rcv[..., 0] = rng.uniform(0, H, (B, 18))
    rcv[..., 1] = rng.uniform(0, W, (B, 18))
    rcv[..., 2] = 1.0
    pose = render_pose_maps(jnp.asarray(rcv.reshape(B, -1)), H, W,
                            18, radius=2, normalized=False)
    assert set(np.unique(np.asarray(pose))) <= {-1.0, 1.0}

    q = quant.QuantizedGenerator(params, REPEAT, HID)
    q.calibrate([embs], [pose])
    assert "g_stem" in q.quant["weights"]
    w8, w_scale = q.quant["weights"]["g_stem"]
    assert w8.shape == (3, 3, 18, HID)
    # the calibrated pose scale quantizes {-1,+1} exactly
    s = np.asarray(q.quant["act_scales"]["g_stem"])
    np.testing.assert_allclose(np.round(np.asarray(pose) / s) * s,
                               np.asarray(pose), rtol=0, atol=1e-6)

    out_f = np.asarray(quant.uae_forward(params, embs, pose, REPEAT, HID)[0])
    e_stem8 = np.abs(np.asarray(q(embs, pose)[0]) - out_f).mean()
    q_bf = quant.QuantizedGenerator(params, REPEAT, HID,
                                    bf16_layers=frozenset(["g_stem"]),
                                    fallback_mode="island")
    q_bf.calibrate([embs], [pose])
    e_stembf = np.abs(np.asarray(q_bf(embs, pose)[0]) - out_f).mean()
    # int8 stem adds only weight rounding: stay within 10% of the
    # bf16-stem chained error
    assert e_stem8 < e_stembf * 1.10 + 1e-6, (e_stem8, e_stembf)
