"""Round-trip the TF1 import shim against a REAL tf.compat.v1 checkpoint.

The fixture graphs mirror the reference builders' variable creation
sequence (models.py:474-576, wgan_gp.py:407-440) using
tf.compat.v1.variable_scope(None, default_name=...) — the same
auto-numbering mechanism slim's layers use — and are saved with a real
tf.train.Saver. The test then imports the checkpoint through
train/tf1_import.py and asserts the flax modules reproduce the TF
session's forward outputs. This validates the order tables against what
TF1 actually writes, not against hand-built dicts (test_tf1_import.py
keeps covering the table structure itself).
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
tf1 = tf.compat.v1

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dpig_tpu.train.tf1_import import import_checkpoint  # noqa: E402

RNG = np.random.default_rng(0)


def _winit(shape):
    return tf1.constant_initializer(
        RNG.normal(0, 0.3, shape).astype(np.float32))


def _slim_conv2d(x, n_out, k, stride, act, default_name="Conv"):
    """tf.contrib.slim.conv2d twin: SAME padding, NHWC, auto-numbered
    scope, vars 'weights'/'biases' (convert via variable_scope default_name
    — slim's own uniquifier)."""
    in_ch = int(x.shape[-1])
    with tf1.variable_scope(None, default_name=default_name):
        w = tf1.get_variable("weights", [k, k, in_ch, n_out],
                             initializer=_winit([k, k, in_ch, n_out]))
        b = tf1.get_variable("biases", [n_out],
                             initializer=_winit([n_out]))
        y = tf.nn.conv2d(x, w, strides=[1, stride, stride, 1],
                         padding="SAME") + b
        return act(y) if act is not None else y


def _slim_fc(x, n_out, act, default_name="fully_connected"):
    in_ch = int(x.shape[-1])
    with tf1.variable_scope(None, default_name=default_name):
        w = tf1.get_variable("weights", [in_ch, n_out],
                             initializer=_winit([in_ch, n_out]))
        b = tf1.get_variable("biases", [n_out],
                             initializer=_winit([n_out]))
        y = tf.matmul(x, w) + b
        return act(y) if act is not None else y


def _leaky(x):
    return tf.nn.leaky_relu(x, alpha=0.3)


def _uae_graph(x, pose, repeat_num, hidden_num, z_num, out_ch):
    """models.py:518-576 GeneratorCNN_ID_UAEAfterResidual, NHWC, relu."""
    act = tf.nn.relu
    with tf1.variable_scope("G"):
        x = tf.concat([x, pose], 3)
        skips = []
        x = _slim_conv2d(x, hidden_num, 3, 1, act)
        for idx in range(repeat_num):
            ch = hidden_num * (idx + 1)
            res = x
            x = _slim_conv2d(x, ch, 3, 1, act)
            x = _slim_conv2d(x, ch, 3, 1, act)
            x = x + res
            skips.append(x)
            if idx < repeat_num - 1:
                x = _slim_conv2d(x, hidden_num * (idx + 2), 3, 2, act)
        shp = x.get_shape().as_list()
        x = tf.reshape(x, [shp[0], np.prod(shp[1:])])
        z = x = _slim_fc(x, z_num, None)
        x = _slim_fc(z, shp[1] * shp[2] * hidden_num, None)
        x = tf.reshape(x, [-1, shp[1], shp[2], hidden_num])
        for idx in range(repeat_num):
            x = tf.concat([x, skips[repeat_num - 1 - idx]], axis=-1)
            res = x
            ch = int(x.get_shape()[-1])
            x = _slim_conv2d(x, ch, 3, 1, act)
            x = _slim_conv2d(x, ch, 3, 1, act)
            x = x + res
            if idx < repeat_num - 1:
                sh = tf.shape(x)
                x = tf1.image.resize_nearest_neighbor(
                    x, [2 * sh[1], 2 * sh[2]])
                x = _slim_conv2d(x, hidden_num * (repeat_num - idx - 1),
                                 1, 1, act)
        out = _slim_conv2d(x, out_ch, 3, 1, None)
    return out, z


def _fcres_graph(z, out_dim, repeat_num, hidden_num, scope,
                 first_act=_leaky):
    """models.py:474-486 GaussianFCRes / :488-500 PoseEncoderFCRes body."""
    with tf1.variable_scope(scope):
        x = _slim_fc(z, hidden_num, first_act)
        for _ in range(repeat_num):
            res = x
            x = _slim_fc(x, hidden_num, _leaky)
            x = _slim_fc(x, hidden_num, _leaky)
            x = res + x
        return _slim_fc(x, out_dim, None)


def _pose_decoder_graph(z, keypoint_num, repeat_num, hidden_num):
    """models.py:502-515 PoseDecoderFCRes (no first activation)."""
    with tf1.variable_scope("G_Pose_Decoder"):
        x = _slim_fc(z, hidden_num, None)
        for _ in range(repeat_num):
            res = x
            x = _slim_fc(x, hidden_num, _leaky)
            x = _slim_fc(x, hidden_num, _leaky)
            x = res + x
        coords = _slim_fc(x, keypoint_num * 2, None)
        vis = _slim_fc(x, keypoint_num, tf.sigmoid)
        return coords, tf.round(vis)


def _tflib_dcgan_d(x_nhwc, dim, img_h, img_w, n_stages=4):
    """wgan_gp.py:407-440 DCGANDiscriminator with tflib flat names.

    Built NHWC (CPU has no NCHW conv kernels) but the final flatten
    reproduces the reference's NCHW reshape order via a transpose."""
    def var(name, shape):
        return tf1.get_variable(name, shape, initializer=_winit(shape))

    out = x_nhwc
    ch = dim
    in_ch = int(x_nhwc.shape[-1])
    for i in range(n_stages):
        w = var(f"Discriminator.{i + 1}.Filters", [5, 5, in_ch, ch])
        b = var(f"Discriminator.{i + 1}.Biases", [ch])
        out = tf.nn.conv2d(out, w, strides=[1, 2, 2, 1],
                           padding="SAME") + b
        if i > 0:
            scale = var(f"Discriminator.BN{i + 1}.scale", [ch])
            offset = var(f"Discriminator.BN{i + 1}.offset", [ch])
            # moving stats exist in checkpoints; forward here is training
            # mode (batch stats), matching flax train=True
            tf1.get_variable(f"Discriminator.BN{i + 1}.moving_mean", [ch],
                             initializer=tf1.zeros_initializer())
            tf1.get_variable(f"Discriminator.BN{i + 1}.moving_variance",
                             [ch], initializer=tf1.ones_initializer())
            mean, variance = tf.nn.moments(out, [0, 1, 2])
            out = tf.nn.batch_normalization(out, mean, variance, offset,
                                            scale, 1e-5)
        out = tf.nn.leaky_relu(out, 0.3)
        if i < n_stages - 1:
            in_ch, ch = ch, min(ch * 2, dim * 8)
    h_f, w_f = img_h // 2 ** n_stages, img_w // 2 ** n_stages
    c_f = int(out.shape[-1])
    out_nchw = tf.transpose(out, [0, 3, 1, 2])
    flat = tf.reshape(out_nchw, [-1, c_f * h_f * w_f])
    w = var("Discriminator.Output.W", [c_f * h_f * w_f, 1])
    b = var("Discriminator.Output.b", [1])
    return tf.reshape(tf.matmul(flat, w) + b, [-1])


@pytest.fixture(scope="module")
def real_ckpt(tmp_path_factory):
    """Build all fixture graphs, run them, save ONE real TF1 checkpoint."""
    B, H, W = 2, 16, 8
    D_EMB, P_CH, Z, REPEAT, HIDDEN = 6, 4, 4, 3, 8
    K = 3
    rng = np.random.default_rng(1)
    inputs = {
        "embs": rng.normal(0, 1, (B, D_EMB)).astype(np.float32),
        "pose": rng.normal(0, 1, (B, H, W, P_CH)).astype(np.float32),
        "z_map": rng.normal(0, 0.2, (B, 5)).astype(np.float32),
        "rcv": rng.normal(0, 0.5, (B, K * 3)).astype(np.float32),
        "pz": rng.normal(0, 0.2, (B, Z)).astype(np.float32),
        "img": rng.normal(0, 0.5, (B, 32, 16, 3)).astype(np.float32),
    }
    graph = tf1.Graph()
    with graph.as_default():
        emb_map = tf.tile(tf.constant(inputs["embs"])[:, None, None, :],
                          [1, H, W, 1])
        with tf1.variable_scope("ID_AE"):
            g_out, g_z = _uae_graph(emb_map, tf.constant(inputs["pose"]),
                                    REPEAT, HIDDEN, Z, 3)
        with tf1.variable_scope("Gaussian_FC_Fg"):
            m_out = _fcres_graph(tf.constant(inputs["z_map"]), 7,
                                 repeat_num=4, hidden_num=16, scope="G_FC")
        with tf1.variable_scope("Gaussian_FC_Bg"):
            mb_out = _fcres_graph(tf.constant(inputs["z_map"]), 8,
                                  repeat_num=4, hidden_num=16, scope="G_FC")
        with tf1.variable_scope("PoseGaussian"):
            pg_out = _fcres_graph(tf.constant(inputs["pz"]), Z,
                                  repeat_num=4, hidden_num=16, scope="G_FC")
        with tf1.variable_scope("PoseAE"):
            pe_out = _fcres_graph(tf.constant(inputs["rcv"]), Z,
                                  repeat_num=4, hidden_num=16,
                                  scope="G_Pose_Encoder")
            pd_coords, pd_vis = _pose_decoder_graph(
                tf.constant(inputs["pz"]), K, repeat_num=4, hidden_num=16)
        d_out = _tflib_dcgan_d(tf.constant(inputs["img"]), dim=4,
                               img_h=32, img_w=16)
        # optimizer slot vars must be filtered out by the importer
        tf1.get_variable("ID_AE/G/Conv/weights/Adam", [1],
                         initializer=tf1.zeros_initializer())
        saver = tf1.train.Saver(max_to_keep=1)
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            outs = sess.run({"g": g_out, "g_z": g_z, "mapper": m_out,
                             "mapper_bg": mb_out, "pose_gauss": pg_out,
                             "pe": pe_out, "pd_coords": pd_coords,
                             "pd_vis": pd_vis, "d": d_out})
            path = str(tmp_path_factory.mktemp("tf1") / "model.ckpt")
            saver.save(sess, path)
    return path, inputs, outs


def _uae_template():
    from dpig_tpu.models.generator import UAEGenerator
    gen = UAEGenerator(out_channels=3, z_num=4, repeat_num=3, hidden_num=8)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), None, jnp.zeros((2, 16, 8, 4)),
        embs_const=jnp.zeros((2, 6)))["params"]
    return gen, params


def test_uae_generator_roundtrip(real_ckpt):
    path, inputs, outs = real_ckpt
    gen, template = _uae_template()
    imported = import_checkpoint(path, {"ID_AE": template})
    got, got_z = gen.apply({"params": imported["ID_AE"]}, None,
                           jnp.asarray(inputs["pose"]),
                           embs_const=jnp.asarray(inputs["embs"]))
    np.testing.assert_allclose(np.asarray(got_z), outs["g_z"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), outs["g"],
                               rtol=1e-3, atol=1e-4)


def test_mapper_roundtrip(real_ckpt):
    path, inputs, outs = real_ckpt
    from dpig_tpu.models.mappers import GaussianMapper
    m = GaussianMapper(out_dim=7, repeat_num=4, hidden_num=16)
    template = jax.jit(m.init)(jax.random.PRNGKey(0),
                               jnp.zeros((2, 5)))["params"]
    imported = import_checkpoint(path, {"Gaussian_FC_Fg": template})
    got = m.apply({"params": imported["Gaussian_FC_Fg"]},
                  jnp.asarray(inputs["z_map"]))
    np.testing.assert_allclose(np.asarray(got), outs["mapper"],
                               rtol=1e-4, atol=1e-5)


def test_pose_ae_roundtrip(real_ckpt):
    path, inputs, outs = real_ckpt
    from dpig_tpu.models.pose_ae import PoseDecoderFC, PoseEncoderFC
    enc = PoseEncoderFC(z_num=4, repeat_num=4, hidden_num=16)
    dec = PoseDecoderFC(keypoint_num=3, repeat_num=4, hidden_num=16)
    t_enc = jax.jit(enc.init)(jax.random.PRNGKey(0),
                              jnp.zeros((2, 9)))["params"]
    t_dec = jax.jit(dec.init)(jax.random.PRNGKey(0),
                              jnp.zeros((2, 4)))["params"]
    imported = import_checkpoint(
        path, {"PoseAE": {"G_Pose_Encoder": t_enc, "G_Pose_Decoder": t_dec}})
    got_z = enc.apply({"params": imported["PoseAE"]["G_Pose_Encoder"]},
                      jnp.asarray(inputs["rcv"]))
    np.testing.assert_allclose(np.asarray(got_z), outs["pe"],
                               rtol=1e-4, atol=1e-5)
    coords, vis = dec.apply({"params": imported["PoseAE"]["G_Pose_Decoder"]},
                            jnp.asarray(inputs["pz"]))
    np.testing.assert_allclose(np.asarray(coords), outs["pd_coords"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vis), outs["pd_vis"], atol=1e-6)


def test_discriminator_roundtrip(real_ckpt):
    path, inputs, outs = real_ckpt
    from dpig_tpu.models.discriminators import DCGANDiscriminator
    d = DCGANDiscriminator(dim=4, n_stages=4, mode="dcgan", bn=True)
    dv = jax.jit(lambda r, x: d.init(r, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 16, 3)))
    imported = import_checkpoint(
        path, {"Discriminator": dv["params"],
               "Discriminator_stats": dv.get("batch_stats", {})},
        img_h=32, img_w=16)
    got, _ = d.apply({"params": imported["Discriminator"],
                      "batch_stats": imported.get("Discriminator_stats",
                                                  dv.get("batch_stats", {}))},
                     jnp.asarray(inputs["img"]), train=True,
                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), outs["d"],
                               rtol=1e-3, atol=1e-3)


def test_full_bundle_composed_restore(real_ckpt, tmp_path):
    """The full published-checkpoint workflow (VERDICT r3 item 9): a real
    TF1 checkpoint is imported subnet-by-subnet (the tf1_import CLI
    flow), each subnet saved as its own orbax checkpoint — one per
    reference training stage — and the four --pretrained_* flags are
    composed through train/checkpoint.py compose_pretrained exactly as
    the model-11 tester does (tester.py:259-309). Asserts the merged
    tree is bitwise the imported values and still reproduces the TF1
    session's forwards."""
    import types

    from dpig_tpu.config import Config
    from dpig_tpu.models.mappers import GaussianMapper
    from dpig_tpu.models.pose_ae import PoseDecoderFC, PoseEncoderFC
    from dpig_tpu.train import checkpoint as ckpt

    path, inputs, outs = real_ckpt
    gen, uae_t = _uae_template()
    m_fg = GaussianMapper(out_dim=7, repeat_num=4, hidden_num=16)
    m_bg = GaussianMapper(out_dim=8, repeat_num=4, hidden_num=16)
    m_pg = GaussianMapper(out_dim=4, repeat_num=4, hidden_num=16)
    t_fg = jax.jit(m_fg.init)(jax.random.PRNGKey(0),
                              jnp.zeros((2, 5)))["params"]
    t_bg = jax.jit(m_bg.init)(jax.random.PRNGKey(1),
                              jnp.zeros((2, 5)))["params"]
    t_pg = jax.jit(m_pg.init)(jax.random.PRNGKey(2),
                              jnp.zeros((2, 4)))["params"]
    enc = PoseEncoderFC(z_num=4, repeat_num=4, hidden_num=16)
    dec = PoseDecoderFC(keypoint_num=3, repeat_num=4, hidden_num=16)
    t_pe = jax.jit(enc.init)(jax.random.PRNGKey(3),
                             jnp.zeros((2, 9)))["params"]
    t_pd = jax.jit(dec.init)(jax.random.PRNGKey(4),
                             jnp.zeros((2, 4)))["params"]

    imported = import_checkpoint(
        path, {"ID_AE": uae_t, "Gaussian_FC_Fg": t_fg,
               "Gaussian_FC_Bg": t_bg, "PoseGaussian": t_pg,
               "PoseAE": {"G_Pose_Encoder": t_pe, "G_Pose_Decoder": t_pd}})
    assert set(imported) == {"ID_AE", "Gaussian_FC_Fg", "Gaussian_FC_Bg",
                             "PoseGaussian", "PoseAE"}

    # the fixture has no Encoder scope — like the CLI, the stage-1
    # checkpoint carries a (random) template for it
    rng = np.random.default_rng(9)
    enc_random = {"Conv_0": {"kernel": rng.normal(
        0, 0.1, (3, 3, 3, 4)).astype(np.float32)}}

    def save_stage(name, g_params):
        state = types.SimpleNamespace(
            step=0, g_params=g_params, d_params=None, g_opt_state=None,
            d_opt_state=None, d_stats=None, frozen_params=None)
        return ckpt.save_checkpoint(str(tmp_path / name), 0, state)

    p1 = save_stage("s1", {"Encoder": enc_random,
                           "ID_AE": imported["ID_AE"]})
    p2 = save_stage("s2", {"PoseAE": imported["PoseAE"]})
    p3 = save_stage("s3", {"Gaussian_FC_Fg": imported["Gaussian_FC_Fg"],
                           "Gaussian_FC_Bg": imported["Gaussian_FC_Bg"]})
    p4 = save_stage("s4", {"PoseGaussian": imported["PoseGaussian"]})

    cfg = Config(pretrained_path=p1, pretrained_poseAE_path=p2,
                 pretrained_appSample_path=p3, pretrained_poseSample_path=p4)
    merged = ckpt.compose_pretrained(cfg)
    assert set(merged) == {"Encoder", "ID_AE", "PoseAE", "Gaussian_FC_Fg",
                           "Gaussian_FC_Bg", "PoseGaussian"}

    # bitwise round trip through orbax + composition
    want = {"Encoder": enc_random, **imported}
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(merged))
    assert len(flat_w) == len(flat_m)
    for kpath, leaf in flat_w:
        np.testing.assert_array_equal(np.asarray(flat_m[kpath]),
                                      np.asarray(leaf),
                                      err_msg=str(kpath))

    # composed trees still drive the forwards to the TF1 session outputs
    got, got_z = gen.apply({"params": merged["ID_AE"]}, None,
                           jnp.asarray(inputs["pose"]),
                           embs_const=jnp.asarray(inputs["embs"]))
    np.testing.assert_allclose(np.asarray(got), outs["g"],
                               rtol=1e-3, atol=1e-4)
    got_bg = m_bg.apply({"params": merged["Gaussian_FC_Bg"]},
                        jnp.asarray(inputs["z_map"]))
    np.testing.assert_allclose(np.asarray(got_bg), outs["mapper_bg"],
                               rtol=1e-4, atol=1e-5)
    got_pg = m_pg.apply({"params": merged["PoseGaussian"]},
                        jnp.asarray(inputs["pz"]))
    np.testing.assert_allclose(np.asarray(got_pg), outs["pose_gauss"],
                               rtol=1e-4, atol=1e-5)
