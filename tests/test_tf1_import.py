"""TF1 import shim: positional pairing in true creation order.

Fake reference var dicts are constructed in slim CREATION order (the way
the reference graph builders create variables), independent of flax dict
iteration — each kernel carries a distinct marker so we can verify which
flax leaf it lands in.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpig_tpu.models.generator import UAEGenerator
from dpig_tpu.models.mappers import GaussianMapper
from dpig_tpu.train import tf1_import as t1


def _mk(shape, marker):
    return np.full(shape, float(marker), np.float32)


def test_mapper_import_order():
    # GaussianMapper(out 16, hidden 8, repeat 2): trunk Dense_0 (in->8),
    # Dense_1..4 (8->8), final Dense_0 (8->16).
    m = GaussianMapper(out_dim=16, hidden_num=8, repeat_num=2)
    params = jax.tree_util.tree_map(
        np.asarray, m.init(jax.random.PRNGKey(0),
                           np.zeros((2, 16), np.float32))["params"])
    # reference creation order: fully_connected, _1.., _5
    shapes = [(16, 8)] + [(8, 8)] * 4 + [(8, 16)]
    var = {}
    for i, s in enumerate(shapes):
        base = "Gaussian_FC_Fg/G_FC/fully_connected" + ("" if i == 0
                                                        else f"_{i}")
        var[f"{base}/weights"] = _mk(s, i + 1)
        var[f"{base}/biases"] = _mk((s[1],), -(i + 1))
    filled = t1.import_scope(var, "Gaussian_FC_Fg/G_FC", "mapper", params)
    assert filled["FCResTrunk_0"]["Dense_0"]["kernel"][0, 0] == 1
    assert filled["FCResTrunk_0"]["Dense_4"]["kernel"][0, 0] == 5
    assert filled["Dense_0"]["kernel"][0, 0] == 6  # final projection
    assert filled["Dense_0"]["bias"][0] == -6


def test_uae_generator_import_order():
    gen = UAEGenerator(out_channels=3, z_num=16, repeat_num=3, hidden_num=8)
    pose = np.zeros((2, 32, 16, 18), np.float32)
    embs = np.zeros((2, 52), np.float32)
    params = jax.tree_util.tree_map(
        np.asarray, gen.init(jax.random.PRNGKey(0), None,
                             pose, embs_const=embs)["params"])
    # reference creation order: stem conv, 8 encoder convs, FC z, FC unz,
    # 8 decoder convs, out conv — conv family numbered 0..17 in that order.
    order = t1.flax_stream_order("uae_generator", params)
    conv_paths = [p for p in order if p in ("stem", "to_rgb")
                  or p.startswith(("ConvBlockTower_0/", "Conv_"))]
    fc_paths = [p for p in order if p in ("bottleneck", "unbottleneck")]
    var = {}
    for i, p in enumerate(conv_paths):
        k, b = t1._leaf_kernel_bias(params, p)
        base = "ID_AE/G/Conv" + ("" if i == 0 else f"_{i}")
        var[f"{base}/weights"] = _mk(k.shape, 100 + i)
        var[f"{base}/biases"] = _mk(b.shape, -(100 + i))
    for i, p in enumerate(fc_paths):
        k, b = t1._leaf_kernel_bias(params, p)
        base = "ID_AE/G/fully_connected" + ("" if i == 0 else f"_{i}")
        var[f"{base}/weights"] = _mk(k.shape, 200 + i)
        var[f"{base}/biases"] = _mk(b.shape, -(200 + i))
    filled = t1.import_scope(var, "ID_AE/G", "uae_generator", params)
    assert filled["stem_kernel"][0, 0, 0, 0] == 100        # first ref conv
    assert filled["to_rgb"]["kernel"][0, 0, 0, 0] == 100 + len(conv_paths) - 1
    assert filled["bottleneck"]["kernel"][0, 0] == 200
    assert filled["unbottleneck"]["kernel"][0, 0] == 201
    # encoder convs come before decoder convs
    assert filled["ConvBlockTower_0"]["Conv_0"]["kernel"][0, 0, 0, 0] == 101
    assert filled["Conv_0"]["kernel"][0, 0, 0, 0] == 109   # first dec conv


def test_shape_mismatch_fails_loudly():
    m = GaussianMapper(out_dim=16, hidden_num=8, repeat_num=2)
    params = jax.tree_util.tree_map(
        np.asarray, m.init(jax.random.PRNGKey(0),
                           np.zeros((2, 16), np.float32))["params"])
    shapes = [(16, 8)] + [(8, 8)] * 4 + [(8, 16)]
    var = {}
    for i, s in enumerate(shapes):
        base = "X/G_FC/fully_connected" + ("" if i == 0 else f"_{i}")
        var[f"{base}/weights"] = _mk(s, i)
    var["X/G_FC/fully_connected_2/weights"] = _mk((3, 3), 0)
    with pytest.raises(ValueError, match="shape mismatch"):
        t1.import_scope(var, "X/G_FC", "mapper", params)


def test_count_mismatch_fails_loudly():
    m = GaussianMapper(out_dim=16, hidden_num=8, repeat_num=2)
    params = jax.tree_util.tree_map(
        np.asarray, m.init(jax.random.PRNGKey(0),
                           np.zeros((2, 16), np.float32))["params"])
    var = {"X/G_FC/fully_connected/weights": _mk((16, 8), 1)}
    with pytest.raises(ValueError, match="architecture mismatch"):
        t1.import_scope(var, "X/G_FC", "mapper", params)


def test_slim_sort_key_ordering():
    names = ["s/Conv_10/weights", "s/Conv/weights", "s/Conv_2/weights",
             "s/fully_connected/weights"]
    assert sorted(names, key=t1._slim_sort_key) == [
        "s/Conv/weights", "s/Conv_2/weights", "s/Conv_10/weights",
        "s/fully_connected/weights"]


def test_encoder_stream_orders_resolve():
    """flax_stream_order paths must exist in the real encoder param trees."""
    from dpig_tpu.models.encoders import RoiEncoder, RoiEncoderFgBg
    x = np.zeros((2, 32, 16, 3), np.float32)
    m = np.ones((2, 32, 16, 1), np.float32)
    bbox = np.zeros((2, 7, 4), np.int32)
    vis = np.ones((2, 7), np.float32)
    enc = RoiEncoderFgBg(part_num=7, z_num=8, repeat_num=3, hidden_num=8,
                         roi_size=8)
    p = jax.tree_util.tree_map(
        np.asarray, enc.init(jax.random.PRNGKey(0), x, m, bbox, vis)["params"])
    order = t1.flax_stream_order("roi_encoder_fgbg", p)
    for path in order:
        k, b = t1._leaf_kernel_bias(p, path)
        assert k is not None, path
    # stem convs first, fg tower, bg tower, then the two FCs
    assert order[0].startswith("_Stem_0/")
    assert order[-2:] == ["fg_tower/Dense_0", "bg_fc"]

    enc2 = RoiEncoder(part_num=7, z_num=8, repeat_num=3, hidden_num=8,
                      roi_size=8)
    p2 = jax.tree_util.tree_map(
        np.asarray, enc2.init(jax.random.PRNGKey(0), x, bbox, vis)["params"])
    order2 = t1.flax_stream_order("roi_encoder", p2)
    for path in order2:
        t1._leaf_kernel_bias(p2, path)
    assert order2[-1] == "_RoiTower_0/Dense_0"


def test_tf1_import_cli_plumbing(tmp_path, capsys):
    """python -m dpig_tpu.train.tf1_import on a checkpoint with no known
    scopes: completes, warns, and writes an orbax ckpt that restore_tree
    can read back with every subnet present (random template values)."""
    import tensorflow.compat.v1 as tf1
    tf1.disable_eager_execution()
    g = tf1.Graph()
    with g.as_default():
        tf1.get_variable("unrelated/var", [3],
                         initializer=tf1.zeros_initializer())
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            ckpt_path = str(tmp_path / "model.ckpt")
            saver.save(sess, ckpt_path)

    from dpig_tpu.train import tf1_import
    out_dir = str(tmp_path / "out")
    tf1_import.main([
        f"--ckpt_path={ckpt_path}", f"--model_dir={out_dir}",
        "--img_H=32", "--img_W=16", "--conv_hidden_num=16", "--z_num=16"])
    msg = capsys.readouterr().out
    assert "scopes not found" in msg

    from dpig_tpu.train import checkpoint as ckpt
    path = ckpt.latest_checkpoint(out_dir)
    assert path is not None
    tree = ckpt.restore_tree(path)
    for sub in ("Encoder", "ID_AE", "PoseAE", "PoseGaussian",
                "Gaussian_FC_Fg", "Gaussian_FC_Bg"):
        assert sub in tree["g_params"], sub
