"""TF1 import shim mechanics: positional pairing, shape checks, layouts.

A real published checkpoint isn't available in this environment, so the
test synthesizes a slim-style variable dict with the shapes our modules
expect (validating ordering/shape plumbing, not the reference's exact
variable count — that check fires loudly on first contact with a real
checkpoint).
"""
import numpy as np
import jax
import pytest

from dpig_tpu.models.mappers import GaussianMapper
from dpig_tpu.train import tf1_import as t1


def _fake_slim_vars(flax_params, scope):
    """Build reference-style names for each flax kernel, in order."""
    stream = t1._flax_kernel_stream(flax_params)
    out = {}
    for i, (path, leaf) in enumerate(stream):
        shape = leaf["kernel"].shape
        kind = "Conv" if len(shape) == 4 else "fully_connected"
        suffix = "" if i == 0 else f"_{i}"
        base = f"{scope}/G_FC/{kind}{suffix}"
        out[f"{base}/weights"] = np.full(shape, float(i + 1), np.float32)
        out[f"{base}/biases"] = np.full(leaf["bias"].shape, float(-i),
                                        np.float32)
    return out


def test_positional_import_roundtrip():
    m = GaussianMapper(out_dim=16, hidden_num=8, repeat_num=2)
    params = m.init(jax.random.PRNGKey(0),
                    np.zeros((2, 16), np.float32))["params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    var_dict = _fake_slim_vars(params, "Gaussian_FC_Fg")
    filled = t1.import_scope(var_dict, "Gaussian_FC_Fg", params)
    stream = t1._flax_kernel_stream(filled)
    for i, (path, leaf) in enumerate(stream):
        assert float(leaf["kernel"].flatten()[0]) == i + 1, path
        assert float(leaf["bias"][0]) == -i, path


def test_shape_mismatch_fails_loudly():
    m = GaussianMapper(out_dim=16, hidden_num=8, repeat_num=2)
    params = jax.tree_util.tree_map(
        np.asarray, m.init(jax.random.PRNGKey(0),
                           np.zeros((2, 16), np.float32))["params"])
    var_dict = _fake_slim_vars(params, "Gaussian_FC_Fg")
    # corrupt one kernel's shape
    key = sorted(var_dict)[0]
    k = [k for k in var_dict if k.endswith("weights")][0]
    var_dict[k] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch|architecture"):
        t1.import_scope(var_dict, "Gaussian_FC_Fg", params)


def test_count_mismatch_fails_loudly():
    m = GaussianMapper(out_dim=16, hidden_num=8, repeat_num=2)
    params = jax.tree_util.tree_map(
        np.asarray, m.init(jax.random.PRNGKey(0),
                           np.zeros((2, 16), np.float32))["params"])
    var_dict = _fake_slim_vars(params, "Gaussian_FC_Fg")
    var_dict["Gaussian_FC_Fg/G_FC/extra/weights"] = np.zeros((4, 4),
                                                             np.float32)
    with pytest.raises(ValueError, match="architecture mismatch"):
        t1.import_scope(var_dict, "Gaussian_FC_Fg", params)


def test_slim_sort_key_ordering():
    names = ["s/Conv_10/weights", "s/Conv/weights", "s/Conv_2/weights"]
    assert sorted(names, key=t1._slim_sort_key) == [
        "s/Conv/weights", "s/Conv_2/weights", "s/Conv_10/weights"]
