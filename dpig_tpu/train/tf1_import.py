"""TF1 checkpoint import shim — load the published pretrained reference
checkpoints (Market/DF) into this framework's param trees.

The reference persists variables under two naming conventions
(SURVEY §5.4):
  * slim-scoped G-side nets: e.g. 'Encoder/G_encoder/Conv_3/weights'
    (scopes Encoder/ID_AE/PoseAE/PoseGaussian/Gaussian_FC_{Fg,Bg};
    slim auto-numbers Conv/Conv_1/... and fully_connected/... in creation
    order within each scope)
  * tflib flat registry names for discriminators:
    'Discriminator.1.Filters', 'Discriminator.Output.W', ...

Both our flax modules and slim create variables in the same graph order
(the module code mirrors the reference layer-for-layer), so the mapping is
POSITIONAL within each (scope, kind) stream: the i-th reference conv/FC
kernel in a scope pairs with the i-th flax Conv/Dense kernel in our
params subtree, with shape equality enforced at every pairing. Layouts
match (TF HWIO convs, [in,out] matmuls, NHWC nets — main.py:15-18 forces
NHWC).

Weights whose shapes disagree fail loudly — this shim never guesses.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def load_tf1_variables(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read all variables from a TF1 checkpoint (requires tensorflow)."""
    import tensorflow as tf
    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    return {name: reader.get_tensor(name) for name in shapes
            if not name.endswith(("Adam", "Adam_1", "RMSProp", "RMSProp_1"))
            and "beta1_power" not in name and "beta2_power" not in name}


def _slim_sort_key(name: str) -> Tuple:
    """Order slim auto-numbered names by creation: Conv < Conv_1 < Conv_2."""
    parts = []
    for seg in name.split("/"):
        m = re.match(r"^(.*?)(?:_(\d+))?$", seg)
        parts.append((m.group(1), int(m.group(2) or 0)))
    return tuple(parts)


def _ref_kernel_stream(var_dict: Dict[str, np.ndarray], scope: str
                       ) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, kernel, bias) triples for a scope, in creation order."""
    out = []
    prefix = scope + "/"
    kernels = sorted(
        (n for n in var_dict
         if n.startswith(prefix) and n.endswith(("weights", "W"))),
        key=_slim_sort_key)
    for kn in kernels:
        base = kn.rsplit("/", 1)[0]
        bias = var_dict.get(base + "/biases", var_dict.get(base + "/b"))
        out.append((kn, var_dict[kn], bias))
    return out


def _flax_kernel_stream(params: Any, path: str = ""
                        ) -> List[Tuple[str, Dict]]:
    """(path, leaf-dict) for every flax Conv/Dense module, in insertion
    order (flax FrozenDict/dict preserves creation order)."""
    out = []
    if isinstance(params, dict) and "kernel" in params:
        return [(path, params)]
    if isinstance(params, dict):
        for k, v in params.items():
            out.extend(_flax_kernel_stream(v, f"{path}/{k}" if path else k))
    return out


def import_scope(var_dict: Dict[str, np.ndarray], scope: str,
                 flax_params: Any) -> Any:
    """Fill one flax subtree from one reference scope, positionally."""
    import jax

    ref_stream = _ref_kernel_stream(var_dict, scope)
    flax_stream = _flax_kernel_stream(flax_params)
    if len(ref_stream) != len(flax_stream):
        raise ValueError(
            f"scope {scope!r}: {len(ref_stream)} reference kernels vs "
            f"{len(flax_stream)} flax kernels — architecture mismatch.\n"
            f"ref: {[n for n, *_ in ref_stream]}\n"
            f"flax: {[p for p, _ in flax_stream]}")
    new = jax.tree_util.tree_map(lambda x: x, flax_params)  # copy structure

    def set_leaf(tree, path, kernel, bias):
        node = tree
        keys = path.split("/")
        for k in keys[:-1]:
            node = node[k]
        leaf = node[keys[-1]]
        if tuple(leaf["kernel"].shape) != tuple(kernel.shape):
            raise ValueError(
                f"shape mismatch at {path}: flax {leaf['kernel'].shape} vs "
                f"reference {kernel.shape}")
        leaf["kernel"] = np.asarray(kernel)
        if bias is not None and "bias" in leaf:
            leaf["bias"] = np.asarray(bias)

    new = jax.tree_util.tree_map(np.asarray, new)  # mutable dict-of-ndarray
    new = _to_plain_dict(new)
    for (ref_name, kernel, bias), (path, _leaf) in zip(ref_stream,
                                                       flax_stream):
        set_leaf(new, path, kernel, bias)
    return new


def _to_plain_dict(tree):
    if isinstance(tree, dict):
        return {k: _to_plain_dict(v) for k, v in tree.items()}
    return tree


SCOPE_TO_SUBTREE = {
    # reference scope -> our named g_params subtree
    "Encoder": "Encoder",
    "ID_AE": "ID_AE",
    "PoseAE": "PoseAE",
    "PoseGaussian": "PoseGaussian",
    "Gaussian_FC_Fg": "Gaussian_FC_Fg",
    "Gaussian_FC_Bg": "Gaussian_FC_Bg",
}


def import_checkpoint(ckpt_path: str, template_params: Dict[str, Any],
                      scopes: List[str]) -> Dict[str, Any]:
    """Import the given reference scopes into copies of our template
    subtrees. Returns {subtree_name: filled_params}."""
    var_dict = load_tf1_variables(ckpt_path)
    out = {}
    for scope in scopes:
        sub = SCOPE_TO_SUBTREE[scope]
        out[sub] = import_scope(var_dict, scope, template_params[sub])
    return out
