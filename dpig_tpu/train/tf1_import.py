"""TF1 checkpoint import shim — load the published pretrained reference
checkpoints (Market/DF) into this framework's param trees.

The reference persists variables under two naming conventions
(SURVEY §5.4):
  * slim-scoped G-side nets: e.g. 'Encoder/G_encoder/Conv_3/weights'.
    slim auto-numbers Conv/Conv_1/... and fully_connected/... per
    variable_scope IN CREATION ORDER, convs and FCs in separate families.
  * tflib flat registry names for discriminators
    ('Discriminator.1.Filters', ...) — not imported (scores only).

Pairing is positional per (scope, family): the i-th reference conv/FC
kernel pairs with the i-th flax conv/dense kernel IN MODULE CREATION
ORDER. flax param dicts iterate alphabetically, which does NOT match
creation order, so each module kind has an explicit order table below
(validated structurally: count + shape equality enforced at every
pairing — a mismatch fails loudly, never guesses).

Layouts match (TF HWIO convs, [in,out] matmuls, NHWC nets — reference
main.py:15-18 forces NHWC).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------- reference
def load_tf1_variables(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read all variables from a TF1 checkpoint (requires tensorflow)."""
    import tensorflow as tf
    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    return {name: reader.get_tensor(name) for name in shapes
            if not name.endswith(("Adam", "Adam_1", "RMSProp", "RMSProp_1"))
            and "power" not in name}


def _slim_sort_key(name: str) -> Tuple:
    """Creation order for slim auto-numbered names: Conv < Conv_1 < Conv_10."""
    parts = []
    for seg in name.split("/"):
        m = re.match(r"^(.*?)(?:_(\d+))?$", seg)
        parts.append((m.group(1), int(m.group(2) or 0)))
    return tuple(parts)


def ref_kernel_stream(var_dict: Dict[str, np.ndarray], scope: str
                      ) -> List[Tuple[str, np.ndarray, Optional[np.ndarray]]]:
    """(name, kernel, bias) in creation order for a scope — convs first
    (slim 'Conv*' sorts before 'fully_connected*'), each family in
    creation order."""
    prefix = scope + "/"
    kernels = sorted(
        (n for n in var_dict
         if n.startswith(prefix) and n.endswith("weights")),
        key=_slim_sort_key)
    out = []
    for kn in kernels:
        base = kn.rsplit("/", 1)[0]
        out.append((kn, var_dict[kn], var_dict.get(base + "/biases")))
    return out


# ------------------------------------------------------------- flax orders
def _nat(p: str) -> Tuple:
    return tuple(int(s) if s.isdigit() else s for s in re.split(r"(\d+)", p))


def _tower_convs(tree: Dict, prefix: str) -> List[str]:
    names = sorted((k for k in tree if k.startswith("Conv_")), key=_nat)
    return [f"{prefix}/{n}" for n in names]


def _trunk_denses(tree: Dict, prefix: str) -> List[str]:
    names = sorted((k for k in tree if k.startswith("Dense_")), key=_nat)
    return [f"{prefix}/{n}" for n in names]


def flax_stream_order(kind: str, params: Dict) -> List[str]:
    """Kernel paths in MODULE CREATION ORDER, convs first then denses —
    matching ref_kernel_stream's family ordering.

    kinds: 'mapper' (GaussianMapper / PoseEncoderFC),
           'pose_decoder' (PoseDecoderFC),
           'uae_generator' (UAEGenerator; 'stem' = raw stem_kernel/bias),
           'roi_encoder_fgbg' (RoiEncoderFgBg),
           'roi_encoder' (RoiEncoder).
    """
    if kind == "mapper":
        return _trunk_denses(params["FCResTrunk_0"], "FCResTrunk_0") + \
            ["Dense_0"]
    if kind == "pose_decoder":
        return _trunk_denses(params["FCResTrunk_0"], "FCResTrunk_0") + \
            ["coords", "visible"]
    if kind == "uae_generator":
        convs = (["stem"]
                 + _tower_convs(params["ConvBlockTower_0"],
                                "ConvBlockTower_0")
                 + sorted((k for k in params if k.startswith("Conv_")),
                          key=_nat)
                 + ["to_rgb"])
        return convs + ["bottleneck", "unbottleneck"]
    if kind == "roi_encoder_fgbg":
        convs = (_tower_convs(params["_Stem_0"], "_Stem_0")
                 + _tower_convs(params["fg_tower"]["ConvBlockTower_0"],
                                "fg_tower/ConvBlockTower_0")
                 + _tower_convs(params["bg_tower"], "bg_tower"))
        return convs + ["fg_tower/Dense_0", "bg_fc"]
    if kind == "roi_encoder":
        convs = (_tower_convs(params["_Stem_0"], "_Stem_0")
                 + _tower_convs(params["_RoiTower_0"]["ConvBlockTower_0"],
                                "_RoiTower_0/ConvBlockTower_0"))
        return convs + ["_RoiTower_0/Dense_0"]
    raise ValueError(f"unknown module kind {kind!r}")


def _get_leaf(tree: Dict, path: str):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def _leaf_kernel_bias(tree: Dict, path: str):
    if path == "stem":
        return tree["stem_kernel"], tree.get("stem_bias")
    leaf = _get_leaf(tree, path)
    return leaf["kernel"], leaf.get("bias")


def _set_leaf(tree: Dict, path: str, kernel, bias):
    if path == "stem":
        tree["stem_kernel"] = np.asarray(kernel)
        if bias is not None:
            tree["stem_bias"] = np.asarray(bias)
        return
    node = tree
    keys = path.split("/")
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]]["kernel"] = np.asarray(kernel)
    if bias is not None and "bias" in node[keys[-1]]:
        node[keys[-1]]["bias"] = np.asarray(bias)


def _to_plain(tree):
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    return np.asarray(tree)


# ------------------------------------------------------------------ import
def import_scope(var_dict: Dict[str, np.ndarray], scope: str, kind: str,
                 flax_params: Any) -> Any:
    """Fill one flax subtree from one reference scope, positionally."""
    ref = ref_kernel_stream(var_dict, scope)
    order = flax_stream_order(kind, flax_params)
    if len(ref) != len(order):
        raise ValueError(
            f"scope {scope!r}: {len(ref)} reference kernels vs "
            f"{len(order)} flax kernels — architecture mismatch.\n"
            f"ref: {[n for n, *_ in ref]}\nflax: {order}")
    new = _to_plain(flax_params)
    for (ref_name, kernel, bias), path in zip(ref, order):
        want, _ = _leaf_kernel_bias(new, path)
        if tuple(want.shape) != tuple(kernel.shape):
            raise ValueError(
                f"shape mismatch pairing {ref_name} -> {path}: reference "
                f"{kernel.shape} vs flax {want.shape}")
        _set_leaf(new, path, kernel, bias)
    return new


def import_discriminator(var_dict: Dict[str, np.ndarray],
                         d_params: Dict[str, Any],
                         d_stats: Optional[Dict[str, Any]],
                         img_h: int, img_w: int, dim: int = 64,
                         name: str = "Discriminator"
                         ) -> Tuple[Dict, Dict]:
    """Import the tflib flat-registry DCGAN discriminator
    ('Discriminator.N.Filters/.Biases', '.BNn.*', '.Output.W/.b' —
    wgan_gp.py:407-440, registry tflib/__init__.py:10-37) into the flax
    DCGANDiscriminator tree (Conv_0..n, BatchNorm_0.., logit).

    Layout notes: tflib convs take HWIO filters even in NCHW mode, so
    kernels map 1:1; the final logit flattens the NCHW feature map
    (row index c*(H*W) + h*W + w) while flax flattens NHWC
    (h*(W*C) + w*C + c), so Output.W's rows are permuted accordingly.
    """
    new = _to_plain(d_params)
    stats = _to_plain(d_stats) if d_stats else {}
    n_stages = sum(1 for k in new if k.startswith("Conv_"))
    for i in range(n_stages):
        kn = f"{name}.{i + 1}.Filters"
        conv = new[f"Conv_{i}"]
        if tuple(conv["kernel"].shape) != tuple(var_dict[kn].shape):
            raise ValueError(
                f"shape mismatch {kn}: reference {var_dict[kn].shape} vs "
                f"flax {conv['kernel'].shape}")
        conv["kernel"] = np.asarray(var_dict[kn])
        bn = var_dict.get(f"{name}.{i + 1}.Biases")
        if bn is not None and "bias" in conv:
            conv["bias"] = np.asarray(bn)
        # BN at stages >= 1 (wgan_gp.py:417-427), numbered BN2..BNn in the
        # reference and BatchNorm_{i-1} in flax module creation order.
        bkey = f"{name}.BN{i + 1}"
        fkey = f"BatchNorm_{i - 1}"
        if f"{bkey}.scale" in var_dict and fkey in new:
            new[fkey]["scale"] = np.asarray(var_dict[f"{bkey}.scale"])
            new[fkey]["bias"] = np.asarray(var_dict[f"{bkey}.offset"])
            if fkey in stats:
                stats[fkey]["mean"] = np.asarray(
                    var_dict[f"{bkey}.moving_mean"])
                stats[fkey]["var"] = np.asarray(
                    var_dict[f"{bkey}.moving_variance"])
    w = np.asarray(var_dict[f"{name}.Output.W"])
    h_f, w_f = img_h // (2 ** n_stages), img_w // (2 ** n_stages)
    c_f = w.shape[0] // (h_f * w_f)
    # rows (c, h, w) -> (h, w, c)
    w = w.reshape(c_f, h_f, w_f, -1).transpose(1, 2, 0, 3).reshape(
        h_f * w_f * c_f, -1)
    if tuple(new["logit"]["kernel"].shape) != tuple(w.shape):
        raise ValueError(
            f"shape mismatch {name}.Output.W: reference {w.shape} vs flax "
            f"{new['logit']['kernel'].shape}")
    new["logit"]["kernel"] = w
    new["logit"]["bias"] = np.asarray(
        var_dict[f"{name}.Output.b"]).reshape(-1)
    return new, stats


# reference scope -> (our subtree in g_params, module kind)
SCOPE_TABLE = {
    "Encoder/G_encoder": ("Encoder", "roi_encoder_fgbg"),
    "ID_AE/G": ("ID_AE", "uae_generator"),
    "PoseAE/G_Pose_Encoder": (("PoseAE", "G_Pose_Encoder"), "mapper"),
    "PoseAE/G_Pose_Decoder": (("PoseAE", "G_Pose_Decoder"), "pose_decoder"),
    "PoseGaussian/G_FC": ("PoseGaussian", "mapper"),
    "Gaussian_FC_Fg/G_FC": ("Gaussian_FC_Fg", "mapper"),
    "Gaussian_FC_Bg/G_FC": ("Gaussian_FC_Bg", "mapper"),
    "Gaussian_FC/G_FC": ("Gaussian_FC", "mapper"),
}


def import_checkpoint(ckpt_path: str, template_params: Dict[str, Any],
                      scopes: Optional[List[str]] = None,
                      img_h: int = 128, img_w: int = 64) -> Dict[str, Any]:
    """Import reference scopes into copies of our template subtrees.

    scopes: reference scope prefixes (keys of SCOPE_TABLE); defaults to all
    scopes present in both the checkpoint and the template. The tflib
    flat-name discriminator (tester.py:17-64 restores it via the full
    saver) is imported when both sides have one."""
    var_dict = load_tf1_variables(ckpt_path)
    present = {n.split("/")[0] for n in var_dict}
    out: Dict[str, Any] = {}
    if "Discriminator.1.Filters" in var_dict and \
            "Discriminator" in template_params and \
            (scopes is None or "Discriminator" in scopes):
        d_new, d_stats = import_discriminator(
            var_dict, template_params["Discriminator"],
            template_params.get("Discriminator_stats"), img_h, img_w)
        out["Discriminator"] = d_new
        if d_stats:
            out["Discriminator_stats"] = d_stats
    for scope, (target, kind) in SCOPE_TABLE.items():
        if scopes is not None and scope not in scopes:
            continue
        top = scope.split("/")[0]
        if top not in present:
            continue
        if isinstance(target, tuple):
            if target[0] not in template_params:
                continue
            sub = template_params[target[0]][target[1]]
            filled = import_scope(var_dict, scope, kind, sub)
            out.setdefault(target[0], _to_plain(
                template_params[target[0]]))[target[1]] = filled
        else:
            if target not in template_params:
                continue
            out[target] = import_scope(var_dict, scope, kind,
                                       template_params[target])
    return out


def main(argv=None) -> None:
    """CLI: convert a published reference TF1 checkpoint to an orbax
    checkpoint consumable by the --pretrained_* flags.

        python -m dpig_tpu.train.tf1_import --ckpt_path=<tf1 ckpt prefix> \
            --model_dir=<out dir> [--img_H=128 --img_W=64 ...]

    Builds fresh template params for every subnet at the given geometry,
    imports all reference scopes present in the checkpoint (plus the
    tflib flat-name Discriminator), and writes `<model_dir>/ckpt/step0`.
    Scopes absent from the checkpoint keep their (random) template values
    and are listed loudly.
    """
    from ..config import get_config
    cfg = get_config(argv)
    assert cfg.ckpt_path, "--ckpt_path=<tf1 checkpoint prefix> required"
    assert cfg.model_dir, "--model_dir=<output dir> required"
    from ..apps import testers as _testers

    class _AllNets(_testers.FullSamplingTester):
        def _restore_params(self):  # template only — never restore
            return self._fresh_params()

    template = _AllNets(cfg).params
    imported = import_checkpoint(cfg.ckpt_path, template,
                                 img_h=cfg.img_H, img_w=cfg.img_W)
    missing = sorted(set(template) - set(imported))
    if missing:
        print(f"[!] scopes not found in {cfg.ckpt_path}: {missing} "
              "(kept as random init)")
    d_params = {}
    d_stats = {}
    if "Discriminator" in imported:
        d_params["Discriminator"] = imported.pop("Discriminator")
        d_stats = imported.pop("Discriminator_stats", {})
    g_params = {**{k: v for k, v in template.items()
                   if k not in ("Discriminator", "Discriminator_stats")},
                **imported}

    from . import checkpoint as ckpt
    import types
    state = types.SimpleNamespace(step=0, g_params=g_params,
                                  d_params=d_params or None,
                                  g_opt_state=None, d_opt_state=None,
                                  d_stats=d_stats or None,
                                  frozen_params=None)
    path = ckpt.save_checkpoint(cfg.model_dir, 0, state)
    print(f"[*] imported {sorted(imported)} -> {path}")


if __name__ == "__main__":
    main()
