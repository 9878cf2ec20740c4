"""int8 post-training-quantized inference path for the UAE generator.

Motivation (measured on the target chip): int8 convolutions run ~1.9x
faster than bf16 at the generator's dominant shapes, and generation is
FLOP-bound — so an int8 generator is the lever past the bf16 ceiling.

Scheme: per-OUTPUT-CHANNEL symmetric weight scales, per-TENSOR symmetric
activation scales from absmax calibration; conv accumulation in int32;
dequant + bias + ReLU in bf16 between layers. Dense layers and the stem
(pose conv + constant-embedding bias, ~2% of FLOPs) stay in bf16.

One exact graph transform is also applied here: the decoder's
NN-upsample -> 1x1-conv pairs are reordered to 1x1-conv -> NN-upsample
(a 1x1 conv commutes with nearest-neighbor upsampling), quartering those
convs' FLOPs.

The float reference forward in this file is unit-tested equal to
UAEGenerator.apply, so the layer plumbing cannot drift from the module.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import wino
from ..ops.image import upscale_nn
from .generator import _constant_input_stem

_REL = jax.nn.relu


def _conv(x, kernel, bias=None, stride=1, prefer=None):
    out = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer)
    if bias is not None:
        out = out + bias
    return out


def _qconv(x, w8, w_scale, bias, s_x, stride=1):
    """int8 conv: quantize activations, accumulate int32, dequantize."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
    q = q.astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        q, w8, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (s_x * w_scale) + bias).astype(
        jnp.bfloat16)


def enc_layer_names(repeat_num: int) -> List[Tuple[str, str]]:
    """(kind, name) for ConvBlockTower convs in creation order."""
    out = []
    i = 0
    for idx in range(repeat_num):
        out.append(("res", f"Conv_{i}")); i += 1
        out.append(("res", f"Conv_{i}")); i += 1
        if idx < repeat_num - 1:
            out.append(("down", f"Conv_{i}")); i += 1
    return out


def dec_layer_names(repeat_num: int) -> List[Tuple[str, str]]:
    out = []
    i = 0
    for idx in range(repeat_num):
        out.append(("res", f"Conv_{i}")); i += 1
        out.append(("res", f"Conv_{i}")); i += 1
        if idx < repeat_num - 1:
            out.append(("up1x1", f"Conv_{i}")); i += 1
    return out


def uae_forward(params, embs, pose, repeat_num: int, hidden_num: int,
                quant: Optional[Dict] = None,
                collect_stats: bool = False,
                wino_layers: Optional[frozenset] = None):
    """Layer-by-layer UAEGenerator forward on raw params.

    quant=None, collect_stats=False  -> float forward (== module apply).
    collect_stats=True               -> also return {layer: absmax(input)}
                                        (+ per-point U absmax for layers in
                                        `wino_layers`, keyed 'wino/<name>').
    quant={'weights': {name: (w8, w_scale)}, 'act_scales': {name: s},
           'wino': {name: (w8_16, w_scale_16, u_scale_16)}}
                                     -> int8 conv path + conv-then-upscale;
                                        layers in 'wino' run the F(2x2,3x3)
                                        transform-domain path (ops/wino.py).
    """
    stats: Dict[str, jax.Array] = {}
    dtype = jnp.bfloat16 if quant is not None else jnp.float32
    wino_layers = wino_layers or frozenset()

    def record(name, x):
        if collect_stats:
            stats[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            if name in wino_layers:
                u = wino.input_transform(x.astype(jnp.float32))
                stats[f"wino/{name}"] = jnp.max(jnp.abs(u), axis=(1, 2))

    def conv_apply(name, tree, x, stride=1, act=True):
        record(name, x)
        if quant is not None and name in quant.get("wino", {}):
            w8, w_scale, u_scale = quant["wino"][name]
            out = wino.wino_conv_int8(
                x, w8, w_scale, u_scale,
                tree["bias"].astype(jnp.float32)).astype(jnp.bfloat16)
        elif quant is not None and name in quant["weights"]:
            w8, w_scale = quant["weights"][name]
            out = _qconv(x, w8, w_scale, tree["bias"].astype(jnp.float32),
                         quant["act_scales"][name], stride)
        else:
            out = _conv(x.astype(dtype), tree["kernel"].astype(dtype),
                        tree["bias"].astype(dtype), stride)
        return _REL(out) if act else out

    # stem (bf16/f32; pose conv + constant-embedding bias)
    x = _REL(_constant_input_stem(params["stem_kernel"],
                                  params["stem_bias"], embs, pose, dtype))

    # encoder tower with skips
    enc = params["ConvBlockTower_0"]
    skips = []
    names = enc_layer_names(repeat_num)
    ni = 0
    for idx in range(repeat_num):
        res = x
        x = conv_apply(f"enc/{names[ni][1]}", enc[names[ni][1]], x); ni += 1
        x = conv_apply(f"enc/{names[ni][1]}", enc[names[ni][1]], x); ni += 1
        x = x + res
        skips.append(x)
        if idx < repeat_num - 1:
            x = conv_apply(f"enc/{names[ni][1]}", enc[names[ni][1]], x,
                           stride=2); ni += 1

    b, h_min, w_min, _ = x.shape
    flat = x.reshape(b, -1).astype(dtype)
    z = flat @ params["bottleneck"]["kernel"].astype(dtype) \
        + params["bottleneck"]["bias"].astype(dtype)
    xu = z @ params["unbottleneck"]["kernel"].astype(dtype) \
        + params["unbottleneck"]["bias"].astype(dtype)
    x = xu.reshape(b, h_min, w_min, hidden_num)

    names = dec_layer_names(repeat_num)
    ni = 0
    for idx in range(repeat_num):
        x = jnp.concatenate(
            [x, skips[repeat_num - 1 - idx].astype(x.dtype)], axis=-1)
        res = x
        x = conv_apply(f"dec/{names[ni][1]}", params[names[ni][1]], x); ni += 1
        x = conv_apply(f"dec/{names[ni][1]}", params[names[ni][1]], x); ni += 1
        x = x + res
        if idx < repeat_num - 1:
            if quant is not None:
                # exact reorder: 1x1 conv commutes with NN upsample (4x fewer
                # FLOPs for this conv)
                x = conv_apply(f"dec/{names[ni][1]}", params[names[ni][1]], x)
                x = upscale_nn(x, 2)
            else:
                x = upscale_nn(x, 2)
                x = conv_apply(f"dec/{names[ni][1]}", params[names[ni][1]], x)
            ni += 1

    out = conv_apply("to_rgb", params["to_rgb"], x, act=False)
    out = out.astype(jnp.float32)
    if collect_stats:
        return out, z, stats
    return out, z


def quantize_weights(params, repeat_num: int) -> Dict:
    """Per-output-channel symmetric int8 weights for all tower/decoder
    convs (stem, denses, to_rgb stay float)."""
    weights = {}

    def q(kernel):
        k = np.asarray(kernel, np.float32)
        scale = np.abs(k).reshape(-1, k.shape[-1]).max(0) / 127.0
        scale = np.maximum(scale, 1e-12)
        w8 = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
        return jnp.asarray(w8), jnp.asarray(scale.astype(np.float32))

    for _, name in enc_layer_names(repeat_num):
        weights[f"enc/{name}"] = q(params["ConvBlockTower_0"][name]["kernel"])
    for _, name in dec_layer_names(repeat_num):
        weights[f"dec/{name}"] = q(params[name]["kernel"])
    return weights


def calibrate(params, embs_batches, pose_batches, repeat_num: int,
              hidden_num: int, wino_layers: frozenset = frozenset()
              ) -> Tuple[Dict[str, float], Dict[str, np.ndarray]]:
    """absmax activation scales over calibration batches (float forward).

    Returns (per-tensor scales, per-point U scales for wino layers)."""
    fwd = jax.jit(functools.partial(uae_forward, repeat_num=repeat_num,
                                    hidden_num=hidden_num,
                                    collect_stats=True,
                                    wino_layers=wino_layers))
    maxima: Dict[str, np.ndarray] = {}
    for embs, pose in zip(embs_batches, pose_batches):
        _, _, stats = fwd(params, embs, pose)
        for k, v in stats.items():
            v = np.asarray(v)
            maxima[k] = np.maximum(maxima.get(k, 0.0), v)
    scales = {k: float(np.maximum(v, 1e-12)) / 127.0
              for k, v in maxima.items() if not k.startswith("wino/")}
    u_scales = {k[5:]: np.maximum(v, 1e-12) / 127.0
                for k, v in maxima.items() if k.startswith("wino/")}
    return scales, u_scales


# Decoder stages where the Winograd path beats direct int8 on the v5e
# (big stride-1 convs; see scripts/perf_probe.py winomm + CLAUDE.md).
DEFAULT_WINO_LAYERS = frozenset()


def _layer_param_tree(params, name: str):
    scope, leaf = name.split("/") if "/" in name else (None, name)
    if scope == "enc":
        return params["ConvBlockTower_0"][leaf]
    if scope == "dec":
        return params[leaf]
    return params[name]


class QuantizedGenerator:
    """Calibrated int8 UAE generator for inference.

    wino_layers: layer names (e.g. 'dec/Conv_6') to run through the
    F(2x2,3x3) transform-domain int8 path instead of direct int8 conv.
    """

    def __init__(self, params, repeat_num: int, hidden_num: int,
                 wino_layers: frozenset = DEFAULT_WINO_LAYERS):
        self.params = params
        self.repeat_num = repeat_num
        self.hidden_num = hidden_num
        self.wino_layers = frozenset(wino_layers)
        self.quant: Optional[Dict] = None

    def calibrate(self, embs_batches, pose_batches) -> "QuantizedGenerator":
        act_scales, u_scales = calibrate(
            self.params, embs_batches, pose_batches, self.repeat_num,
            self.hidden_num, wino_layers=self.wino_layers)
        weights = quantize_weights(self.params, self.repeat_num)
        wino_tables = {}
        for name in self.wino_layers:
            kernel = np.asarray(_layer_param_tree(self.params, name)["kernel"])
            w8, w_scale = wino.quantize_wino_weights(kernel)
            wino_tables[name] = (w8, w_scale, jnp.asarray(u_scales[name]))
            weights.pop(name, None)  # replaced by the wino path
        self.quant = {
            "weights": weights,
            "act_scales": {k: jnp.float32(v) for k, v in act_scales.items()},
            "wino": wino_tables,
        }
        return self

    def __call__(self, embs, pose):
        assert self.quant is not None, "calibrate() first"
        return uae_forward(self.params, embs, pose, self.repeat_num,
                           self.hidden_num, quant=self.quant)
