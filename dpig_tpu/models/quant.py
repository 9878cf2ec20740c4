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
                collect_stats: bool = False):
    """Layer-by-layer UAEGenerator forward on raw params.

    quant=None, collect_stats=False  -> float forward (== module apply).
    collect_stats=True               -> also return {layer: absmax(input)}.
    quant={'weights': {name: (w8, w_scale)}, 'act_scales': {name: s}}
                                     -> int8 conv path + conv-then-upscale.
    """
    stats: Dict[str, jax.Array] = {}
    dtype = jnp.bfloat16 if quant is not None else jnp.float32

    def record(name, x):
        if collect_stats:
            stats[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))

    def conv_apply(name, tree, x, stride=1, act=True):
        record(name, x)
        if quant is not None and name in quant["weights"]:
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
              hidden_num: int) -> Dict[str, float]:
    """absmax activation scales over calibration batches (float forward)."""
    fwd = jax.jit(functools.partial(uae_forward, repeat_num=repeat_num,
                                    hidden_num=hidden_num,
                                    collect_stats=True))
    maxima: Dict[str, float] = {}
    for embs, pose in zip(embs_batches, pose_batches):
        _, _, stats = fwd(params, embs, pose)
        for k, v in stats.items():
            maxima[k] = max(maxima.get(k, 0.0), float(v))
    return {k: max(v, 1e-12) / 127.0 for k, v in maxima.items()}


class QuantizedGenerator:
    """Calibrated int8 UAE generator for inference."""

    def __init__(self, params, repeat_num: int, hidden_num: int):
        self.params = params
        self.repeat_num = repeat_num
        self.hidden_num = hidden_num
        self.quant: Optional[Dict] = None

    def calibrate(self, embs_batches, pose_batches) -> "QuantizedGenerator":
        act_scales = calibrate(self.params, embs_batches, pose_batches,
                               self.repeat_num, self.hidden_num)
        self.quant = {
            "weights": quantize_weights(self.params, self.repeat_num),
            "act_scales": {k: jnp.float32(v) for k, v in act_scales.items()},
        }
        return self

    def __call__(self, embs, pose):
        assert self.quant is not None, "calibrate() first"
        return uae_forward(self.params, embs, pose, self.repeat_num,
                           self.hidden_num, quant=self.quant)
