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
from .generator import _constant_input_stem, _stem_bias_map

_REL = jax.nn.relu

# TPU layout pin for int8 activations: minor-to-major (C, B, W, H), i.e.
# channels in lanes and BATCH in sublanes. Measured on the v5e: XLA's
# conv emitter for this layout (EmitAllBatchInSublanes) runs the big
# generator convs at 364-390 int8 TOPS (92-99% of the 394 peak), while
# the batch-minor layout XLA otherwise propagates from the 18-channel
# pose / 3-channel RGB tensors forces EmitInputBatchInLanes at ~160-180
# TOPS on every full-resolution conv. Pinning costs nothing where the
# layout already matches.
_FAST_LAYOUT_MTM = (1, 2, 0, 3)  # major->minor H, W, B, C


def _pin_layout(x):
    """Constrain a 4D activation to the fast conv layout (TPU only)."""
    if x.ndim != 4 or jax.default_backend() != "tpu":
        return x
    from jax.experimental.layout import Layout, with_layout_constraint
    return with_layout_constraint(x, Layout(major_to_minor=_FAST_LAYOUT_MTM))


def _conv(x, kernel, bias=None, stride=1, prefer=None):
    out = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer)
    if bias is not None:
        out = out + bias
    return out


def _qconv(x, w8, w_scale, bias, s_x, stride=1, folded=False):
    """int8 conv: quantize activations, accumulate int32, dequantize.

    folded=True: s_x is a per-input-channel vector already folded into
    the quantized weights (w8 = quantize(kernel * s_x)), so the
    dequantization factor is w_scale alone."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
    q = _pin_layout(q.astype(jnp.int8))
    acc = jax.lax.conv_general_dilated(
        q, w8, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    factor = w_scale if folded else (s_x * w_scale)
    out = (acc.astype(jnp.float32) * factor + bias).astype(jnp.bfloat16)
    return _pin_layout(out)


def _head_scale(scale, c: int):
    """First-c-channels slice of a per-channel scale (identity on
    per-tensor scalars)."""
    return scale[:c] if getattr(scale, "ndim", 0) else scale


def _tail_scale(scale, c: int):
    """Last-c-channels slice of a per-channel scale (identity on
    per-tensor scalars)."""
    return scale[-c:] if getattr(scale, "ndim", 0) else scale


def _quantize(x, scale):
    """bf16/f32 -> s8 at a per-tensor scale, layout-pinned."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return _pin_layout(q.astype(jnp.int8))


def _qconv_raw(q8, w8, stride=1):
    """s8 conv -> s32 accumulator (no dequant)."""
    return jax.lax.conv_general_dilated(
        q8, w8, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


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
                calib_percentile: Optional[float] = None,
                calib_hist_ranges: Optional[Dict[str, float]] = None,
                calib_channel: bool = False,
                chained: bool = True):
    """Layer-by-layer UAEGenerator forward on raw params.

    quant=None, collect_stats=False  -> float forward (== module apply).
    collect_stats=True               -> also return {layer: absmax(input)}.
    quant={'weights': {name: (w8, w_scale)}, 'act_scales': {name: s}}
                                     -> int8 conv path + conv-then-upscale.
                                        A 'g_stem' weight entry (chained
                                        path only) runs the stem's pose
                                        conv in s8 — lossless on real
                                        {-1,+1} pose maps.
    chained=False forces the legacy per-layer-quant graph (bf16 tensors
    between layers) — the quality-analysis / A/B reference routing.
    """
    if quant is not None and chained and not collect_stats:
        return _uae_forward_int8(params, embs, pose, repeat_num, hidden_num,
                                 quant)

    stats: Dict[str, jax.Array] = {}
    dtype = jnp.bfloat16 if quant is not None else jnp.float32

    def record(name, x):
        if collect_stats:
            a = jnp.abs(x.astype(jnp.float32))
            if calib_channel:
                # per-input-channel absmax (folded into the weights by
                # quantize_weights; see calibrate granularity='channel')
                stats[name] = jnp.max(a, axis=(0, 1, 2))
                return
            if calib_hist_ranges is not None:
                # entropy-calibration pass 2: |x| histogram over the
                # pass-1 absmax range (scale picked by KL search later).
                # Uniform-bin scatter-add instead of jnp.histogram: the
                # searchsorted-based lowering reproducibly kernel-faults
                # the TPU worker on 64M-element activations (two crashes
                # at the same spot, r4). Strided subsample caps the
                # scatter at ~4M elements/layer — the KL threshold is a
                # distribution statistic, unaffected beyond noise.
                flat = a.ravel()
                stride = max(1, flat.size // (1 << 22))
                flat = flat[::stride]
                idx = jnp.clip(
                    (flat * (_HIST_BINS / calib_hist_ranges[name])
                     ).astype(jnp.int32), 0, _HIST_BINS - 1)
                stats[name] = jnp.zeros((_HIST_BINS,), jnp.int32
                                        ).at[idx].add(1)
                return
            # absmax by default; percentile clipping (e.g. 99.9) trades a
            # little saturation for finer quantization steps
            stats[name] = (jnp.max(a) if calib_percentile is None else
                           jnp.percentile(a, calib_percentile))

    def conv_apply(name, tree, x, stride=1, act=True):
        record(name, x)
        if quant is not None and name in quant["weights"]:
            w8, w_scale = quant["weights"][name]
            out = _qconv(x, w8, w_scale, tree["bias"].astype(jnp.float32),
                         quant["act_scales"][name], stride,
                         folded="act_folded" in quant)
        else:
            out = _conv(x.astype(dtype), tree["kernel"].astype(dtype),
                        tree["bias"].astype(dtype), stride)
        return _REL(out) if act else out

    # stem: pose conv + constant-embedding bias. The chained path runs it
    # int8 ('g_stem'); this legacy/stats path keeps it bf16/f32 but still
    # records the pose input stats so the chained table can be built.
    record("g_stem", pose)
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


def _uae_forward_int8(params, embs, pose, repeat_num: int, hidden_num: int,
                      quant: Dict):
    """s8-chained UAEGenerator inference.

    Same layer math as the legacy quant path in `uae_forward` (unit-tested
    against the flax module in float), but every inter-layer tensor that
    feeds a conv, a skip connection, or a residual add is stored ONCE as
    int8: each conv's epilogue fuses dequant+bias+ReLU+requant straight to
    the consumer's activation scale, skips are stored pre-quantized at
    their decoder consumer's scale, the decoder concat/residual tensor is
    a single s8 buffer, and NN-upsampling runs on s8 (it commutes with
    quantization). Measured on the v5e this removes the bf16
    upsample/concat/residual round-trips that cost ~5 ms/batch at bs256.

    Numerics: residual adds read the s8-quantized tensors (the legacy path
    read their bf16 parents) — an extra rounding on the residual path,
    covered by test_quant's error/SSIM gates.

    Exact-bf16 ISLANDS (fallback_mode='island'): layers absent from the
    weight table run as exact bf16 convs, and every tensor whose consumer
    is such a layer stays bf16 (no requantization inside a consecutive
    fallback run). An island therefore skips input, weight, and output
    rounding exactly like the legacy-routed fallback; the single rounding
    left is the island EXIT (the next int8 layer's own input quantize,
    which the legacy path pays too). The remaining legacy-vs-island
    difference is that skips/residuals outside islands still read s8.
    """
    s = quant["act_scales"]
    W = quant["weights"]
    folded = "act_folded" in quant  # per-channel scales folded into W
    # downsample-input scales pinned to their skip's decoder tail scale
    # (calibrate() + QuantizedGenerator only) -> single-store is exact
    pinned = "act_pinned" in quant

    def for_consumer(x_bf, consumer, scale):
        """Store an activation for `consumer`: s8 at `scale`, or bf16
        pass-through when the consumer runs exact-bf16 (island)."""
        if consumer not in W:
            return _pin_layout(x_bf.astype(jnp.bfloat16))
        return _quantize(x_bf, scale)

    def qconv(name, tree, q8, stride=1, relu=True, out_scale=None,
              res8=None, res_scale=None, out_name=None):
        """s8/bf16 conv + fused epilogue.

        Input dtype dispatch: s8 input is the chained default; a floating
        input means the producer was a fallback island. out_scale given ->
        returns s8 quantized at out_scale, UNLESS `out_name` (the consumer
        layer) is itself a fallback layer — then bf16 passes through.
        res8/res_scale -> adds the (dequantized if s8) residual after the
        ReLU.

        A layer absent from the weight table (QuantizedGenerator
        `bf16_layers` fallback) runs the exact bf16 conv: it dequantizes
        an s8 input (island entry) or consumes a bf16 input directly
        (inside an island).
        """
        floating_in = jnp.issubdtype(q8.dtype, jnp.floating)
        if name not in W:  # selective bf16 fallback
            x_bf = (q8 if floating_in
                    else (q8.astype(jnp.float32) * s[name])
                    .astype(jnp.bfloat16))
            y = _conv(_pin_layout(x_bf.astype(jnp.bfloat16)),
                      tree["kernel"].astype(jnp.bfloat16),
                      stride=stride).astype(jnp.float32) \
                + tree["bias"].astype(jnp.float32)
        else:
            if floating_in:  # island exit: quantize at this layer's scale
                q8 = _quantize(q8, s[name])
            w8, w_scale = W[name]
            acc = _qconv_raw(q8, w8, stride)
            factor = w_scale if folded else (s[name] * w_scale)
            y = (acc.astype(jnp.float32) * factor
                 + tree["bias"].astype(jnp.float32))
        if relu:
            y = _REL(y)
        if res8 is not None:
            if jnp.issubdtype(res8.dtype, jnp.floating):
                y = y + res8.astype(jnp.float32)
            else:
                y = y + res8.astype(jnp.float32) * res_scale
        if out_scale is None or (out_name is not None and out_name not in W):
            return _pin_layout(y.astype(jnp.bfloat16))
        return _quantize(y, out_scale)

    enc_names = [n for _, n in enc_layer_names(repeat_num)]
    dec_names = [n for _, n in dec_layer_names(repeat_num)]
    # scale of the concat consumed by decoder block idx's first conv
    dec_a_scale = [s[f"dec/{dec_names[3 * i]}"] for i in range(repeat_num)]

    # stem: pose conv + constant-embedding bias map. Rendered pose maps
    # are exactly {-1,+1} (ops/pose.py render_pose_maps), so their absmax
    # is 1 and the s8 quantization at the calibrated scale is LOSSLESS —
    # the int8 stem's only error is weight rounding, like every other
    # layer. The bias map stays float and fuses into the conv epilogue.
    if "g_stem" in W:
        _, h, w, _ = pose.shape
        w8, w_scale = W["g_stem"]
        q8 = _quantize(pose, s["g_stem"])
        acc = _qconv_raw(q8, w8)
        factor = w_scale if folded else (s["g_stem"] * w_scale)
        x_bf = _REL(acc.astype(jnp.float32) * factor
                    + _stem_bias_map(params["stem_kernel"],
                                     params["stem_bias"], embs, h, w,
                                     jnp.float32))
    else:
        x_bf = _REL(_constant_input_stem(params["stem_kernel"],
                                         params["stem_bias"], embs, pose,
                                         jnp.bfloat16))
    q = for_consumer(x_bf, f"enc/{enc_names[0]}", s[f"enc/{enc_names[0]}"])

    enc = params["ConvBlockTower_0"]
    skips = []
    ni = 0
    for idx in range(repeat_num):
        na, nb = enc_names[ni], enc_names[ni + 1]
        s_a = s[f"enc/{na}"]
        q_mid = qconv(f"enc/{na}", enc[na], q, out_scale=s[f"enc/{nb}"],
                      out_name=f"enc/{nb}")
        ni += 2
        dec_consumer = f"dec/{dec_names[3 * (repeat_num - 1 - idx)]}"
        last = idx == repeat_num - 1
        nd = None if last else f"enc/{enc_names[ni]}"
        # Shared single store: under folded per-channel calibration the
        # downsample conv's input scale is PINNED to the skip's tail
        # slice of the decoder concat scale (see calibrate()), so
        # conv_b's epilogue emits ONE s8 buffer consumed by both the
        # skip and the stride-2 conv. Measured wall-clock NEUTRAL at
        # bs512 (4449.6 vs 4448.4 img/s) — the conv_b fusion's extra
        # time vs conv_a is the emitter's fused-epilogue schedule, not
        # the stores — kept because it drops a full-res bf16 store + a
        # quantize pass per block and skips one bf16 rounding (conv_b's
        # f32 result quantizes directly; test_quant shared-store gates).
        if pinned and not last and dec_consumer in W and nd in W:
            # conv_b epilogue fuses the residual add (res = block input)
            # and quantizes once at the shared scale
            r8 = qconv(f"enc/{nb}", enc[nb], q_mid, res8=q, res_scale=s_a,
                       out_scale=s[nd], out_name=nd)
            skips.append(r8)
            r_bf = None
            q = qconv(nd, enc[enc_names[ni]], r8, stride=2,
                      out_scale=s[f"enc/{enc_names[ni + 1]}"],
                      out_name=f"enc/{enc_names[ni + 1]}")
            ni += 1
            continue
        # conv_b epilogue fuses the residual add (res = block input, s8)
        r_bf = qconv(f"enc/{nb}", enc[nb], q_mid, res8=q, res_scale=s_a)
        # skip stored once, at its decoder consumer's concat scale (the
        # TAIL channels of the concat: [upsampled-z, skip])
        skips.append(for_consumer(r_bf, dec_consumer, _tail_scale(
            dec_a_scale[repeat_num - 1 - idx], r_bf.shape[-1])))
        if not last:
            q_d = for_consumer(r_bf, nd, s[nd])
            q = qconv(nd, enc[enc_names[ni]], q_d, stride=2,
                      out_scale=s[f"enc/{enc_names[ni + 1]}"],
                      out_name=f"enc/{enc_names[ni + 1]}")
            ni += 1

    b, h_min, w_min, _ = r_bf.shape
    flat = r_bf.reshape(b, -1).astype(jnp.bfloat16)
    z = flat @ params["bottleneck"]["kernel"].astype(jnp.bfloat16) \
        + params["bottleneck"]["bias"].astype(jnp.bfloat16)
    xu = z @ params["unbottleneck"]["kernel"].astype(jnp.bfloat16) \
        + params["unbottleneck"]["bias"].astype(jnp.bfloat16)
    x_bf = xu.reshape(b, h_min, w_min, hidden_num)

    ni = 0
    for idx in range(repeat_num):
        na, nb = dec_names[ni], dec_names[ni + 1]
        s_a = dec_a_scale[idx]
        u8 = (for_consumer(x_bf, f"dec/{na}",
                           _head_scale(s_a, x_bf.shape[-1]))
              if idx == 0 else z8)
        cat8 = _pin_layout(jnp.concatenate(
            [u8, skips[repeat_num - 1 - idx]], axis=-1))
        q_mid = qconv(f"dec/{na}", params[na], cat8,
                      out_scale=s[f"dec/{nb}"], out_name=f"dec/{nb}")
        ni += 2
        if idx < repeat_num - 1:
            nu = dec_names[ni]
            r8 = qconv(f"dec/{nb}", params[nb], q_mid, res8=cat8,
                       res_scale=s_a, out_scale=s[f"dec/{nu}"],
                       out_name=f"dec/{nu}")
            # 1x1 conv BEFORE the NN upsample (exact commute, 4x fewer
            # FLOPs), requantized at the next block's concat scale (its
            # HEAD channels) and upsampled in s8
            nxt = f"dec/{dec_names[3 * (idx + 1)]}"
            z8_half = qconv(f"dec/{nu}", params[nu], r8,
                            out_scale=_head_scale(
                                dec_a_scale[idx + 1],
                                params[nu]["kernel"].shape[-1]),
                            out_name=nxt)
            z8 = upscale_nn(z8_half, 2)
            ni += 1
        else:
            r8 = qconv(f"dec/{nb}", params[nb], q_mid, res8=cat8,
                       res_scale=s_a, out_scale=s["to_rgb"],
                       out_name="to_rgb")

    # int8 to_rgb: tiny FLOPs, but the s8 path lets dec_b's epilogue emit
    # s8 instead of a bf16 round-trip (profiled ~2.4 ms/batch at bs256)
    if "to_rgb" in W:
        w8, w_scale = W["to_rgb"]
        acc = _qconv_raw(r8, w8)
        factor = w_scale if folded else (s["to_rgb"] * w_scale)
        out = (acc.astype(jnp.float32) * factor
               + params["to_rgb"]["bias"].astype(jnp.float32))
    else:
        x_rgb = (r8.astype(jnp.float32) if
                 jnp.issubdtype(r8.dtype, jnp.floating)
                 else r8.astype(jnp.float32) * s["to_rgb"])
        out = _conv(x_rgb,
                    params["to_rgb"]["kernel"].astype(jnp.float32),
                    params["to_rgb"]["bias"].astype(jnp.float32))
    return out.astype(jnp.float32), z


def uae_forward_bf16(params, embs, pose, repeat_num: int, hidden_num: int):
    """Layout-pinned bf16 UAEGenerator forward on raw params.

    Same math as the flax module at dtype=bf16 (mirrors the unit-tested
    float path), but every activation is pinned to the fast conv layout —
    the module path inherits batch-minor layouts from the pose/RGB
    tensors and loses ~20% (measured 1922 -> 2311 img/s at bs256 on the
    v5e). This is the testers' default (bf16) inference path.
    """
    dt = jnp.bfloat16

    def conv(tree, x, stride=1, act=True):
        out = jax.lax.conv_general_dilated(
            _pin_layout(x.astype(dt)), tree["kernel"].astype(dt),
            (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + tree["bias"].astype(dt)
        if act:
            out = _REL(out)
        return _pin_layout(out)

    x = _REL(_constant_input_stem(params["stem_kernel"],
                                  params["stem_bias"], embs, pose, dt))
    enc = params["ConvBlockTower_0"]
    names = [n for _, n in enc_layer_names(repeat_num)]
    skips, ni = [], 0
    for idx in range(repeat_num):
        res = x
        x = conv(enc[names[ni]], x); ni += 1
        x = conv(enc[names[ni]], x); ni += 1
        x = _pin_layout(x + res)
        skips.append(x)
        if idx < repeat_num - 1:
            x = conv(enc[names[ni]], x, stride=2); ni += 1

    b, h_min, w_min, _ = x.shape
    flat = x.reshape(b, -1).astype(dt)
    z = flat @ params["bottleneck"]["kernel"].astype(dt) \
        + params["bottleneck"]["bias"].astype(dt)
    xu = z @ params["unbottleneck"]["kernel"].astype(dt) \
        + params["unbottleneck"]["bias"].astype(dt)
    x = xu.reshape(b, h_min, w_min, hidden_num)

    names = [n for _, n in dec_layer_names(repeat_num)]
    ni = 0
    for idx in range(repeat_num):
        x = _pin_layout(jnp.concatenate(
            [x, skips[repeat_num - 1 - idx].astype(x.dtype)], axis=-1))
        res = x
        x = conv(params[names[ni]], x); ni += 1
        x = conv(params[names[ni]], x); ni += 1
        x = _pin_layout(x + res)
        if idx < repeat_num - 1:
            # 1x1 conv BEFORE the NN upsample (exact commute)
            x = conv(params[names[ni]], x); ni += 1
            x = upscale_nn(x, 2)

    out = conv(params["to_rgb"], x, act=False)
    return out.astype(jnp.float32), z


def _quantize_kernel(kernel, act_scale=None):
    """Per-output-channel symmetric int8 weight quantization.
    act_scale: per-input-channel activation scale folded in BEFORE
    quantization — then `acc * w_scale` alone dequantizes the conv
    exactly (the s_ci sits inside the channel sum and cannot be applied
    post-hoc)."""
    k = np.asarray(kernel, np.float32)
    if act_scale is not None:
        k = k * np.asarray(act_scale, np.float32)[None, None, :, None]
    scale = np.abs(k).reshape(-1, k.shape[-1]).max(0) / 127.0
    scale = np.maximum(scale, 1e-12)
    w8 = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return jnp.asarray(w8), jnp.asarray(scale.astype(np.float32))


def quantize_weights(params, repeat_num: int,
                     fold_act_scales: Optional[Dict] = None,
                     emb_dim: Optional[int] = None) -> Dict:
    """int8 weights for all tower/decoder convs, to_rgb, and — when
    `emb_dim` is given — the stem's pose-part kernel ('g_stem'; the
    constant-embedding part stays float, see _stem_bias_map). The denses
    stay float. See _quantize_kernel for the optional per-channel
    activation-scale fold."""
    weights = {}
    q = _quantize_kernel
    fold = fold_act_scales or {}
    for _, name in enc_layer_names(repeat_num):
        weights[f"enc/{name}"] = q(params["ConvBlockTower_0"][name]["kernel"],
                                   fold.get(f"enc/{name}"))
    for _, name in dec_layer_names(repeat_num):
        weights[f"dec/{name}"] = q(params[name]["kernel"],
                                   fold.get(f"dec/{name}"))
    weights["to_rgb"] = q(params["to_rgb"]["kernel"], fold.get("to_rgb"))
    if emb_dim is not None:
        weights["g_stem"] = q(params["stem_kernel"][:, :, emb_dim:, :],
                              fold.get("g_stem"))
    return weights


_HIST_BINS = 512  # entropy-calibration histogram resolution


def _kl_threshold_scale(hist: np.ndarray, amax: float,
                        num_quant: int = 128) -> float:
    """Entropy (KL-divergence) calibration à la TensorRT: pick the |x|
    clip threshold whose `num_quant`-level quantized distribution is
    closest (min KL) to the observed one, and return threshold/127 as
    the activation scale. Clips rare outliers in exchange for finer
    quantization steps where the mass is."""
    hist = np.asarray(hist, np.float64)
    if hist.sum() == 0 or amax <= 0:
        return max(amax, 1e-12) / 127.0
    bin_w = amax / len(hist)
    best_kl, best_i = np.inf, len(hist)
    for i in range(num_quant, len(hist) + 1):
        p = hist[:i].copy()
        p[i - 1] += hist[i:].sum()       # outliers clip into the edge bin
        # redistribute the first i bins over num_quant quantized levels
        q = np.zeros(i)
        chunk = i / num_quant
        for j in range(num_quant):
            lo = int(np.floor(j * chunk))
            hi = min(int(np.ceil((j + 1) * chunk)), i)
            seg = hist[lo:hi]
            nz = seg > 0
            if nz.any():
                q[lo:hi][nz] = seg.sum() / nz.sum()
        psum, qsum = p.sum(), q.sum()
        if psum == 0 or qsum == 0:
            continue
        p /= psum
        q /= qsum
        m = p > 0
        kl = float(np.sum(p[m] * np.log(p[m] / np.maximum(q[m], 1e-12))))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return max((best_i + 0.5) * bin_w, 1e-12) / 127.0


def calibrate(params, embs_batches, pose_batches, repeat_num: int,
              hidden_num: int,
              calib_percentile: Optional[float] = None,
              calib_method: str = "absmax",
              calib_granularity: str = "tensor") -> Dict[str, np.ndarray]:
    """Activation scales over calibration batches (float forward).

    calib_method: 'absmax' (default), 'percentile' (uses
    `calib_percentile`, e.g. 99.9), or 'entropy' (two passes: absmax
    ranges, then |x| histograms + KL threshold search per layer).
    calib_granularity: 'tensor' (default) or 'channel' (per-input-channel
    absmax vectors; fold into the weights via quantize_weights)."""
    if calib_percentile is not None and calib_method == "absmax":
        calib_method = "percentile"
    if calib_method not in ("absmax", "percentile", "entropy"):
        raise ValueError(f"unknown calib_method {calib_method!r}")
    if calib_method == "percentile" and calib_percentile is None:
        raise ValueError("calib_method='percentile' needs calib_percentile")
    if calib_method == "entropy" and calib_percentile is not None:
        # the KL search needs the FULL |x| range in pass 1 — histograms
        # over a percentile-truncated range silently drop the outlier
        # mass the edge bin is supposed to absorb (jnp.histogram ignores
        # out-of-range values)
        raise ValueError("calib_method='entropy' is mutually exclusive "
                         "with calib_percentile")
    if calib_granularity not in ("tensor", "channel"):
        raise ValueError(f"unknown calib_granularity {calib_granularity!r}")
    per_channel = calib_granularity == "channel"
    if per_channel and calib_method != "absmax":
        raise ValueError("granularity='channel' supports absmax only "
                         "(no percentile/entropy)")
    fwd = jax.jit(functools.partial(uae_forward, repeat_num=repeat_num,
                                    hidden_num=hidden_num,
                                    collect_stats=True,
                                    calib_percentile=calib_percentile,
                                    calib_channel=per_channel))
    maxima: Dict[str, np.ndarray] = {}
    for embs, pose in zip(embs_batches, pose_batches):
        _, _, stats = fwd(params, embs, pose)
        for k, v in stats.items():
            v = np.asarray(v)
            maxima[k] = np.maximum(maxima.get(k, 0.0), v)
    if per_channel:
        scales = {k: (np.maximum(v, 1e-12) / 127.0).astype(np.float32)
                  for k, v in maxima.items()}
        # Pin each downsample conv's input scale to the tail slice of its
        # skip's decoder-consumer concat scale. Both vectors measure the
        # per-channel absmax of the SAME float tensor (the encoder block
        # output feeds the stride-2 conv directly and reappears as the
        # tail channels of the decoder concat), so they are already equal;
        # pinning makes them equal by construction, which lets the chained
        # graph store that tensor ONCE as s8 (skip == downsample input)
        # instead of quantizing it at two scales — the round-3 trace showed
        # the dual-store epilogue costs ~2x the single-store conv_b.
        enc_n = [n for _, n in enc_layer_names(repeat_num)]
        dec_n = [n for _, n in dec_layer_names(repeat_num)]
        ni = 2
        for idx in range(repeat_num - 1):
            nd = f"enc/{enc_n[ni]}"
            ni += 3
            dec_c = f"dec/{dec_n[3 * (repeat_num - 1 - idx)]}"
            if nd in scales and dec_c in scales:
                c = scales[nd].shape[-1]
                scales[nd] = scales[dec_c][..., -c:]
        return scales
    scales = {k: float(np.maximum(v, 1e-12)) / 127.0
              for k, v in maxima.items()}
    if calib_method == "entropy":
        ranges = {k: float(np.maximum(v, 1e-12)) for k, v in maxima.items()}
        fwd_h = jax.jit(functools.partial(
            uae_forward, repeat_num=repeat_num, hidden_num=hidden_num,
            collect_stats=True, calib_hist_ranges=ranges))
        hists: Dict[str, np.ndarray] = {}
        for embs, pose in zip(embs_batches, pose_batches):
            _, _, stats = fwd_h(params, embs, pose)
            for k, v in stats.items():
                hists[k] = hists.get(k, 0) + np.asarray(v)
        scales = {k: _kl_threshold_scale(h, ranges[k])
                  for k, h in hists.items()}
    return scales


class QuantizedGenerator:
    """Calibrated int8 UAE generator for inference.

    (A transform-domain Winograd int8 path was built, measured 10x SLOWER
    end-to-end than direct int8 on the v5e — 363 vs 4,452 img/s, see
    docs/BENCH_NOTES.md — and removed in round 5.)

    bf16_layers: layer names ('enc/Conv_0' … 'dec/Conv_13', 'to_rgb') to
    run as exact bf16 convs inside the otherwise-int8 graph — a selective
    quality fallback for the most error-contributing layers (rank them
    with `scripts/int8_quality.py check --per_layer`). Implemented by
    omitting the layer from the weight table. Two routings:

    fallback_mode='legacy': a non-empty fallback set routes
    __call__ through the LEGACY per-layer-quant graph (bf16 inter-layer
    tensors), where a fallback layer skips input, weight, and output
    rounding entirely — measured on a random net the decoder-tail
    fallback halves mean|err| vs float and an all-layers fallback reaches
    the bf16-rounding floor — at the cost of the chained path's ~10%
    throughput.

    fallback_mode='island' (default — at the 20k-step quality sweep the
    island tail-fallback matched legacy quality, SSIM(int8,float) 0.9634
    vs 0.9641 with the same to-target delta; throughput vs legacy is
    neutral for the decoder-tail fallback, 3294 vs 3373 img/s bs512,
    since the bf16 fallback convs dominate — island wins for cheap
    fallback layers because full legacy routing costs ~19% even
    all-int8): keep the s8-chained graph and run the
    fallback layers as exact-bf16 ISLANDS inside it — tensors between
    consecutive fallback layers stay bf16 (no requantization), so an
    island skips input+weight+output rounding like the legacy routing;
    the only extra rounding left vs legacy is that skips/residuals
    OUTSIDE the island still read s8-stored tensors. Retains chained
    throughput.

    calib_granularity='channel': per-input-channel activation scales,
    folded into the weights before their own quantization (the fold is
    exact — a uniform vector reproduces the per-tensor path bitwise), so
    the chained graph and its throughput are unchanged while outlier
    channels stop dictating the whole tensor's step size. This is the
    CLI/config default (--int8_calibration=channel): on TPU-trained
    checkpoints it measured SSIM(int8,float) 0.9941@2k / 0.9865@20k
    training steps vs per-tensor absmax's 0.9457 / 0.7758, with
    to-target delta +0.0000 at both depths and identical throughput
    (4512 vs 4456 img/s, within noise). The constructor keeps
    per-tensor absmax as its low-level default so calibration choices
    stay explicit in library code.
    """

    def __init__(self, params, repeat_num: int, hidden_num: int,
                 calib_percentile: Optional[float] = None,
                 bf16_layers: frozenset = frozenset(),
                 calib_method: str = "absmax",
                 calib_granularity: str = "tensor",
                 fallback_mode: str = "island"):
        self.params = params
        self.repeat_num = repeat_num
        self.hidden_num = hidden_num
        self.calib_percentile = calib_percentile
        self.calib_method = calib_method
        self.calib_granularity = calib_granularity
        self.bf16_layers = frozenset(bf16_layers)
        assert fallback_mode in ("legacy", "island"), fallback_mode
        self.fallback_mode = fallback_mode
        self.quant: Optional[Dict] = None

    def calibrate(self, embs_batches, pose_batches) -> "QuantizedGenerator":
        per_channel = self.calib_granularity == "channel"
        act_scales = calibrate(
            self.params, embs_batches, pose_batches, self.repeat_num,
            self.hidden_num,
            calib_percentile=self.calib_percentile,
            calib_method=self.calib_method,
            calib_granularity=self.calib_granularity)
        weights = quantize_weights(
            self.params, self.repeat_num,
            fold_act_scales=act_scales if per_channel else None,
            emb_dim=int(embs_batches[0].shape[-1]))
        valid = set(weights)
        unknown = self.bf16_layers - valid
        if unknown:
            raise ValueError(f"unknown bf16_layers {sorted(unknown)}; "
                             f"valid names: {sorted(valid)}")
        for name in self.bf16_layers:
            weights.pop(name)  # absent from the table -> bf16 branch
        self.quant = {
            "weights": weights,
            "act_scales": {k: jnp.asarray(v, jnp.float32)
                           for k, v in act_scales.items()},
        }
        if per_channel:
            # key presence flags folded dequantization (acc * w_scale
            # alone); value is a dummy array so the dict stays a pytree
            self.quant["act_folded"] = jnp.int8(1)
            # calibrate() pinned each downsample conv's input scale to
            # its skip's decoder tail scale -> the chained graph may
            # store that tensor once (shared skip/downsample s8 buffer)
            self.quant["act_pinned"] = jnp.int8(1)
        return self

    def __call__(self, embs, pose):
        assert self.quant is not None, "calibrate() first"
        chained = (not self.bf16_layers
                   or self.fallback_mode == "island")
        return uae_forward(self.params, embs, pose, self.repeat_num,
                           self.hidden_num, quant=self.quant,
                           chained=chained)


# --------------------------------------------------------------- encoder
def _tower(conv_apply, tree, x, repeat_num, prefix):
    """ConvBlockTower mirror (no skips) on raw params."""
    ni = 0
    names = enc_layer_names(repeat_num)
    for idx in range(repeat_num):
        res = x
        x = conv_apply(f"{prefix}/{names[ni][1]}", tree[names[ni][1]], x)
        ni += 1
        x = conv_apply(f"{prefix}/{names[ni][1]}", tree[names[ni][1]], x)
        ni += 1
        x = x + res
        if idx < repeat_num - 1:
            x = conv_apply(f"{prefix}/{names[ni][1]}", tree[names[ni][1]],
                           x, stride=2)
            ni += 1
    return x


def roi_fgbg_forward(params, x, fg_mask, part_bbox, part_vis,
                     repeat_num: int, hidden_num: int,
                     part_num: int = 7, roi_size: int = 48,
                     quant: Optional[Dict] = None,
                     collect_stats: bool = False,
                     calib_channel: bool = False):
    """Layer-by-layer RoiEncoderFgBg forward on raw params (int8-capable).

    Float path is unit-tested equal to the flax module; with `quant` the
    stem's two wide convs and both towers run int8 (per-tensor activation
    scales, per-channel weights). The MXU interpolation-matrix crops stay
    f32 — they are <1% of encoder FLOPs. This is the transfer-path
    (model 12, tester.py:616-767) speed lever: the encoder is ~45% of the
    path's MACs.
    """
    from ..ops.crop import crop_body_rois_mm
    stats: Dict[str, jax.Array] = {}
    dtype = jnp.bfloat16 if quant is not None else jnp.float32

    def record(name, v):
        if collect_stats:
            a = jnp.abs(v.astype(jnp.float32))
            stats[name] = (jnp.max(a, axis=(0, 1, 2)) if calib_channel
                           else jnp.max(a))

    def conv_apply(name, tree, v, stride=1, act=True):
        record(name, v)
        if quant is not None and name in quant["weights"]:
            w8, w_scale = quant["weights"][name]
            out = _qconv(v, w8, w_scale, tree["bias"].astype(jnp.float32),
                         quant["act_scales"][name], stride,
                         folded="act_folded" in quant)
        else:
            out = _conv(v.astype(dtype), tree["kernel"].astype(dtype),
                        tree["bias"].astype(dtype), stride)
        return _REL(out) if act else out

    stem = params["_Stem_0"]
    x = conv_apply("stem/Conv_0", stem["Conv_0"], x.astype(dtype))
    res = x
    x = conv_apply("stem/Conv_1", stem["Conv_1"], x)
    x = conv_apply("stem/Conv_2", stem["Conv_2"], x)
    x = x + res

    m = fg_mask.astype(x.dtype)
    x_fg = x * m
    x_bg = x * (1.0 - m)

    rois = crop_body_rois_mm(x_fg, part_bbox, roi_size).astype(dtype)
    fg = _tower(conv_apply, params["fg_tower"]["ConvBlockTower_0"], rois,
                repeat_num, "fg")
    fg = fg.reshape(fg.shape[0], -1).astype(dtype)
    fg = fg @ params["fg_tower"]["Dense_0"]["kernel"].astype(dtype) \
        + params["fg_tower"]["Dense_0"]["bias"].astype(dtype)

    pb, z = fg.shape
    b = pb // part_num
    fea = fg.reshape(part_num, b, z)
    if part_vis is not None:
        fea = fea * part_vis.astype(fea.dtype).T[:, :, None]
    fg = jnp.transpose(fea, (1, 0, 2)).reshape(b, part_num * z)

    bg = _tower(conv_apply, params["bg_tower"], x_bg, repeat_num, "bg")
    bg = bg.reshape(bg.shape[0], -1).astype(dtype)
    bg = bg @ params["bg_fc"]["kernel"].astype(dtype) \
        + params["bg_fc"]["bias"].astype(dtype)

    out = jnp.concatenate([fg, bg], axis=-1).astype(jnp.float32)
    if collect_stats:
        return out, stats
    return out


def quantize_encoder_weights(params, repeat_num: int,
                             fold_act_scales: Optional[Dict] = None) -> Dict:
    """int8 weights for the FgBg encoder's stem + both towers; see
    _quantize_kernel for the optional per-channel fold."""
    weights = {}
    fold = fold_act_scales or {}
    q = _quantize_kernel

    # stem/Conv_0 (3->hidden) is tiny and int8 gains nothing: keep f32
    for i in range(1, 3):
        weights[f"stem/Conv_{i}"] = q(params["_Stem_0"][f"Conv_{i}"]["kernel"],
                                      fold.get(f"stem/Conv_{i}"))
    for _, name in enc_layer_names(repeat_num):
        weights[f"fg/{name}"] = q(
            params["fg_tower"]["ConvBlockTower_0"][name]["kernel"],
            fold.get(f"fg/{name}"))
        weights[f"bg/{name}"] = q(params["bg_tower"][name]["kernel"],
                                  fold.get(f"bg/{name}"))
    return weights


class QuantizedEncoder:
    """Calibrated int8 RoiEncoderFgBg for inference (transfer path).

    bf16_layers: encoder conv names ('stem/Conv_1..2', 'fg/Conv_*',
    'bg/Conv_*') to keep as exact bf16 convs — the encoder graph carries
    bf16 between layers, so omitting a layer from the weight table skips
    its input/weight/output rounding entirely (same quality semantics as
    the generator's legacy-routed fallback).
    """

    def __init__(self, params, repeat_num: int, hidden_num: int,
                 roi_size: int = 48, part_num: int = 7,
                 bf16_layers: frozenset = frozenset(),
                 calib_granularity: str = "tensor"):
        if calib_granularity not in ("tensor", "channel"):
            raise ValueError(
                f"unknown calib_granularity {calib_granularity!r}")
        self.params = params
        self.repeat_num = repeat_num
        self.hidden_num = hidden_num
        self.roi_size = roi_size
        self.part_num = part_num
        self.bf16_layers = frozenset(bf16_layers)
        self.calib_granularity = calib_granularity
        self.quant: Optional[Dict] = None

    def calibrate(self, batches) -> "QuantizedEncoder":
        """batches: iterable of (x, fg_mask, part_bbox, part_vis)."""
        per_channel = self.calib_granularity == "channel"
        fwd = jax.jit(functools.partial(
            roi_fgbg_forward, repeat_num=self.repeat_num,
            hidden_num=self.hidden_num, roi_size=self.roi_size,
            part_num=self.part_num, collect_stats=True,
            calib_channel=per_channel))
        maxima: Dict[str, np.ndarray] = {}
        for (x, mask, bbox, vis) in batches:
            _, stats = fwd(self.params, x, mask, bbox, vis)
            for k, v in stats.items():
                maxima[k] = np.maximum(maxima.get(k, 0.0), np.asarray(v))
        act_scales = {k: jnp.asarray(np.maximum(v, 1e-12) / 127.0,
                                     jnp.float32)
                      for k, v in maxima.items()}
        weights = quantize_encoder_weights(
            self.params, self.repeat_num,
            fold_act_scales=act_scales if per_channel else None)
        unknown = self.bf16_layers - set(weights)
        if unknown:
            raise ValueError(f"unknown bf16_layers {sorted(unknown)}; "
                             f"valid names: {sorted(weights)}")
        for name in self.bf16_layers:
            weights.pop(name)  # absent from the table -> bf16 branch
        self.quant = {
            "weights": weights,
            "act_scales": act_scales,
        }
        if per_channel:
            self.quant["act_folded"] = jnp.int8(1)
        return self

    def __call__(self, x, fg_mask, part_bbox, part_vis):
        assert self.quant is not None, "calibrate() first"
        return roi_fgbg_forward(self.params, x, fg_mask, part_bbox,
                                part_vis, self.repeat_num, self.hidden_num,
                                roi_size=self.roi_size,
                                part_num=self.part_num, quant=self.quant)
