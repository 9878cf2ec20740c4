"""Winograd F(2x2, 3x3) convolution in the transform domain.

Purpose (round-2 perf work): the int8 generator is FLOP-bound at ~2/3 of
the chip's int8 peak (CLAUDE.md probes), and 5,000 img/s needs ~365 TOPS
effective — above what direct 3x3 convs reach. F(2x2,3x3) computes each
3x3 stride-1 conv with 2.25x fewer MACs as 16 batched matmuls
[N_tiles, Cin] @ [Cin, Cout], which map straight onto the MXU.

int8 scheme ("per-point" quantization): transform-domain activations U
get ONE scale per transform point p (16 scalars/layer, calibrated from
absmax like models/quant.py does for direct convs), weights get per-point
per-output-channel scales. Each U[p] is just another linear functional of
the input, so quantizing it at its own scale behaves like ordinary
per-tensor activation quantization; the output transform then mixes the
16 dequantized products with +-1 coefficients.

Float path is exact (tested == lax.conv); the int8 path's error is gated
by the same SSIM-delta criterion as the direct-int8 path.

No reference equivalent — the reference runs cuDNN defaults; this is the
TPU-native speed-of-light path for the decoder's big stride-1 convs.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# F(2x2, 3x3) transform matrices (Lavin & Gray 2016).
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


def transform_weights(kernel_hwio: jax.Array) -> jax.Array:
    """[3,3,Ci,Co] -> [16,Ci,Co] transform-domain weights V = G g G^T."""
    v = jnp.einsum("ai,ijcd,bj->abcd", jnp.asarray(G),
                   kernel_hwio.astype(jnp.float32), jnp.asarray(G))
    return v.reshape(16, *kernel_hwio.shape[2:])


def quantize_wino_weights(kernel_hwio: np.ndarray
                          ) -> Tuple[jax.Array, jax.Array]:
    """-> (w8 [16,Ci,Co] int8, w_scale [16,Co] f32), symmetric per
    (transform point, out channel)."""
    v = np.asarray(transform_weights(jnp.asarray(kernel_hwio)))
    scale = np.abs(v).max(axis=1) / 127.0          # [16, Co]
    scale = np.maximum(scale, 1e-12)
    w8 = np.clip(np.round(v / scale[:, None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(w8), jnp.asarray(scale.astype(np.float32))


def extract_tiles(x: jax.Array) -> jax.Array:
    """[B,H,W,C] (H,W even) -> overlapping 4x4 input tiles
    [B, H/2, W/2, 4, 4, C] with SAME padding for a 3x3 conv."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for a in range(4):
        cols = []
        for bb in range(4):
            cols.append(xp[:, a:a + h - 1:2, bb:bb + w - 1:2, :])
        rows.append(jnp.stack(cols, axis=3))
    return jnp.stack(rows, axis=3)  # [B, H/2, W/2, 4(a), 4(b), C]


def input_transform(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> U [16, N, C], N = B*(H/2)*(W/2). U = B^T d B — all
    +-1 adds, fused by XLA into the surrounding elementwise work."""
    b, h, w, c = x.shape
    d = extract_tiles(x.astype(jnp.float32))
    u = jnp.einsum("pa,znmabc,qb->pqznmc", jnp.asarray(BT), d,
                   jnp.asarray(BT))
    return u.reshape(16, b * (h // 2) * (w // 2), c)


def output_transform(m: jax.Array, b: int, h: int, w: int) -> jax.Array:
    """M [16, N, Co] (f32) -> y [B, H, W, Co] via A^T M A."""
    co = m.shape[-1]
    m4 = m.reshape(4, 4, b, h // 2, w // 2, co)
    y = jnp.einsum("ya,abznmc,xb->znymxc", jnp.asarray(AT), m4,
                   jnp.asarray(AT))
    return y.reshape(b, h, w, co)


def wino_conv(x: jax.Array, kernel_hwio: jax.Array,
              bias: Optional[jax.Array] = None) -> jax.Array:
    """Float reference path — numerically equal to
    lax.conv_general_dilated(x, k, (1,1), 'SAME') for even H, W."""
    b, h, w, _ = x.shape
    u = input_transform(x)
    v = transform_weights(kernel_hwio)
    m = jnp.einsum("pnc,pcd->pnd", u, v)
    y = output_transform(m, b, h, w)
    if bias is not None:
        y = y + bias
    return y


def wino_conv_int8(x: jax.Array, w8: jax.Array, w_scale: jax.Array,
                   u_scale: jax.Array, bias: Optional[jax.Array] = None
                   ) -> jax.Array:
    """int8 transform-domain conv.

    x: [B,H,W,C] float (bf16/f32) activations.
    w8: [16,Ci,Co] int8, w_scale: [16,Co], u_scale: [16] (calibrated
    absmax/127 of U per transform point).
    Returns f32 [B,H,W,Co] (bias added, no activation).
    """
    b, h, w, _ = x.shape
    u = input_transform(x)
    q = jnp.clip(jnp.round(u / u_scale[:, None, None]), -127, 127
                 ).astype(jnp.int8)
    m = jnp.einsum("pnc,pcd->pnd", q, w8,
                   preferred_element_type=jnp.int32)
    m = m.astype(jnp.float32) * (u_scale[:, None, None]
                                 * w_scale[:, None, :])
    y = output_transform(m, b, h, w)
    if bias is not None:
        y = y + bias
    return y


def calibrate_u_scales(x: jax.Array) -> jax.Array:
    """[16] absmax/127 of the input transform over a calibration batch."""
    u = input_transform(x)
    return jnp.maximum(jnp.max(jnp.abs(u), axis=(1, 2)), 1e-12) / 127.0
