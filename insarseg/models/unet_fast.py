"""Fused-kernel UNet inference path.

Consumes the exact parameter tree of :class:`insarseg.models.unet.UNet` but
executes eval-mode forward with the hand-fused Pallas kernels:

- every DoubleConv becomes two ``conv3x3_bn_relu`` calls with BN folded into
  the epilogue (insarseg.ops.fold) — BN never round-trips HBM;
- SE tails use the fused ``se_scale`` stream kernel;
- pooling / transposed-conv / concat / 1x1 head remain lax ops (XLA already
  emits optimal code for them).

Numerically equivalent to ``UNet.apply(..., train=False)`` (tested in
interpret mode on CPU and on TPU, maxdiff ~1e-3 in bf16).

**RETIRED from the serving surface (round 2)** — kept as a tests-only
validation artifact for the Pallas kernels (tests/test_pallas.py).
Final measurements on TPU v5e (batch 16, 512^2, bf16): the XLA path runs
59.9 ms / 267 tiles/s vs 143 ms for this fused path. Per-kernel
(8x512^2x64->64): XLA 6.0 ms; pallas 10.7 ms serial-DMA, 9.06 ms
double-buffered. The round-2 jax.profiler traces (BASELINE.md "Speed of
light") settled the question: XLA's *in-graph* conv emitters run the hot
convs at 75-93 TF/s bf16 (far above what the isolated probes suggested),
so the hand conv kernel cannot win and the fast serving paths went a
different way — exact deferred-SE graph restructuring (unet_serve.py,
411 tiles/s/chip) and int8 PTQ (unet_int8.py, 602 tiles/s/chip).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from insarseg.ops.fold import fold_bn
from insarseg.ops.layers import max_pool_2d
from insarseg.ops.pallas import conv3x3_bn_relu, se_scale
from insarseg.ops.resize import resize_bilinear


def _double_conv(p: Dict, s: Dict, y: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    sc1, b1 = fold_bn(p["bn1"], s["bn1"], p["conv1"].get("bias"))
    y = conv3x3_bn_relu(y, p["conv1"]["kernel"], sc1, b1, interpret=interpret)
    sc2, b2 = fold_bn(p["bn2"], s["bn2"], p["conv2"].get("bias"))
    y = conv3x3_bn_relu(y, p["conv2"]["kernel"], sc2, b2, interpret=interpret)
    if "se" in p:
        y = se_scale(y, p["se"]["fc1"]["kernel"], p["se"]["fc2"]["kernel"],
                     interpret=interpret)
    return y


def _conv_transpose(p: Dict, y: jnp.ndarray) -> jnp.ndarray:
    k = jnp.flip(p["kernel"], axis=(0, 1)).astype(y.dtype)
    kh = k.shape[0]
    out = lax.conv_general_dilated(
        y, k, window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kh - 1, kh - 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        out = out + p["bias"].astype(y.dtype)
    return out


def _conv1x1(p: Dict, y: jnp.ndarray) -> jnp.ndarray:
    out = jnp.einsum("bhwc,co->bhwo", y, p["kernel"][0, 0].astype(y.dtype))
    if "bias" in p:
        out = out + p["bias"].astype(y.dtype)
    return out


def _spatial_attention_dc(p: Dict, s: Dict, y: jnp.ndarray,
                          interpret: bool) -> jnp.ndarray:
    m = jnp.concatenate(
        [jnp.mean(y, axis=-1, keepdims=True), jnp.max(y, axis=-1, keepdims=True)],
        axis=-1,
    )
    m = _double_conv(p["compress_and_map"], s["compress_and_map"], m, interpret)
    return y * jax.nn.sigmoid(m.astype(jnp.float32)).astype(y.dtype)


def unet_fused_apply(
    variables: Dict[str, Any],
    x: jnp.ndarray,
    use_sa: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Eval-mode UNet forward over fused kernels. ``variables`` is the
    {'params', 'batch_stats'} tree of insarseg.models.unet.UNet (SE presence
    is auto-detected from the tree; pass ``use_sa`` for the SA variant)."""
    p, s = variables["params"], variables["batch_stats"]

    x1 = _double_conv(p["inc"], s["inc"], x, interpret)
    x2 = _double_conv(p["down1"], s["down1"], max_pool_2d(x1, 2), interpret)
    x3 = _double_conv(p["down2"], s["down2"], max_pool_2d(x2, 2), interpret)
    x4 = _double_conv(p["down3"], s["down3"], max_pool_2d(x3, 2), interpret)
    y = _double_conv(p["down4"], s["down4"], max_pool_2d(x4, 2), interpret)

    for idx, skip in ((1, x4), (2, x3), (3, x2), (4, x1)):
        y = _conv_transpose(p[f"up{idx}"], y)
        if y.shape[1:3] != skip.shape[1:3]:
            y = resize_bilinear(y, skip.shape[1:3])
        y = jnp.concatenate([skip, y], axis=-1)
        if use_sa:
            y = _spatial_attention_dc(p[f"sa{idx}"], s[f"sa{idx}"], y, interpret)
        y = _double_conv(p[f"conv{idx}"], s[f"conv{idx}"], y, interpret)

    return _conv1x1(p["outc"], y)
