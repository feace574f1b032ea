"""Opt-in int8 quantized UNet inference (post-training quantization).

The v5e MXU runs int8 at ~2x its bf16 rate where the lanes are full
(measured: conv3x3 256ch@256^2 = 230 TOP/s int8 vs 131 TFLOP/s bf16,
benchmarks/probe_results.jsonl), and int8 activations halve HBM traffic.
This module quantizes the H-s2d inference graph (insarseg/models/unet_s2d.py)
— **not parity-preserving** (the exact bf16/f32 paths stay the default):

- all eighteen 3x3 convs (the ~90% of FLOPs) run int8 x int8 -> int32 with
  symmetric per-output-channel weight scales and per-tensor activation
  scales; the folded-BN affine, ReLU, and the requantize to the next
  tensor's scale fuse into one epilogue on the int32 accumulator;
- activation scales come from calibration batches (absmax replay of the f32
  graph); each tensor has ONE scale chosen where it is consumed — skip
  tensors are quantized by their producer directly at the scale of the
  concat they enter, so no tensor is rounded twice;
- SE squeeze/excite (tiny), transposed convs (~5% of FLOPs), and the 1x1
  head stay bf16; max-pooling runs on the int8 codes directly (monotonic
  under a positive scale).

Quantization error on trained models is exercised in
tests/test_unet_int8.py (argmax agreement + bounded logit error on a
synthetically trained model). Reference model being served:
/root/reference/Unet-ChannalAttention.py:100-163 (opt-in fast path; no
reference equivalent exists).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from insarseg.models.unet_s2d import (
    _conv_affine,
    _conv_transpose_k2s2,
    _h_d2s,
    _h_s2d,
    _tile2,
    pack_unet_s2d,
)

_QMAX = 127.0


# ---------------------------------------------------------------------------
# calibration: absmax replay of the f32 s2d graph
# ---------------------------------------------------------------------------

def _se_scales(pk, pooled):
    y = jnp.maximum(pooled @ pk["fc1"].astype(pooled.dtype), 0)
    return jax.nn.sigmoid(y @ pk["fc2"].astype(y.dtype))


def _dc_f32(pk, x, s2d: bool):
    t1 = _conv_affine(x, pk["k1"], pk["s1"], pk["b1"])
    y = _conv_affine(t1, pk["k2"], pk["s2"], pk["b2"])
    if "fc1" in pk:
        if s2d:
            c2 = y.shape[-1]
            pooled = 0.5 * (jnp.mean(y, axis=(1, 2))[:, : c2 // 2]
                            + jnp.mean(y, axis=(1, 2))[:, c2 // 2 :])
            sc = _se_scales(pk, pooled)
            y = y * jnp.concatenate([sc, sc], -1)[:, None, None, :]
        else:
            y = y * _se_scales(pk, jnp.mean(y, axis=(1, 2)))[:, None, None, :]
    return t1, y


def _maxpool_from_s2d(x1s):
    c2 = x1s.shape[-1]
    rowmax = jnp.maximum(x1s[..., : c2 // 2], x1s[..., c2 // 2 :])
    b, rh, w, f = rowmax.shape
    return rowmax.reshape(b, rh, w // 2, 2, f).max(axis=3)


def _up4_shuffle(y, m, bias):
    z = y @ m.astype(y.dtype)
    b, h, w, _ = z.shape
    fo = m.shape[-1] // 4
    z = z.reshape(b, h, w, 2, 2, fo).transpose(0, 1, 2, 4, 3, 5).reshape(
        b, h, 2 * w, 2 * fo)
    return z if bias is None else z + _tile2(bias).astype(z.dtype)


def _replay_absmax(pf: Dict, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """One f32 forward of the s2d graph recording the absmax of every tensor
    that will be int8 (jit-able; returns a dict of scalars)."""
    am: Dict[str, jnp.ndarray] = {}

    def rec(name, *ts):
        m = jnp.maximum(*[jnp.max(jnp.abs(t)) for t in ts]) if len(ts) > 1 \
            else jnp.max(jnp.abs(ts[0]))
        am[name] = m

    x2 = _h_s2d(x)
    rec("in", x2)
    t1, x1s = _dc_f32(pf["inc"], x2, s2d=True)
    rec("inc.t1", t1)
    feats = {"l1": x1s}
    y = _maxpool_from_s2d(x1s)
    for i in range(1, 5):
        t1, y = _dc_f32(pf[f"down{i}"], y, s2d=False)
        rec(f"down{i}.t1", t1)
        feats[f"l{i + 1}"] = y
        if i < 4:
            y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
    for i, skip in ((1, "l4"), (2, "l3"), (3, "l2")):
        z = _conv_transpose_k2s2(y, pf[f"up{i}"]["k"], pf[f"up{i}"]["bias"])
        rec(f"cat{i}", feats[skip], z)
        t1, y = _dc_f32(pf[f"conv{i}"], jnp.concatenate([feats[skip], z], -1),
                        s2d=False)
        rec(f"conv{i}.t1", t1)
    z = _up4_shuffle(y, pf["up4"]["m"], pf["up4"]["bias"])
    rec("cat4", feats["l1"], z)
    t1, y2 = _dc_f32(pf["conv4"], jnp.concatenate([feats["l1"], z], -1),
                     s2d=True)
    rec("conv4.t1", t1)
    return am


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _quant_weight(k: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of an HWIO kernel."""
    k = np.asarray(k, np.float32)
    s = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0) / _QMAX
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(k / s), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "ws": jnp.asarray(s)}


def pack_unet_int8(
    variables: Dict[str, Any],
    calib_batches: List[jnp.ndarray],
) -> Dict[str, Any]:
    """UNet variables + calibration images -> int8 s2d serving tree.

    ``calib_batches``: a few representative input batches (B, H, W, C_in)
    float32 (normalized, as fed to the model)."""
    pf = pack_unet_s2d(variables)
    replay = jax.jit(_replay_absmax)
    am: Dict[str, float] = {}
    for batch in calib_batches:
        cur = jax.device_get(replay(pf, jnp.asarray(batch, jnp.float32)))
        for k, v in cur.items():
            am[k] = max(am.get(k, 0.0), float(v))
    scales = {k: max(v, 1e-12) / _QMAX for k, v in am.items()}

    packed: Dict[str, Any] = {"scales": scales}
    # activation scale of each dc's (input, t1, output) in int8-land
    dc_io = {
        "inc": ("in", "inc.t1", "cat4"),
        "down1": ("cat4", "down1.t1", "cat3"),
        "down2": ("cat3", "down2.t1", "cat2"),
        "down3": ("cat2", "down3.t1", "cat1"),
        "down4": ("cat1", "down4.t1", None),  # bottom stays bf16
        "conv1": ("cat1", "conv1.t1", None),
        "conv2": ("cat2", "conv2.t1", None),
        "conv3": ("cat3", "conv3.t1", None),
        "conv4": ("cat4", "conv4.t1", None),
    }
    for name, (s_in, s_t1, s_out) in dc_io.items():
        src = pf[name]
        blk: Dict[str, Any] = {}
        for tag, kname, sname, bname, s_src, s_dst in (
            ("c1", "k1", "s1", "b1", s_in, s_t1),
            ("c2", "k2", "s2", "b2", s_t1, s_out),
        ):
            qw = _quant_weight(src[kname])
            mult = scales[s_src] * np.asarray(qw["ws"]) \
                * np.asarray(src[sname], np.float32)
            off = np.asarray(src[bname], np.float32)
            blk[tag] = {
                "q": qw["q"],
                "mult": jnp.asarray(mult),
                "off": jnp.asarray(off),
                # requant divisor (None -> stay float for SE / bf16 exit)
                "out_s": None if s_dst is None else scales[s_dst],
            }
        if "fc1" in src:
            blk["fc1"], blk["fc2"] = src["fc1"], src["fc2"]
            # with SE, c2's requant happens after the SE rescale
            blk["se_out_s"] = blk["c2"]["out_s"]
            blk["c2"] = dict(blk["c2"], out_s=None)
        packed[name] = blk
    for i in range(1, 4):
        packed[f"up{i}"] = pf[f"up{i}"]
        packed[f"up{i}"]["cat_s"] = scales[f"cat{i}"]
    packed["up4"] = pf["up4"]
    packed["up4"]["cat_s"] = scales["cat4"]
    packed["outc"] = pf["outc"]
    packed["in_s"] = scales["in"]
    return packed


# ---------------------------------------------------------------------------
# int8 forward
# ---------------------------------------------------------------------------

def _conv_i8(xq: jnp.ndarray, blk: Dict, se=None) -> jnp.ndarray:
    """int8 conv + fused dequant/affine/relu epilogue; returns int8 codes
    when blk['out_s'] is set, else f32."""
    k = blk["q"]
    kh, kw = k.shape[0], k.shape[1]
    acc = lax.conv_general_dilated(
        xq, k, window_strides=(1, 1),
        padding=(((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * blk["mult"] + blk["off"]
    y = jnp.maximum(y, 0.0)
    if blk["out_s"] is None:
        return y
    return _requant(y, blk["out_s"])


def _requant(y: jnp.ndarray, s: float) -> jnp.ndarray:
    return jnp.clip(jnp.rint(y / s), -127, 127).astype(jnp.int8)


def _dc_i8(blk: Dict, xq: jnp.ndarray, s2d: bool):
    t1 = _conv_i8(xq, blk["c1"])
    y = _conv_i8(t1, blk["c2"])
    if "fc1" in blk:
        if s2d:
            c2 = y.shape[-1]
            pooled = 0.5 * (jnp.mean(y, axis=(1, 2))[:, : c2 // 2]
                            + jnp.mean(y, axis=(1, 2))[:, c2 // 2 :])
            sc = _se_scales(blk, pooled)
            y = y * jnp.concatenate([sc, sc], -1)[:, None, None, :]
        else:
            y = y * _se_scales(blk, jnp.mean(y, axis=(1, 2)))[:, None, None, :]
        if blk["se_out_s"] is not None:
            y = _requant(y, blk["se_out_s"])
    return y


def _maxpool_i8(yq: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(yq, jnp.int8(-128), lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def unet_int8_apply(packed: Dict[str, Any], x: jnp.ndarray,
                    argmax: bool = False) -> jnp.ndarray:
    """int8 eval-mode forward. ``x``: (B, H, W, C_in) float (normalized)."""
    nc = packed["outc"]["nc"]
    x2 = _h_s2d(x.astype(jnp.float32))
    xq = _requant(x2, packed["in_s"])
    x1s = _dc_i8(packed["inc"], xq, s2d=True)  # int8 @ cat4 scale

    c2 = x1s.shape[-1]
    rowmax = jnp.maximum(x1s[..., : c2 // 2], x1s[..., c2 // 2 :])
    b, rh, w, f = rowmax.shape
    y = rowmax.reshape(b, rh, w // 2, 2, f).max(axis=3)

    skips = {}
    for i in range(1, 5):
        y = _dc_i8(packed[f"down{i}"], y, s2d=False)
        skips[f"l{i + 1}"] = y
        if i < 4:
            y = _maxpool_i8(y)
    # bottom y is f32 (down4 has no out_s)
    y = y.astype(jnp.bfloat16)

    for i, skip in ((1, "l4"), (2, "l3"), (3, "l2")):
        up = packed[f"up{i}"]
        z = _conv_transpose_k2s2(y, up["k"], up["bias"])
        zq = _requant(z.astype(jnp.float32), up["cat_s"])
        # skip is int8 at this same concat scale by construction
        y = _dc_i8(packed[f"conv{i}"], jnp.concatenate([skips[skip], zq], -1),
                   s2d=False).astype(jnp.bfloat16)

    z = _up4_shuffle(y, packed["up4"]["m"], packed["up4"]["bias"])
    zq = _requant(z.astype(jnp.float32), packed["up4"]["cat_s"])
    y2 = _dc_i8(packed["conv4"], jnp.concatenate([x1s, zq], -1), s2d=True)

    y2 = y2.astype(jnp.bfloat16)
    logits2 = y2 @ packed["outc"]["k"].astype(y2.dtype)
    if packed["outc"]["bias"] is not None:
        logits2 = logits2 + packed["outc"]["bias"].astype(logits2.dtype)

    if argmax:
        b2, rh2, w2, _ = logits2.shape
        cls2 = jnp.stack(
            [jnp.argmax(logits2[..., :nc], axis=-1),
             jnp.argmax(logits2[..., nc:], axis=-1)], axis=2
        ).astype(jnp.int32)
        return cls2.reshape(b2, 2 * rh2, w2)
    return _h_d2s(logits2, nc)


def make_int8_predict_fn(variables: Dict[str, Any],
                         calib_batches: List[jnp.ndarray],
                         argmax: bool = False):
    """Calibrate + pack once; return a jitted int8 ``predict(images)``."""
    packed = pack_unet_int8(variables, calib_batches)

    @jax.jit
    def predict(images):
        return unet_int8_apply(packed, images, argmax=argmax)

    return predict
