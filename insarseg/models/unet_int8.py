"""Opt-in int8 quantized UNet inference (post-training quantization).

The v5e MXU runs int8 at ~2x its bf16 rate where the lanes are full
(measured: conv3x3 256ch@256^2 = 230 TOP/s int8 vs 131 TFLOP/s bf16,
benchmarks/probe_results.jsonl), and int8 activations quarter the HBM
traffic of f32 intermediates. This module quantizes the H-s2d inference
graph (insarseg/models/unet_s2d.py) — **not parity-preserving** (the exact
bf16/f32 paths stay the default):

- all eighteen 3x3 convs (~90% of FLOPs) run int8 x int8 -> int32 with
  symmetric per-output-channel weight scales and per-tensor activation
  scales; the folded-BN affine, ReLU, and the requantize fuse into the
  conv's output epilogue (the TPU trace shows these compile to single
  kOutput conv fusions writing s8 at ~380 TOP/s — near peak);
- SE blocks quantize the conv2 output at a calibrated *pre-SE* scale, pool
  the squeeze statistics from the int8 codes, and apply excite + requant
  (or excite + bf16 exit) as ONE elementwise pass. (A first cut kept the
  pre-SE tensor f32 so SE could read it exactly; the trace showed 4.3 GB
  f32 materializations + 19.6 ms/iter of standalone requant passes at
  b64 512^2 — 46% of the step was requantization traffic.);
- activation scales come from calibration batches (absmax replay of the f32
  graph); each tensor has ONE scale chosen where it is consumed — skip
  tensors are quantized by their producer directly at the scale of the
  concat they enter, so no tensor is rounded twice;
- SE squeeze/excite MLPs (tiny), transposed convs (~5% of FLOPs), and the
  1x1 head stay bf16; max-pooling runs on the int8 codes directly
  (monotonic under a positive scale).

This graph is the measured optimum for the exact architecture under
jax/Mosaic 0.9.0 (602 tiles/s/chip at 512^2). Every alternative was built,
bit-exactness-tested, measured SLOWER whole-engine, and retired to git
history in round 4 — block-sparse and whole-stage Pallas L1 kernels
(boundary-relayout-bound), deferred SE gates + dual-conv skips, strided-
slice maxpools, and an int8 1x1 head. The measurements and the re-open
conditions live in BASELINE.md ("Speed of light" / "Round 3: the int8
tail" / "Retired code ledger").

Quantization error on trained models is exercised in
tests/test_unet_int8.py (argmax agreement + bounded logit error on a
synthetically trained model). Reference model being served:
/root/reference/Unet-ChannalAttention.py:100-163 (opt-in fast path; no
reference equivalent exists).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from insarseg.models.unet_s2d import (
    _conv_affine,
    _conv_transpose_k2s2,
    _h_d2s,
    _h_s2d,
    _maxpool_exit_s2d,
    _up4_s2d,
    pack_unet_folded,
    pack_unet_s2d,
)
from insarseg.ops.quant import absmax_to_scale, quant_weight
from insarseg.ops.quant import requant as _requant


# ---------------------------------------------------------------------------
# calibration: absmax replay of the f32 s2d graph
# ---------------------------------------------------------------------------

def _se_scales(pk, pooled):
    y = jnp.maximum(pooled @ pk["fc1"].astype(pooled.dtype), 0)
    return jax.nn.sigmoid(y @ pk["fc2"].astype(y.dtype))


def _se_pool(y, s2d: bool):
    pooled = jnp.mean(y, axis=(1, 2))
    if s2d:
        c2 = y.shape[-1]
        pooled = 0.5 * (pooled[:, : c2 // 2] + pooled[:, c2 // 2 :])
    return pooled


def _se_apply(y, sc, s2d: bool):
    if s2d:
        sc = jnp.concatenate([sc, sc], -1)
    return y * sc[:, None, None, :]


def _sa_sigmoid(pk, x):
    """Folded SpatialAttentionDC gate map: channel mean/max ->
    DoubleConv(2->1) -> sigmoid; returns the (B,H,W,1) f32 gate."""
    m = jnp.concatenate([jnp.mean(x, axis=-1, keepdims=True),
                         jnp.max(x, axis=-1, keepdims=True)], axis=-1)
    m = _conv_affine(m, pk["k1"], pk["s1"], pk["b1"])
    m = _conv_affine(m, pk["k2"], pk["s2"], pk["b2"])
    return jax.nn.sigmoid(m.astype(jnp.float32))


def _sa_f32(pk, x):
    return x * _sa_sigmoid(pk, x).astype(x.dtype)


def _dc_f32(pk, x, s2d: bool):
    """f32 replay of one DoubleConv; returns (t1, t2_pre_se, out)."""
    t1 = _conv_affine(x, pk["k1"], pk["s1"], pk["b1"])
    t2 = _conv_affine(t1, pk["k2"], pk["s2"], pk["b2"])
    y = t2
    if "fc1" in pk:
        sc = _se_scales(pk, _se_pool(t2, s2d))
        y = _se_apply(t2, sc, s2d)
    return t1, t2, y


def _replay_absmax(pf: Dict, x: jnp.ndarray,
                   s2d: bool = True,
                   calib_stat: str = "absmax") -> Dict[str, jnp.ndarray]:
    """One f32 forward of the serving graph recording the calibration
    statistic (absmax or a high percentile of |t|, insarseg/ops/quant.py::
    calib_stat_fn) of every tensor that will be int8 (jit-able; returns a
    dict of scalars). ``s2d=False`` replays the standard-layout folded
    graph instead."""
    from insarseg.ops.quant import calib_stat_fn

    stat = calib_stat_fn(calib_stat)
    am: Dict[str, jnp.ndarray] = {}

    def rec(name, *ts):
        m = jnp.maximum(*[stat(t) for t in ts]) if len(ts) > 1 \
            else stat(ts[0])
        am[name] = m

    def dc(name, x, flag):
        t1, t2, y = _dc_f32(pf[name], x, flag)
        rec(f"{name}.t1", t1)
        if "fc1" in pf[name]:
            rec(f"{name}.pre", t2)
        return y

    x2 = _h_s2d(x) if s2d else x
    rec("in", x2)
    x1s = dc("inc", x2, s2d)
    feats = {"l1": x1s}
    y = _maxpool_exit_s2d(x1s) if s2d else lax.reduce_window(
        x1s, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    for i in range(1, 5):
        y = dc(f"down{i}", y, False)
        feats[f"l{i + 1}"] = y
        if i < 4:
            y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
    def gate(i, cat):
        # SA variant (standard layout only): the replay must see the gated
        # decoder inputs so the downstream scales match the int8 forward
        if f"sa{i}" not in pf:
            return cat
        return _sa_f32(pf[f"sa{i}"], cat)

    for i, skip in ((1, "l4"), (2, "l3"), (3, "l2")):
        z = _conv_transpose_k2s2(y, pf[f"up{i}"]["k"], pf[f"up{i}"]["bias"])
        rec(f"cat{i}", feats[skip], z)
        y = dc(f"conv{i}", gate(i, jnp.concatenate([feats[skip], z], -1)),
               False)
    z = _up4_s2d(y, pf["up4"]["k"], pf["up4"]["bias"]) if s2d else \
        _conv_transpose_k2s2(y, pf["up4"]["k"], pf["up4"]["bias"])
    rec("cat4", feats["l1"], z)
    dc("conv4", gate(4, jnp.concatenate([feats["l1"], z], -1)), s2d)
    return am


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def pack_unet_int8(
    variables: Dict[str, Any],
    calib_batches: List[jnp.ndarray],
    s2d: bool = True,
    calib_stat: str = "absmax",
) -> Dict[str, Any]:
    """UNet variables + calibration images -> int8 serving tree.

    ``calib_batches``: a few representative input batches (B, H, W, C_in)
    float32 (normalized, as fed to the model). ``s2d=False`` quantizes the
    standard-layout graph — for models whose level 1 already fills the MXU
    lanes (the space-to-depth fast variant) and for the SA cell (per-pixel
    gates are meaningless across s2d parity lanes).

    This packs exactly one graph — the measured optimum. The retired
    restructurings (Pallas L1 kernels, deferred gates, slice maxpool,
    int8 head; all slower whole-engine) are in git history; measurements
    and re-open conditions in BASELINE.md "Retired code ledger"."""
    pf = pack_unet_s2d(variables) if s2d else pack_unet_folded(variables)
    import functools

    replay = jax.jit(functools.partial(_replay_absmax, s2d=s2d,
                                       calib_stat=calib_stat))
    am: Dict[str, float] = {}
    for batch in calib_batches:
        cur = jax.device_get(replay(pf, jnp.asarray(batch, jnp.float32)))
        for k, v in cur.items():
            am[k] = max(am.get(k, 0.0), float(v))
    scales = {k: absmax_to_scale(v) for k, v in am.items()}

    packed: Dict[str, Any] = {"scales": scales, "s2d": s2d}
    # (input scale, t1 scale, output scale-or-None) per DoubleConv; None out
    # means the block exits to bf16 (decoder convs feed bf16 transposed
    # convs; the bottom feeds up1).
    dc_io = {
        "inc": ("in", "inc.t1", "cat4"),
        "down1": ("cat4", "down1.t1", "cat3"),
        "down2": ("cat3", "down2.t1", "cat2"),
        "down3": ("cat2", "down3.t1", "cat1"),
        "down4": ("cat1", "down4.t1", None),
        "conv1": ("cat1", "conv1.t1", None),
        "conv2": ("cat2", "conv2.t1", None),
        "conv3": ("cat3", "conv3.t1", None),
        "conv4": ("cat4", "conv4.t1", None),
    }
    for name, (s_in, s_t1, s_out) in dc_io.items():
        src = pf[name]
        has_se = "fc1" in src
        # with SE, conv2 requantizes at the calibrated pre-SE scale and the
        # excite pass carries the final requant (or the bf16 exit)
        s_c2_out = f"{name}.pre" if has_se else s_out
        blk: Dict[str, Any] = {}
        for tag, kname, sname, bname, s_src, s_dst in (
            ("c1", "k1", "s1", "b1", s_in, s_t1),
            ("c2", "k2", "s2", "b2", s_t1, s_c2_out),
        ):
            qw = quant_weight(src[kname])
            mult = scales[s_src] * qw["ws"] \
                * np.asarray(src[sname], np.float32)
            off = np.asarray(src[bname], np.float32)
            blk[tag] = {
                "q": jnp.asarray(qw["q"]),
                "mult": jnp.asarray(mult),
                "off": jnp.asarray(off),
                # requant divisor (None -> bf16 exit from the conv epilogue)
                "out_s": None if s_dst is None else scales[s_dst],
            }
        if has_se:
            blk["fc1"], blk["fc2"] = src["fc1"], src["fc2"]
            blk["se_pre_s"] = scales[f"{name}.pre"]
            blk["se_out_s"] = None if s_out is None else scales[s_out]
        packed[name] = blk
    for i in range(1, 4):
        packed[f"up{i}"] = pf[f"up{i}"]
        packed[f"up{i}"]["cat_s"] = scales[f"cat{i}"]
    packed["up4"] = pf["up4"]
    packed["up4"]["cat_s"] = scales["cat4"]
    packed["outc"] = pf["outc"]
    packed["in_s"] = scales["in"]
    for i in range(1, 5):  # SA variant (standard layout): f32 gate convs
        if f"sa{i}" in pf:
            packed[f"sa{i}"] = pf[f"sa{i}"]
    return packed


# ---------------------------------------------------------------------------
# int8 forward
# ---------------------------------------------------------------------------

def _conv_acc(xq: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Raw int8 x int8 -> int32 3x3/1x1 conv (no epilogue)."""
    kh, kw = k.shape[0], k.shape[1]
    return lax.conv_general_dilated(
        xq, k, window_strides=(1, 1),
        padding=(((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _epilogue(acc: jnp.ndarray, blk: Dict) -> jnp.ndarray:
    """Fused dequant/affine/relu(+requant) epilogue: int8 codes when
    blk['out_s'] is set, else bf16. Fuses into the producing conv's kOutput
    fusion (verified on the TPU trace)."""
    y = acc.astype(jnp.float32) * blk["mult"] + blk["off"]
    y = jnp.maximum(y, 0.0)
    if blk["out_s"] is None:
        return y.astype(jnp.bfloat16)
    return _requant(y, blk["out_s"])


def _conv_i8(xq: jnp.ndarray, blk: Dict) -> jnp.ndarray:
    """int8 conv + fused epilogue (see _conv_acc/_epilogue)."""
    return _epilogue(_conv_acc(xq, blk["q"]), blk)


def _dc_i8(blk: Dict, xq: jnp.ndarray, s2d: bool) -> jnp.ndarray:
    """One DoubleConv on int8 codes. Returns s8 codes at the block's output
    scale, or bf16 when the block exits the int8 domain."""
    yq = _conv_i8(_conv_i8(xq, blk["c1"]), blk["c2"])
    if "fc1" not in blk:
        return yq
    # squeeze from the codes (reads s8, not a materialized f32 tensor)
    pooled = _se_pool(yq.astype(jnp.float32), s2d) * blk["se_pre_s"]
    sc = _se_scales(blk, pooled)
    if s2d:
        sc = jnp.concatenate([sc, sc], -1)
    if blk["se_out_s"] is None:  # excite + bf16 exit, one pass
        gain = (sc * blk["se_pre_s"]).astype(jnp.bfloat16)
        return yq.astype(jnp.bfloat16) * gain[:, None, None, :]
    # excite + requant, one pass
    gain = sc * (blk["se_pre_s"] / blk["se_out_s"])
    y = yq.astype(jnp.float32) * gain[:, None, None, :]
    return jnp.clip(jnp.rint(y), -127, 127).astype(jnp.int8)


def _sa_gate_i8(pk: Dict, catq: jnp.ndarray, cat_s: float) -> jnp.ndarray:
    """SA gate on int8 codes (standard layout): compute the per-pixel
    sigmoid gate from the dequantized codes (tiny 2->1 convs stay f32),
    then rescale the codes in place — the gate is in (0,1) so the input's
    calibrated scale remains a valid bound for the gated tensor."""
    g = _sa_sigmoid(pk, catq.astype(jnp.float32) * cat_s)
    y = catq.astype(jnp.float32) * g
    return jnp.clip(jnp.rint(y), -127, 127).astype(jnp.int8)


def _maxpool_i8(yq: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(yq, jnp.int8(-128), lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def unet_int8_apply(packed: Dict[str, Any], x: jnp.ndarray,
                    argmax: bool = False) -> jnp.ndarray:
    """int8 eval-mode forward. ``x``: (B, H, W, C_in) float (normalized)."""
    s2d = packed.get("s2d", True)
    nc = packed["outc"]["nc"]
    x2 = _h_s2d(x.astype(jnp.float32)) if s2d else x.astype(jnp.float32)
    xq = _requant(x2, packed["in_s"])
    x1s = _dc_i8(packed["inc"], xq, s2d=s2d)  # s8 @ cat4 scale
    y = _maxpool_exit_s2d(x1s) if s2d else _maxpool_i8(x1s)

    skips = {}
    for i in range(1, 5):
        y = _dc_i8(packed[f"down{i}"], y, s2d=False)
        skips[f"l{i + 1}"] = y
        if i < 4:
            y = _maxpool_i8(y)
    # bottom y is bf16 (down4 exits the int8 domain for the decoder)

    for i, skip in ((1, "l4"), (2, "l3"), (3, "l2")):
        up = packed[f"up{i}"]
        z = _conv_transpose_k2s2(y, up["k"], up["bias"])
        zq = _requant(z.astype(jnp.float32), up["cat_s"])
        # skip is int8 at this same concat scale by construction
        catq = jnp.concatenate([skips[skip], zq], -1)
        if f"sa{i}" in packed:
            catq = _sa_gate_i8(packed[f"sa{i}"], catq, up["cat_s"])
        y = _dc_i8(packed[f"conv{i}"], catq, s2d=False)

    z = _up4_s2d(y, packed["up4"]["k"], packed["up4"]["bias"]) if s2d else \
        _conv_transpose_k2s2(y, packed["up4"]["k"], packed["up4"]["bias"])
    zq = _requant(z.astype(jnp.float32), packed["up4"]["cat_s"])
    cat_in = jnp.concatenate([x1s, zq], -1)
    if "sa4" in packed:
        cat_in = _sa_gate_i8(packed["sa4"], cat_in, packed["up4"]["cat_s"])
    y2 = _dc_i8(packed["conv4"], cat_in, s2d=s2d)

    logits2 = y2 @ packed["outc"]["k"].astype(y2.dtype)
    if packed["outc"]["bias"] is not None:
        logits2 = logits2 + packed["outc"]["bias"].astype(logits2.dtype)

    if not s2d:
        if argmax:
            return jnp.argmax(logits2, axis=-1).astype(jnp.int32)
        return logits2
    if argmax:
        b2, rh2, w2, _ = logits2.shape
        cls2 = jnp.stack(
            [jnp.argmax(logits2[..., :nc], axis=-1),
             jnp.argmax(logits2[..., nc:], axis=-1)], axis=2
        ).astype(jnp.int32)  # (B, H/2, 2, W)
        return cls2.reshape(b2, 2 * rh2, w2)
    return _h_d2s(logits2, nc)


def make_int8_predict_fn(variables: Dict[str, Any],
                         calib_batches: List[jnp.ndarray],
                         argmax: bool = False,
                         s2d: bool = True,
                         calib_stat: str = "absmax",
                         mesh=None):
    """Calibrate + pack once; return a jitted int8 ``predict(images)``.

    With ``mesh`` the batch shards over the mesh's ``data`` axis and the
    packed codes/scales replicate (the graph has no cross-batch ops, so
    8-way == 1-way bit-exactly — tests/test_engines_mesh.py).
    """
    from insarseg.engines import check_hw, jit_engine, mesh_replicate_packed

    packed = mesh_replicate_packed(
        pack_unet_int8(variables, calib_batches, s2d=s2d,
                       calib_stat=calib_stat), mesh)
    # the H-s2d graph halves H before the 5-level pyramid
    hdiv = 32 if s2d else 16

    def predict(images):
        check_hw(images.shape, hdiv, 16, "int8", "unet")
        return unet_int8_apply(packed, images, argmax=argmax)

    return jit_engine(predict, mesh)
