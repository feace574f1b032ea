"""Opt-in int8 post-training quantization for the ResNet families.

Quantizes the BN-folded DeepLabV3/FCN serving graphs
(insarseg/models/resnet_serve.py) the same way unet_int8 quantizes the
UNet graph — **not parity-preserving** (the exact bf16/f32 paths stay the
default):

- every backbone bottleneck conv (1x1 / 3x3-dilated / 1x1 / downsample)
  runs int8 x int8 -> int32 with per-output-channel weight scales and
  per-tensor activation scales; the folded-BN affine, ReLU and requantize
  fuse into the conv's output epilogue. Unlike the UNet the channel counts
  are >=64 -> 2048 everywhere, so no space-to-depth transform is needed;
- residual adds stay in the conv3 epilogue: the identity operand is the
  block's *input* codes dequantized in the same fused elementwise pass
  (``relu(acc*mult + off + id_q*s_in)`` -> requant), so no f32 tensor
  materializes between blocks;
- SE bottlenecks (FCN-CA) requantize conv3's output at a calibrated
  *pre-SE* scale, pool the squeeze statistics from the codes, and apply
  excite + identity-add + ReLU + requant as one elementwise pass — the
  same trick that removed the 4.3 GB f32 materializations from the UNet
  engine (unet_int8.py docstring);
- ASPP: the four conv branches requantize at one shared concat scale
  (the image-pool branch is a (B,1,1,C) matmul — kept f32), the projection
  and 3x3 head conv run int8; CBAM attention heads, the 1x1 classifier and
  the bilinear upsample stay bf16/f32 (tiny at OS=8);
- the 7x7 stem conv stays bf16 (C_in=1 underfills the MXU lanes either
  way; ~1% of FLOPs) — its pooled output is requantized once;
- activation scales come from absmax replay of the f32 folded graph over
  calibration batches; each tensor is rounded exactly once.

Accuracy is exercised in tests/test_resnet_int8.py (argmax agreement on
synthetically trained models). Reference models being served:
/root/reference/DeepLabV3.py:64,98-100, PSPNet.py:41-104 (opt-in fast
path; no reference equivalent exists).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from insarseg.models.resnet_serve import (
    _attention_apply,
    _ca,
    _classify,
    pack_resnet_serve,
)
from insarseg.ops.layers import max_pool_2d
from insarseg.ops.quant import absmax_to_scale, quant_weight
from insarseg.ops.quant import requant as _requant


# ---------------------------------------------------------------------------
# calibration: absmax replay of the folded f32 graph
# ---------------------------------------------------------------------------

def _se_gate(blk: Dict, pooled: jnp.ndarray) -> jnp.ndarray:
    g = jnp.maximum(pooled @ blk["fc1"].astype(pooled.dtype), 0)
    return jax.nn.sigmoid(g @ blk["fc2"].astype(g.dtype))


def _block_chain(pb: Dict) -> List[str]:
    return [f"layer{li + 1}_{bi}" for li in range(4)
            for bi in range(pb["layers"][li])]


def _replay_absmax(pf: Dict, x: jnp.ndarray,
                   calib_stat: str = "absmax") -> Dict[str, jnp.ndarray]:
    """One f32 forward of the folded serving graph recording the calibration
    statistic (absmax or a high |t| percentile — quant.py::calib_stat_fn)
    of every tensor that will carry int8 codes (jit-able)."""
    from insarseg.ops.quant import calib_stat_fn

    stat = calib_stat_fn(calib_stat)
    am: Dict[str, jnp.ndarray] = {}

    def rec(name, *ts):
        m = stat(ts[0])
        for t in ts[1:]:
            m = jnp.maximum(m, stat(t))
        am[name] = m

    pb = pf["backbone"]
    y = _ca(x, pb["stem"], stride=2)
    y = max_pool_2d(y, 3, stride=2, padding=1)
    rec("stem.out", y)
    for name in _block_chain(pb):
        blk = pb[name]
        t1 = _ca(y, blk["c1"])
        rec(f"{name}.t1", t1)
        t2 = _ca(t1, blk["c2"], stride=blk["stride"],
                 dilation=blk["dilation"])
        rec(f"{name}.t2", t2)
        y3 = _ca(t2, blk["c3"], relu=False)
        if "fc1" in blk:
            rec(f"{name}.pre", y3)
            y3 = y3 * _se_gate(blk, jnp.mean(y3, axis=(1, 2)))[:, None, None, :]
        idn = y if "ds" not in blk else _ca(y, blk["ds"], stride=blk["stride"],
                                            relu=False)
        y = jnp.maximum(y3 + idn, 0)
        rec(f"{name}.out", y)

    if pf["kind"] == "deeplab":
        pa = pf["aspp"]
        branches = [_ca(y, pa["b0"])]
        for i, rate in enumerate(pa["rates"], start=1):
            branches.append(_ca(y, pa[f"b{i}"], dilation=rate))
        p = _ca(jnp.mean(y, axis=(1, 2), keepdims=True), pa["pool"])
        branches.append(jnp.broadcast_to(p, y.shape[:3] + (p.shape[-1],)))
        # the image-pool branch is requantized at this same concat scale in
        # the int8 forward, so it must participate in the calibration
        rec("aspp.cat", *branches)
        proj = _ca(jnp.concatenate(branches, axis=-1), pa["project"])
        rec("aspp.proj", proj)
    elif pf["kind"] == "fcn":
        if pf["attention"] is not None:  # FCN-SA gates before the head
            y = _attention_apply(pf["attention"], y)
            rec("head.in", y)
    # pspnet: the PPM head stays bf16 — nothing past the backbone is int8
    return am


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _qconv(c: Dict, s_in: float, s_out: Optional[float],
           relu: bool = True) -> Dict[str, Any]:
    """Folded conv {'k','s','b'} (or bare {'k'}) -> int8 conv pack with the
    dequant/affine(+relu)(+requant) epilogue parameters."""
    qw = quant_weight(c["k"])
    mult = s_in * qw["ws"]
    if "s" in c:
        mult = mult * np.asarray(c["s"], np.float32)
        off = np.asarray(c["b"], np.float32)
    else:
        off = np.zeros(qw["q"].shape[-1], np.float32)
    return {"q": jnp.asarray(qw["q"]), "mult": jnp.asarray(mult),
            "off": jnp.asarray(off), "out_s": s_out, "relu": relu}


def pack_resnet_int8(
    variables: Dict[str, Any],
    calib_batches: List[jnp.ndarray],
    calib_stat: str = "absmax",
) -> Dict[str, Any]:
    """DeepLabV3/FCN variables + calibration images -> int8 serving tree.

    ``calib_batches``: a few representative normalized input batches
    (B, H, W, C_in) float32, as fed to the model."""
    pf = pack_resnet_serve(variables)
    # close over pf: the tree carries static metadata (kind/strides/rates)
    # that can't cross the jit boundary as an argument
    replay = jax.jit(lambda x: _replay_absmax(pf, x, calib_stat=calib_stat))
    am: Dict[str, float] = {}
    for batch in calib_batches:
        cur = jax.device_get(replay(jnp.asarray(batch, jnp.float32)))
        for k, v in cur.items():
            am[k] = max(am.get(k, 0.0), float(v))
    scales = {k: absmax_to_scale(v) for k, v in am.items()}

    pb = pf["backbone"]
    packed: Dict[str, Any] = {
        "kind": pf["kind"],
        "scales": scales,
        "stem": pb["stem"],  # bf16: C_in underfills the lanes
        "stem_out_s": scales["stem.out"],
        "layers": pb["layers"],
        "attention": pf["attention"],
        "classifier": pf["classifier"],
    }
    s_in = scales["stem.out"]
    for name in _block_chain(pb):
        blk = pb[name]
        has_se = "fc1" in blk
        s_out = scales[f"{name}.out"]
        qblk: Dict[str, Any] = {
            "c1": _qconv(blk["c1"], s_in, scales[f"{name}.t1"]),
            "c2": _qconv(blk["c2"], scales[f"{name}.t1"], scales[f"{name}.t2"]),
            # conv3: f32 exit (the residual add + relu + requant ride its
            # epilogue); SE blocks requant at the calibrated pre-SE scale
            "c3": _qconv(blk["c3"], scales[f"{name}.t2"],
                         scales[f"{name}.pre"] if has_se else None,
                         relu=False),
            "stride": blk["stride"], "dilation": blk["dilation"],
            "in_s": s_in, "out_s": s_out,
        }
        if "ds" in blk:
            qblk["ds"] = _qconv(blk["ds"], s_in, None, relu=False)
        if has_se:
            qblk["fc1"], qblk["fc2"] = blk["fc1"], blk["fc2"]
            qblk["pre_s"] = scales[f"{name}.pre"]
        packed[name] = qblk
        s_in = s_out

    if pf["kind"] == "deeplab":
        pa = pf["aspp"]
        cat_s = scales["aspp.cat"]
        qa: Dict[str, Any] = {
            "b0": _qconv(pa["b0"], s_in, cat_s),
            "rates": pa["rates"],
            "pool": pa["pool"],  # (B,1,1,C) matmul — stays f32
            "cat_s": cat_s,
            "project": _qconv(pa["project"], cat_s, scales["aspp.proj"]),
        }
        for i in range(1, 4):
            qa[f"b{i}"] = _qconv(pa[f"b{i}"], s_in, cat_s)
        packed["aspp"] = qa
        # head conv: int8 -> bf16 exit; the SA variant's head is a bare
        # conv (no BN/ReLU — resnet_serve.py pack_deeplab_serve)
        packed["head"] = _qconv(pf["head"], scales["aspp.proj"], None,
                                relu="s" in pf["head"])
    elif pf["kind"] == "fcn":
        s_head_in = scales["head.in"] if pf["attention"] is not None else s_in
        packed["head_in_s"] = s_head_in
        packed["head"] = _qconv(pf["head"], s_head_in, None, relu=True)
    else:  # pspnet: folded bf16 PPM head on the dequantized backbone out
        packed["ppm"] = pf["ppm"]
        packed["head"] = pf["head"]
    return packed


# ---------------------------------------------------------------------------
# int8 forward
# ---------------------------------------------------------------------------

def _conv_i8(xq: jnp.ndarray, c: Dict, stride: int = 1,
             dilation: int = 1) -> jnp.ndarray:
    """int8 conv; epilogue = dequant affine (+relu) (+requant). Returns s8
    codes when c['out_s'] is set, else f32."""
    k = c["q"]
    kh, kw = k.shape[0], k.shape[1]
    acc = lax.conv_general_dilated(
        xq, k, window_strides=(stride, stride),
        padding=((dilation * (kh - 1) // 2,) * 2,
                 (dilation * (kw - 1) // 2,) * 2),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * c["mult"] + c["off"]
    if c["relu"]:
        y = jnp.maximum(y, 0.0)
    if c["out_s"] is None:
        return y
    return _requant(y, c["out_s"])


def _block_i8(blk: Dict, xq: jnp.ndarray) -> jnp.ndarray:
    """One bottleneck on int8 codes -> int8 codes at blk['out_s']."""
    t1 = _conv_i8(xq, blk["c1"])
    t2 = _conv_i8(t1, blk["c2"], stride=blk["stride"],
                  dilation=blk["dilation"])
    if "ds" in blk:
        idn = _conv_i8(xq, blk["ds"], stride=blk["stride"])  # f32
    else:
        idn = xq.astype(jnp.float32) * blk["in_s"]
    if "fc1" in blk:
        # conv3 requants at the pre-SE scale; squeeze reads the codes; the
        # excite/add/relu/requant is ONE elementwise pass over s8 inputs
        y3q = _conv_i8(t2, blk["c3"])  # s8 @ pre_s
        pooled = jnp.mean(y3q.astype(jnp.float32), axis=(1, 2)) * blk["pre_s"]
        gate = _se_gate(blk, pooled) * blk["pre_s"]
        y = y3q.astype(jnp.float32) * gate[:, None, None, :] + idn
    else:
        y = _conv_i8(t2, blk["c3"]) + idn  # rides conv3's epilogue
    return _requant(jnp.maximum(y, 0.0), blk["out_s"])


def resnet_int8_apply(packed: Dict[str, Any], x: jnp.ndarray,
                      argmax: bool = False) -> jnp.ndarray:
    """int8 eval-mode forward. ``x``: (B, H, W, C_in) float (normalized)."""
    input_size = x.shape[1:3]
    y = _ca(x.astype(jnp.bfloat16), packed["stem"], stride=2)
    y = max_pool_2d(y, 3, stride=2, padding=1)
    yq = _requant(y.astype(jnp.float32), packed["stem_out_s"])
    for name in _block_chain(packed):
        yq = _block_i8(packed[name], yq)

    if packed["kind"] == "deeplab":
        pa = packed["aspp"]
        branches = [_conv_i8(yq, pa["b0"])]
        for i, rate in enumerate(pa["rates"], start=1):
            branches.append(_conv_i8(yq, pa[f"b{i}"], dilation=rate))
        last = packed[_block_chain(packed)[-1]]
        p = jnp.mean(yq.astype(jnp.float32), axis=(1, 2),
                     keepdims=True) * last["out_s"]
        p = _ca(p, pa["pool"])
        pq = _requant(p, pa["cat_s"])
        branches.append(jnp.broadcast_to(pq, yq.shape[:3] + (pq.shape[-1],)))
        cat = jnp.concatenate(branches, axis=-1)
        proj = _conv_i8(cat, pa["project"])
        h = _conv_i8(proj, packed["head"]).astype(jnp.bfloat16)
        h = _attention_apply(packed["attention"], h)
    elif packed["kind"] == "pspnet":
        from insarseg.models.resnet_serve import _ppm_apply

        last = packed[_block_chain(packed)[-1]]
        h = (yq.astype(jnp.float32) * last["out_s"]).astype(jnp.bfloat16)
        h = _attention_apply(packed["attention"], h)
        h = _ppm_apply(packed["ppm"], h)
        h = _ca(h, packed["head"])
    else:
        if packed["attention"] is not None:
            last = packed[_block_chain(packed)[-1]]
            yf = yq.astype(jnp.float32) * last["out_s"]
            yf = _attention_apply(packed["attention"], yf)
            yq = _requant(yf, packed["head_in_s"])
        h = _conv_i8(yq, packed["head"]).astype(jnp.bfloat16)
    return _classify(packed["classifier"], h, input_size, argmax)


def make_resnet_int8_predict_fn(variables: Dict[str, Any],
                                calib_batches: List[jnp.ndarray],
                                argmax: bool = False,
                                calib_stat: str = "absmax",
                                mesh=None):
    """Calibrate + pack once; return a jitted int8 ``predict(images)``.

    With ``mesh`` the batch shards over the mesh's ``data`` axis (codes and
    scales replicated) — the graph has no cross-batch ops, so 8-way ==
    1-way bit-exactly (tests/test_engines_mesh.py)."""
    from insarseg.engines import jit_engine, mesh_replicate_packed

    packed = mesh_replicate_packed(
        pack_resnet_int8(variables, calib_batches, calib_stat=calib_stat),
        mesh)

    def predict(images):
        return resnet_int8_apply(packed, images, argmax=argmax)

    return jit_engine(predict, mesh)
