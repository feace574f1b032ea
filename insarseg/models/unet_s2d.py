"""Exact H-space-to-depth inference graph for the UNet family.

Motivation (measured, benchmarks/probe_results.jsonl, TPU v5e, bf16, b16):
the level-1 convs (C=64 at 512^2) are the flagship bottleneck — XLA's conv
emitter runs them at 35 TFLOP/s (18% of bf16 peak) because 64 channels fill
only half the MXU's 128 lanes. Reformulations of the *same math*:

  conv3x3  64->64  @ 512x512 : 8.77 ms   35 TFLOP/s   (as written)
  conv3x3 128->128 @ 512x512 : 11.3 ms  109 TFLOP/s   (zero-padded, 4x FLOPs)
  conv3x3 256->256 @ 256x256 : 9.44 ms  131 TFLOP/s   (full s2d, 4x FLOPs)
  conv3x3 128->128 @ 256x512 : 6.26 ms   99 TFLOP/s   (H-s2d, 2x FLOPs) <-- win

**H-space-to-depth**: fold row parity into channels, ``X2[rh, w, a*C+c] =
x[2rh+a, w, c]``. A 3x3 conv becomes a 3x3 conv over (H/2, W) with
channels 2C in / 2C out and kernel

    K2[alpha+1, v, a*Cin+c, d*Cout+o] = W[u+1, v, c, o],  u = 2*alpha + a - d

(zero where |u| > 1 — half the blocks, hence the 2x nominal FLOPs). This is
an exact linear re-indexing: outputs equal the original conv bit-for-bit up
to float reassociation. Everything at full resolution stays in the s2d
layout, so no full-res layout passes exist anywhere:

- entry reshape touches only the (B, H, W, 1) *input* (C=1 — tiny);
- BN folds into per-channel affines tiled x2; SE pools average the two
  parity groups (equal row counts), scales tile x2;
- MaxPool2 exits the s2d domain for free: a lane-half max (row pairs) then a
  w-pair max — output is the normal-domain (H/2, W/2, C) level-2 input;
- the decoder re-enters it for free: ConvTranspose(k2, s2) row-parity folds
  into output channels, so up4 becomes a W-only lhs-dilated conv with a
  (1, 2, 2f, 2f) kernel that emits the s2d layout directly. (A first cut
  used a 1x1 matmul to (d, e, o) channels + transpose/reshape un-shuffle;
  the TPU trace showed 13.3 ms/iter of pure layout copies for that at
  b64 512^2 — the lhs-dilated form compiles to one conv, no copies.);
- the skip-concat channel permutation is absorbed into the transformed
  conv4 kernel (pure host-side weight construction);
- the 1x1 head emits s2d logits; they are un-shuffled after the (cheap)
  argmax, or as (B, H/2, W, 2*nc) -> (B, H, W, nc) for logits.

Levels 2-5 keep the as-written layout (C >= 128 already fills the MXU; the
same transform measured *slower* there). BatchNorm is folded everywhere
(inference only, insarseg.ops.fold).

Consumes the exact {'params','batch_stats'} tree of
:class:`insarseg.models.unet.UNet` via :func:`pack_unet_s2d`; the forward
is :func:`unet_s2d_apply`. Parity: <=1e-4 vs ``UNet.apply(train=False)``
in f32 (tests/test_unet_s2d.py). Reference graph being reproduced:
/root/reference/Unet-ChannalAttention.py:100-163.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from insarseg.ops.fold import fold_bn
from insarseg.ops.layers import max_pool_2d


# ---------------------------------------------------------------------------
# host-side weight transforms (run once at pack time, numpy)
# ---------------------------------------------------------------------------

def s2d_conv3x3_kernel(w: np.ndarray, in_parity: np.ndarray,
                       in_channel: np.ndarray) -> np.ndarray:
    """(3, kw, Cin, Cout) kernel -> (3, kw, Jin, 2*Cout) H-s2d kernel.

    ``in_parity[j]`` / ``in_channel[j]`` give the original (row parity,
    channel) carried by s2d input channel j — identity layout is
    ``j = a*Cin + c``; the skip-concat permutation is expressed the same way.
    """
    w = np.asarray(w)
    kh, kw, cin, cout = w.shape
    assert kh == 3, kh
    jin = len(in_parity)
    k2 = np.zeros((3, kw, jin, 2 * cout), w.dtype)
    for ai in range(3):  # alpha = ai - 1
        for d in range(2):
            u = 2 * (ai - 1) + np.asarray(in_parity) - d
            idx = np.where((u >= -1) & (u <= 1))[0]
            if idx.size:
                # w[u+1, :, k, :] -> (n, kw, cout); target slot (kw, n, cout)
                k2[ai, :, idx, d * cout : (d + 1) * cout] = w[
                    u[idx] + 1, :, np.asarray(in_channel)[idx], :
                ]
    return k2


def _identity_layout(cin: int):
    j = np.arange(2 * cin)
    return j // cin, j % cin


def _concat_layout(c: int):
    """s2d channel layout of concat([skip_s2d(2c), up_s2d(2c)]) expressed in
    the original concat's (parity, channel-of-128) coordinates."""
    j = np.arange(4 * c)
    parity = (j % (2 * c)) // c
    chan = np.where(j < 2 * c, j % c, c + j % c)
    return parity, chan


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _fold_dc(p: Dict, s: Dict) -> Dict[str, Any]:
    s1, b1 = fold_bn(p["bn1"], s["bn1"], p["conv1"].get("bias"))
    s2, b2 = fold_bn(p["bn2"], s["bn2"], p["conv2"].get("bias"))
    out = {
        "k1": jnp.asarray(p["conv1"]["kernel"]), "s1": s1, "b1": b1,
        "k2": jnp.asarray(p["conv2"]["kernel"]), "s2": s2, "b2": b2,
    }
    if "se" in p:
        out["fc1"] = jnp.asarray(p["se"]["fc1"]["kernel"])
        out["fc2"] = jnp.asarray(p["se"]["fc2"]["kernel"])
    return out


def _tile2(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([v, v])


def _s2d_dc(p: Dict, s: Dict, conv1_layout) -> Dict[str, Any]:
    """DoubleConv params -> s2d-domain folded params. ``conv1_layout`` is the
    (parity, channel) layout of conv1's s2d input channels."""
    dc = _fold_dc(p, s)
    cin1 = dc["k1"].shape[2]
    cin2 = dc["k2"].shape[2]
    par1, ch1 = conv1_layout if conv1_layout is not None else _identity_layout(cin1)
    out = {
        "k1": jnp.asarray(s2d_conv3x3_kernel(np.asarray(dc["k1"]), par1, ch1)),
        "s1": _tile2(dc["s1"]), "b1": _tile2(dc["b1"]),
        "k2": jnp.asarray(s2d_conv3x3_kernel(
            np.asarray(dc["k2"]), *_identity_layout(cin2))),
        "s2": _tile2(dc["s2"]), "b2": _tile2(dc["b2"]),
    }
    if "fc1" in dc:
        out["fc1"], out["fc2"] = dc["fc1"], dc["fc2"]
    return out


def pack_unet_folded(variables: Dict[str, Any]) -> Dict[str, Any]:
    """UNet {'params','batch_stats'} -> BN-folded tree in the STANDARD
    layout (no s2d transform anywhere) — the substrate for int8 serving of
    models whose level 1 already fills the MXU lanes (e.g. the
    space-to-depth fast variant, insarseg/models/unet_stem.py) and of the
    SA variant (whose per-pixel gates are meaningless across s2d parity
    lanes; the gates' DoubleConv BNs fold like everything else)."""
    p, s = variables["params"], variables["batch_stats"]
    packed: Dict[str, Any] = {"inc": _fold_dc(p["inc"], s["inc"])}
    for i in range(1, 5):
        packed[f"down{i}"] = _fold_dc(p[f"down{i}"], s[f"down{i}"])
    for i in range(1, 5):
        packed[f"up{i}"] = {
            "k": jnp.asarray(p[f"up{i}"]["kernel"]),
            "bias": jnp.asarray(p[f"up{i}"]["bias"])
            if "bias" in p[f"up{i}"] else None,
        }
        packed[f"conv{i}"] = _fold_dc(p[f"conv{i}"], s[f"conv{i}"])
        if f"sa{i}" in p:
            packed[f"sa{i}"] = _fold_dc(p[f"sa{i}"]["compress_and_map"],
                                        s[f"sa{i}"]["compress_and_map"])
    wo = np.asarray(p["outc"]["kernel"])[0, 0]  # (f, nc)
    packed["outc"] = {"k": jnp.asarray(wo),
                      "bias": jnp.asarray(p["outc"]["bias"])
                      if "bias" in p["outc"] else None,
                      "nc": wo.shape[-1]}
    return packed


def pack_unet_s2d(variables: Dict[str, Any]) -> Dict[str, Any]:
    """UNet {'params','batch_stats'} -> folded + L1-s2d-transformed tree.

    Supports the plain and SE (use_se) variants; the SA variant falls back
    to the standard graph (its L1 spatial-attention pooling is not worth
    transforming — use ``UNet.apply``).
    """
    p, s = variables["params"], variables["batch_stats"]
    assert "sa1" not in p, "SA variant: use the standard UNet graph"
    f = p["inc"]["conv1"]["kernel"].shape[-1]
    packed: Dict[str, Any] = {"inc": _s2d_dc(p["inc"], s["inc"], None)}
    for i in range(1, 5):
        packed[f"down{i}"] = _fold_dc(p[f"down{i}"], s[f"down{i}"])
    for i in range(1, 4):
        packed[f"up{i}"] = {
            "k": jnp.asarray(p[f"up{i}"]["kernel"]),
            "bias": jnp.asarray(p[f"up{i}"]["bias"])
            if "bias" in p[f"up{i}"] else None,
        }
        packed[f"conv{i}"] = _fold_dc(p[f"conv{i}"], s[f"conv{i}"])
    # up4: ConvT(k2,s2, 2f->f) -> W-only lhs-dilated conv emitting the s2d
    # layout. Row parity d folds into output channels (d*f+o); the W parity
    # e becomes a kernel-width-2 tap: out[.., 2j+e, d*f+o] uses K[0, 1-e]
    # (lhs_dilation=2, padding (1,1): even t reads tap q=1, odd t q=0).
    wt = np.asarray(p["up4"]["kernel"])  # (2, 2, 2f, f)
    k_up = np.zeros((1, 2, 2 * f, 2 * f), wt.dtype)
    for e in range(2):
        for d in range(2):
            k_up[0, 1 - e, :, d * f : (d + 1) * f] = wt[d, e]
    bias = p["up4"].get("bias")
    packed["up4"] = {"k": jnp.asarray(k_up),
                     "bias": None if bias is None
                     else _tile2(jnp.asarray(bias))}
    packed["conv4"] = _s2d_dc(p["conv4"], s["conv4"], _concat_layout(f))
    # outc 1x1: block-diagonal over parity
    wo = np.asarray(p["outc"]["kernel"])[0, 0]  # (f, nc)
    nc = wo.shape[-1]
    ko = np.zeros((2 * f, 2 * nc), wo.dtype)
    ko[:f, :nc] = wo
    ko[f:, nc:] = wo
    packed["outc"] = {"k": jnp.asarray(ko),
                      "bias": jnp.asarray(np.tile(np.asarray(
                          p["outc"]["bias"]), 2))
                      if "bias" in p["outc"] else None,
                      "nc": nc}
    return packed


# ---------------------------------------------------------------------------
# forward helpers (all dtype-follow-the-input, params cast on the fly)
# ---------------------------------------------------------------------------

def _conv_affine(x, k, scale, bias, relu=True):
    kh = k.shape[0]
    kww = k.shape[1]
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1),
        padding=(((kh - 1) // 2,) * 2, ((kww - 1) // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y


def _se(x, fc1, fc2, pooled=None):
    y = jnp.mean(x, axis=(1, 2)) if pooled is None else pooled
    y = jnp.maximum(y @ fc1.astype(y.dtype), 0)
    y = jax.nn.sigmoid((y @ fc2.astype(y.dtype)).astype(jnp.float32))
    return x * y[:, None, None, :].astype(x.dtype)


def _se_s2d(x2, fc1, fc2):
    c2 = x2.shape[-1]
    pooled2 = jnp.mean(x2, axis=(1, 2))  # (B, 2C)
    pooled = 0.5 * (pooled2[:, : c2 // 2] + pooled2[:, c2 // 2 :])
    y = jnp.maximum(pooled @ fc1.astype(pooled.dtype), 0)
    y = jax.nn.sigmoid((y @ fc2.astype(y.dtype)).astype(jnp.float32))
    scale = jnp.concatenate([y, y], axis=-1)[:, None, None, :]
    return x2 * scale.astype(x2.dtype)


def _dc(pk, x):
    x = _conv_affine(x, pk["k1"], pk["s1"], pk["b1"])
    x = _conv_affine(x, pk["k2"], pk["s2"], pk["b2"])
    if "fc1" in pk:
        x = _se(x, pk["fc1"], pk["fc2"])
    return x


def _dc_s2d(pk, x2):
    x2 = _conv_affine(x2, pk["k1"], pk["s1"], pk["b1"])
    x2 = _conv_affine(x2, pk["k2"], pk["s2"], pk["b2"])
    if "fc1" in pk:
        x2 = _se_s2d(x2, pk["fc1"], pk["fc2"])
    return x2


def _conv_transpose_k2s2(x, k, bias):
    kf = jnp.flip(k, axis=(0, 1)).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, kf, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if bias is None else y + bias.astype(y.dtype)


def _up4_s2d(y, k, bias):
    """(B, H/2, W/2, 2f) -> (B, H/2, W, 2f) s2d-layout ConvT(k2, s2)."""
    z = lax.conv_general_dilated(
        y, k.astype(y.dtype), window_strides=(1, 1),
        padding=((0, 0), (1, 1)), lhs_dilation=(1, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return z if bias is None else z + bias.astype(z.dtype)


def _maxpool_exit_s2d(x2s):
    """s2d (B, H/2, W, 2C) -> normal-domain maxpool2 output (B, H/2, W/2, C):
    lane-half max over row parity, then a W-pair reduce_window (the
    reshape-max form compiled to a 4.5x-off-roofline reduce on TPU)."""
    c2 = x2s.shape[-1]
    rowmax = jnp.maximum(x2s[..., : c2 // 2], x2s[..., c2 // 2 :])
    init = jnp.array(-jnp.inf if jnp.issubdtype(rowmax.dtype, jnp.floating)
                     else jnp.iinfo(rowmax.dtype).min, rowmax.dtype)
    return lax.reduce_window(rowmax, init, lax.max, (1, 1, 2, 1),
                             (1, 1, 2, 1), "VALID")


def _h_s2d(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w, c).transpose(0, 1, 3, 2, 4).reshape(
        b, h // 2, w, 2 * c)


def _h_d2s(y2, nc):
    b, rh, w, _ = y2.shape
    return y2.reshape(b, rh, w, 2, nc).transpose(0, 1, 3, 2, 4).reshape(
        b, 2 * rh, w, nc)


def unet_s2d_apply(packed: Dict[str, Any], x: jnp.ndarray,
                   argmax: bool = False) -> jnp.ndarray:
    """Eval-mode UNet forward over the H-s2d level-1 graph.

    x: (B, H, W, C_in) with H, W divisible by 16 and H even. Returns logits
    (B, H, W, nc), or the argmax class map (B, H, W) int32 with the
    interleave done on the (4x smaller) class map.
    """
    nc = packed["outc"]["nc"]
    x2 = _h_s2d(x)
    x1s = _dc_s2d(packed["inc"], x2)  # (B, H/2, W, 2f)
    x2_ = _dc(packed["down1"], _maxpool_exit_s2d(x1s))
    x3 = _dc(packed["down2"], max_pool_2d(x2_, 2))
    x4 = _dc(packed["down3"], max_pool_2d(x3, 2))
    y = _dc(packed["down4"], max_pool_2d(x4, 2))

    for i, skip in ((1, x4), (2, x3), (3, x2_)):
        y = _conv_transpose_k2s2(y, packed[f"up{i}"]["k"],
                                 packed[f"up{i}"]["bias"])
        y = jnp.concatenate([skip, y], axis=-1)
        y = _dc(packed[f"conv{i}"], y)

    z = _up4_s2d(y, packed["up4"]["k"], packed["up4"]["bias"])
    y2 = jnp.concatenate([x1s, z], axis=-1)
    y2 = _dc_s2d(packed["conv4"], y2)

    logits2 = y2 @ packed["outc"]["k"].astype(y2.dtype)
    if packed["outc"]["bias"] is not None:
        logits2 = logits2 + packed["outc"]["bias"].astype(logits2.dtype)

    if argmax:
        b2, rh2, w2, _ = logits2.shape
        cls2 = jnp.stack(
            [jnp.argmax(logits2[..., :nc], axis=-1),
             jnp.argmax(logits2[..., nc:], axis=-1)], axis=2
        ).astype(jnp.int32)  # (B, H/2, 2, W)
        return cls2.reshape(b2, 2 * rh2, w2)
    return _h_d2s(logits2, nc)


def make_s2d_predict_fn(model, variables, argmax: bool = False,
                        input_dtype: Optional[Any] = None):
    """Pack once, return a jitted ``predict(images)`` on the s2d graph."""
    del model  # packing is tree-driven
    packed = pack_unet_s2d(variables)

    @jax.jit
    def predict(images):
        if input_dtype is not None:
            images = images.astype(input_dtype)
        return unet_s2d_apply(packed, images, argmax=argmax)

    return predict
