"""BN-folded serving graphs for the ResNet families (DeepLabV3 / FCN).

Exact-parity eval-mode restructuring of :class:`insarseg.models.deeplab.
DeepLabV3` and :class:`insarseg.models.fcn.FCN` (all attention variants,
resnet50/101 backbones): every BatchNorm is folded into the preceding
conv's ``y * s + b`` epilogue at pack time (insarseg.ops.fold), so the
compiled graph is a chain of conv + fused-affine(+ReLU) kOutput fusions
with no standalone BN passes. Same math as ``model.apply(train=False)``
up to float reassociation (dropout is identity in eval mode).

Unlike the UNet serving graph (unet_serve.py) no gate deferral is needed:
the SE / CBAM multiplies here sit immediately before a residual add or a
conv, positions XLA already fuses.

The pack functions are tree-driven — they consume the exact
``{'params','batch_stats'}`` tree of the Flax modules and infer the
variant (block counts, SE bottlenecks, attention flavor, the DeepLab-SA
dropped-BN quirk) from the tree structure. Reference models being served:
/root/reference/DeepLabV3.py:64,98-100, DeepLabV3-ChannelAttention.py:
124-162, DeepLabV3-SpatialAttention.py:119,127-148, PSPNet.py:41-104,
PSPNet-ChannelAttention.py:131-203, PSPNet-SpatialAttention.py:77-152.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from insarseg.ops.fold import fold_bn
from insarseg.ops.layers import max_pool_2d
from insarseg.ops.resize import resize_bilinear


# ---------------------------------------------------------------------------
# pack (host-side, runs once)
# ---------------------------------------------------------------------------

def _fold_conv(pc: Dict, pbn: Dict, sbn: Dict) -> Dict[str, Any]:
    s, b = fold_bn(pbn, sbn, pc.get("bias"))
    return {"k": jnp.asarray(pc["kernel"]), "s": s, "b": b}


def _layer_schedule(layers, replace_stride_with_dilation=(False, True, True)):
    """Reproduce torchvision's stride/dilation bookkeeping (resnet.py:126-148):
    returns per-layer lists of (stride, dilation) per block."""
    dilation = 1
    strides = (1, 2, 2, 2)
    sched = []
    for li in range(4):
        stride = strides[li]
        dilate = li > 0 and replace_stride_with_dilation[li - 1]
        previous_dilation = dilation
        if dilate:
            dilation *= stride
            stride = 1
        blocks = [(stride, previous_dilation)]
        blocks += [(1, dilation)] * (layers[li] - 1)
        sched.append(blocks)
    return sched


def pack_backbone(p: Dict, s: Dict) -> Dict[str, Any]:
    """ResNet50/101 {'params','batch_stats'} subtree -> folded serving tree.
    Block counts, SE presence, and downsample branches are read off the tree."""
    layers = []
    for li in range(1, 5):
        n = 0
        while f"layer{li}_{n}" in p:
            n += 1
        layers.append(n)
    sched = _layer_schedule(tuple(layers))

    packed: Dict[str, Any] = {
        "stem": _fold_conv(p["conv1"], p["bn1"], s["bn1"]),
        "layers": layers,
    }
    for li in range(4):
        for bi in range(layers[li]):
            name = f"layer{li + 1}_{bi}"
            bp, bs = p[name], s[name]
            stride, dilation = sched[li][bi]
            blk: Dict[str, Any] = {
                "c1": _fold_conv(bp["conv1"], bp["bn1"], bs["bn1"]),
                "c2": _fold_conv(bp["conv2"], bp["bn2"], bs["bn2"]),
                "c3": _fold_conv(bp["conv3"], bp["bn3"], bs["bn3"]),
                "stride": stride,
                "dilation": dilation,
            }
            if "se_block" in bp:
                blk["fc1"] = jnp.asarray(bp["se_block"]["fc1"]["kernel"])[0, 0]
                blk["fc2"] = jnp.asarray(bp["se_block"]["fc2"]["kernel"])[0, 0]
            if "downsample_conv" in bp:
                blk["ds"] = _fold_conv(
                    bp["downsample_conv"], bp["downsample_bn"],
                    bs["downsample_bn"])
            packed[name] = blk
    return packed


def pack_deeplab_serve(variables: Dict[str, Any]) -> Dict[str, Any]:
    """DeepLabV3 {'params','batch_stats'} -> BN-folded serving tree."""
    p, s = variables["params"], variables["batch_stats"]
    ap, asst = p["aspp"], s["aspp"]
    packed: Dict[str, Any] = {
        "kind": "deeplab",
        "backbone": pack_backbone(p["backbone"], s["backbone"]),
        "aspp": {
            "b0": _fold_conv(ap["conv0"], ap["bn0"], asst["bn0"]),
            "rates": (12, 24, 36),
            "pool": _fold_conv(ap["pool_conv"], ap["pool_bn"], asst["pool_bn"]),
            "project": _fold_conv(ap["project_conv"], ap["project_bn"],
                                  asst["project_bn"]),
        },
    }
    for i in range(1, 4):
        packed["aspp"][f"b{i}"] = _fold_conv(ap[f"conv{i}"], ap[f"bn{i}"],
                                             asst[f"bn{i}"])
    if "head_bn" in p:
        packed["head"] = _fold_conv(p["head_conv"], p["head_bn"], s["head_bn"])
    else:
        # DeepLab-SA quirk: classifier keeps only the raw 3x3 conv — no BN,
        # no ReLU (deeplab.py:107-112).
        packed["head"] = {"k": jnp.asarray(p["head_conv"]["kernel"])}
    packed["attention"] = _pack_attention(p.get("attention"))
    packed["classifier"] = {
        "k": jnp.asarray(p["classifier"]["kernel"]),
        "bias": jnp.asarray(p["classifier"]["bias"])
        if "bias" in p["classifier"] else None,
    }
    return packed


def pack_fcn_serve(variables: Dict[str, Any]) -> Dict[str, Any]:
    """FCN {'params','batch_stats'} -> BN-folded serving tree."""
    p, s = variables["params"], variables["batch_stats"]
    cp, cs = p["classifier"], s["classifier"]
    packed: Dict[str, Any] = {
        "kind": "fcn",
        "backbone": pack_backbone(p["backbone"], s["backbone"]),
        "head": _fold_conv(cp["conv1"], cp["bn1"], cs["bn1"]),
        "classifier": {
            "k": jnp.asarray(cp["conv2"]["kernel"]),
            "bias": jnp.asarray(cp["conv2"]["bias"])
            if "bias" in cp["conv2"] else None,
        },
        "attention": _pack_attention(p.get("spatial_attention")),
    }
    return packed


def pack_pspnet_serve(variables: Dict[str, Any]) -> Dict[str, Any]:
    """True-PSPNet {'params','batch_stats'} -> BN-folded serving tree."""
    p, s = variables["params"], variables["batch_stats"]
    pp, ps = p["ppm"], s["ppm"]
    packed: Dict[str, Any] = {
        "kind": "pspnet",
        "backbone": pack_backbone(p["backbone"], s["backbone"]),
        "ppm": {"bins": (1, 2, 3, 6)},
        "head": _fold_conv(p["bottleneck_conv"], p["bottleneck_bn"],
                           s["bottleneck_bn"]),
        "classifier": {
            "k": jnp.asarray(p["classifier"]["kernel"]),
            "bias": jnp.asarray(p["classifier"]["bias"])
            if "bias" in p["classifier"] else None,
        },
        "attention": _pack_attention(p.get("spatial_attention")),
    }
    for b in packed["ppm"]["bins"]:
        packed["ppm"][f"bin{b}"] = _fold_conv(
            pp[f"conv_bin{b}"], pp[f"bn_bin{b}"], ps[f"bn_bin{b}"])
    return packed


def _pack_attention(ap: Optional[Dict]) -> Optional[Dict[str, Any]]:
    if ap is None:
        return None
    if "mlp_fc1" in ap:  # ChannelAttentionModule (CBAM-channel)
        return {"type": "channel",
                "fc1": jnp.asarray(ap["mlp_fc1"]["kernel"])[0, 0],
                "fc2": jnp.asarray(ap["mlp_fc2"]["kernel"])[0, 0]}
    return {"type": "spatial", "k": jnp.asarray(ap["conv"]["kernel"])}


# ---------------------------------------------------------------------------
# forward (dtype follows the input; params cast on the fly)
# ---------------------------------------------------------------------------

def _ca(x, c, stride: int = 1, dilation: int = 1, relu: bool = True):
    """conv + folded-BN affine epilogue (+ReLU); same-padding for the odd
    kernels used here (pad = dilation * (k-1)//2)."""
    kh, kw = c["k"].shape[0], c["k"].shape[1]
    y = lax.conv_general_dilated(
        x, c["k"].astype(x.dtype), window_strides=(stride, stride),
        padding=((dilation * (kh - 1) // 2,) * 2,
                 (dilation * (kw - 1) // 2,) * 2),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * c["s"].astype(y.dtype) + c["b"].astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y


def _bottleneck(blk: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = _ca(x, blk["c1"])
    y = _ca(y, blk["c2"], stride=blk["stride"], dilation=blk["dilation"])
    y = _ca(y, blk["c3"], relu=False)
    if "fc1" in blk:  # SE before the residual add (resnet.py:88-91)
        pooled = jnp.mean(y, axis=(1, 2))
        g = jnp.maximum(pooled @ blk["fc1"].astype(pooled.dtype), 0)
        g = jax.nn.sigmoid(
            (g @ blk["fc2"].astype(g.dtype)).astype(jnp.float32))
        y = y * g.astype(y.dtype)[:, None, None, :]
    identity = x if "ds" not in blk else _ca(x, blk["ds"], stride=blk["stride"],
                                             relu=False)
    return jnp.maximum(y + identity, 0)


def backbone_apply(pb: Dict, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Folded ResNet forward; returns {'out': layer4, 'aux': layer3}."""
    y = _ca(x, pb["stem"], stride=2)
    y = max_pool_2d(y, 3, stride=2, padding=1)
    feats = {}
    for li in range(4):
        for bi in range(pb["layers"][li]):
            y = _bottleneck(pb[f"layer{li + 1}_{bi}"], y)
        if li == 2:
            feats["aux"] = y
    feats["out"] = y
    return feats


def _aspp_apply(pa: Dict, x: jnp.ndarray) -> jnp.ndarray:
    branches = [_ca(x, pa["b0"])]
    for i, rate in enumerate(pa["rates"], start=1):
        branches.append(_ca(x, pa[f"b{i}"], dilation=rate))
    p = jnp.mean(x, axis=(1, 2), keepdims=True)
    p = _ca(p, pa["pool"])
    branches.append(jnp.broadcast_to(p, x.shape[:3] + (p.shape[-1],)))
    y = jnp.concatenate(branches, axis=-1)
    return _ca(y, pa["project"])  # dropout: identity in eval


def _attention_apply(att: Optional[Dict], y: jnp.ndarray) -> jnp.ndarray:
    if att is None:
        return y
    if att["type"] == "channel":
        def mlp(v):
            h = jnp.maximum(v @ att["fc1"].astype(v.dtype), 0)
            return h @ att["fc2"].astype(h.dtype)
        avg = mlp(jnp.mean(y, axis=(1, 2)))
        mx = mlp(jnp.max(y, axis=(1, 2)))
        g = jax.nn.sigmoid((avg + mx).astype(jnp.float32))
        return y * g.astype(y.dtype)[:, None, None, :]
    # CBAM-spatial: channel mean/max -> conv(2->1, k7) -> sigmoid
    m = jnp.concatenate([jnp.mean(y, axis=-1, keepdims=True),
                         jnp.max(y, axis=-1, keepdims=True)], axis=-1)
    k = att["k"].astype(y.dtype)
    kh = k.shape[0]
    m = lax.conv_general_dilated(
        m, k, (1, 1), ((kh // 2,) * 2, (kh // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y * jax.nn.sigmoid(m.astype(jnp.float32)).astype(y.dtype)


def _classify(pc: Dict, y: jnp.ndarray, input_size, argmax: bool):
    logits = lax.conv_general_dilated(
        y, pc["k"].astype(y.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if pc["bias"] is not None:
        logits = logits + pc["bias"].astype(logits.dtype)
    logits = resize_bilinear(logits, input_size)
    if argmax:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return logits


def resnet_serve_apply(packed: Dict[str, Any], x: jnp.ndarray,
                       argmax: bool = False) -> jnp.ndarray:
    """Eval-mode DeepLabV3/FCN forward on the folded tree. ``x``:
    (B, H, W, C_in); returns logits (B, H, W, nc) or int32 class maps."""
    input_size = x.shape[1:3]
    feats = backbone_apply(packed["backbone"], x)
    y = feats["out"]
    if packed["kind"] == "deeplab":
        y = _aspp_apply(packed["aspp"], y)
        if "s" in packed["head"]:
            y = _ca(y, packed["head"])
        else:  # SA quirk: bare conv, no BN/ReLU
            k = packed["head"]["k"].astype(y.dtype)
            y = lax.conv_general_dilated(
                y, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _attention_apply(packed["attention"], y)
    elif packed["kind"] == "pspnet":
        y = _attention_apply(packed["attention"], y)
        y = _ppm_apply(packed["ppm"], y)
        y = _ca(y, packed["head"])  # dropout: identity in eval
    else:  # fcn: (spatial attention on backbone out) -> head
        y = _attention_apply(packed["attention"], y)
        y = _ca(y, packed["head"])  # dropout: identity in eval
    return _classify(packed["classifier"], y, input_size, argmax)


def _ppm_apply(pp: Dict, x: jnp.ndarray) -> jnp.ndarray:
    from insarseg.ops.layers import adaptive_avg_pool_2d

    size = x.shape[1:3]
    outs = [x]
    for b in pp["bins"]:
        p = adaptive_avg_pool_2d(x, b)
        p = _ca(p, pp[f"bin{b}"])
        outs.append(resize_bilinear(p, size))
    return jnp.concatenate(outs, axis=-1)


def pack_resnet_serve(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Auto-detect DeepLabV3 / FCN / PSPNet from the param tree and pack."""
    if "aspp" in variables["params"]:
        return pack_deeplab_serve(variables)
    if "ppm" in variables["params"]:
        return pack_pspnet_serve(variables)
    return pack_fcn_serve(variables)


def make_resnet_serve_predict_fn(variables: Dict[str, Any],
                                 argmax: bool = False,
                                 input_dtype: Optional[Any] = None,
                                 mesh=None):
    """Pack once, return a jitted ``predict(images)`` on the folded graph.

    With ``mesh`` the batch shards over the mesh's ``data`` axis (weights
    replicated). No H/W envelope: the strided stem and dilated layers pad
    like the module graph and the head resizes back to the input size.
    """
    from insarseg.engines import jit_engine, mesh_replicate_packed

    packed = mesh_replicate_packed(pack_resnet_serve(variables), mesh)

    def predict(images):
        if input_dtype is not None:
            images = images.astype(input_dtype)
        return resnet_serve_apply(packed, images, argmax=argmax)

    return jit_engine(predict, mesh)
