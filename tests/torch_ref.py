"""Golden-reference executors: run insarseg param trees through torch
functional ops (CPU) to validate numerics against PyTorch semantics.

These are *test utilities*, written functional-style against
``torch.nn.functional`` — they consume insarseg's JAX parameter pytrees
directly, so any layout/semantics mismatch between our NHWC layers and
torch's NCHW modules shows up as a numeric diff, not a silent pass.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def t(x) -> torch.Tensor:
    if isinstance(x, torch.Tensor):
        return x  # pass through live (possibly grad-tracking) tensors
    a = np.asarray(x)
    if a.dtype != np.float64:  # preserve f64 (x64 parity runs); else f32
        a = a.astype(np.float32)
    return torch.from_numpy(a)


def conv2d(x, p, stride=1, padding=0, dilation=1, groups=1):
    w = t(p["kernel"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = t(p["bias"]) if "bias" in p else None
    return F.conv2d(x, w, b, stride=stride, padding=padding, dilation=dilation, groups=groups)


def conv_transpose2d(x, p, stride=1, padding=0):
    w = t(p["kernel"]).permute(2, 3, 0, 1)  # HWIO(kh,kw,cin,cout) -> (cin,cout,kh,kw)
    b = t(p["bias"]) if "bias" in p else None
    return F.conv_transpose2d(x, w, b, stride=stride, padding=padding)


def linear(x, p):
    w = t(p["kernel"]).T  # (in,out) -> (out,in)
    b = t(p["bias"]) if "bias" in p else None
    return F.linear(x, w, b)


def batch_norm(x, p, s, training=False, momentum=0.1, eps=1e-5):
    # When the stats tree holds LIVE torch tensors (training-dynamics parity
    # tests build one with _to_torch_tree), F.batch_norm's in-place running-
    # stat update persists in the tree — exactly nn.BatchNorm2d's behavior.
    # Numpy/jax-backed trees get a fresh clone (logit-parity tests, no
    # mutation of the caller's arrays).
    rm, rv = t(s["mean"]), t(s["var"])
    if not isinstance(s["mean"], torch.Tensor):
        rm, rv = rm.clone(), rv.clone()
    y = F.batch_norm(x, rm, rv, t(p["scale"]), t(p["bias"]),
                     training=training, momentum=momentum, eps=eps)
    return y, rm, rv


def se_layer(x, p):
    b, c = x.shape[0], x.shape[1]
    y = x.mean(dim=(2, 3))
    y = F.relu(linear(y, p["fc1"]))
    y = torch.sigmoid(linear(y, p["fc2"]))
    return x * y.view(b, c, 1, 1)


def se_block(x, p):
    y = x.mean(dim=(2, 3), keepdim=True)
    y = F.relu(conv2d(y, p["fc1"]))
    y = torch.sigmoid(conv2d(y, p["fc2"]))
    return x * y


def channel_attention(x, p):
    def mlp(v):
        return conv2d(F.relu(conv2d(v, p["mlp_fc1"])), p["mlp_fc2"])

    avg = mlp(F.adaptive_avg_pool2d(x, 1))
    mx = mlp(F.adaptive_max_pool2d(x, 1))
    return x * torch.sigmoid(avg + mx)


def double_conv(x, p, s, training=False):
    x = conv2d(x, p["conv1"], padding=1)
    x, _, _ = batch_norm(x, p["bn1"], s["bn1"], training)
    x = F.relu(x)
    x = conv2d(x, p["conv2"], padding=1)
    x, _, _ = batch_norm(x, p["bn2"], s["bn2"], training)
    x = F.relu(x)
    if "se" in p:
        x = se_layer(x, p["se"])
    return x


def spatial_attention_dc(x, p, s, training=False):
    avg = x.mean(dim=1, keepdim=True)
    mx = x.max(dim=1, keepdim=True).values
    m = torch.cat([avg, mx], dim=1)
    m = double_conv(m, p["compress_and_map"], s["compress_and_map"], training)
    return x * torch.sigmoid(m)


def spatial_attention_conv(x, p, kernel_size=7):
    avg = x.mean(dim=1, keepdim=True)
    mx = x.max(dim=1, keepdim=True).values
    m = torch.cat([avg, mx], dim=1)
    m = conv2d(m, p["conv"], padding=kernel_size // 2)
    return x * torch.sigmoid(m)


def unet_forward(x, params, stats, use_sa=False, training=False):
    """Torch-functional twin of insarseg.models.unet.UNet (NCHW input)."""
    x1 = double_conv(x, params["inc"], stats["inc"], training)
    x2 = double_conv(F.max_pool2d(x1, 2), params["down1"], stats["down1"], training)
    x3 = double_conv(F.max_pool2d(x2, 2), params["down2"], stats["down2"], training)
    x4 = double_conv(F.max_pool2d(x3, 2), params["down3"], stats["down3"], training)
    x5 = double_conv(F.max_pool2d(x4, 2), params["down4"], stats["down4"], training)

    y = x5
    for idx, skip in ((1, x4), (2, x3), (3, x2), (4, x1)):
        y = conv_transpose2d(y, params[f"up{idx}"], stride=2)
        y = torch.cat([skip, y], dim=1)
        if use_sa:
            y = spatial_attention_dc(y, params[f"sa{idx}"], stats[f"sa{idx}"], training)
        y = double_conv(y, params[f"conv{idx}"], stats[f"conv{idx}"], training)

    return conv2d(y, params["outc"])


# ---- ResNet-50 / DeepLab / FCN twins (torchvision-segmentation semantics) --

def bottleneck(x, p, s, stride, dilation, training=False):
    out = conv2d(x, p["conv1"])
    out, _, _ = batch_norm(out, p["bn1"], s["bn1"], training)
    out = F.relu(out)
    out = conv2d(out, p["conv2"], stride=stride, padding=dilation, dilation=dilation)
    out, _, _ = batch_norm(out, p["bn2"], s["bn2"], training)
    out = F.relu(out)
    out = conv2d(out, p["conv3"])
    out, _, _ = batch_norm(out, p["bn3"], s["bn3"], training)
    if "se_block" in p:
        out = se_block(out, p["se_block"])
    if "downsample_conv" in p:
        identity = conv2d(x, p["downsample_conv"], stride=stride)
        identity, _, _ = batch_norm(identity, p["downsample_bn"], s["downsample_bn"], training)
    else:
        identity = x
    return F.relu(out + identity)


def resnet50_forward(x, params, stats, training=False,
                     replace_stride_with_dilation=(False, True, True)):
    x = conv2d(x, params["conv1"], stride=2, padding=3)
    x, _, _ = batch_norm(x, params["bn1"], stats["bn1"], training)
    x = F.relu(x)
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    dilation = 1
    aux = None
    layers, strides = (3, 4, 6, 3), (1, 2, 2, 2)
    for li in range(4):
        stride = strides[li]
        dilate = li > 0 and replace_stride_with_dilation[li - 1]
        previous_dilation = dilation
        if dilate:
            dilation *= stride
            stride = 1
        for bi in range(layers[li]):
            name = f"layer{li + 1}_{bi}"
            first = bi == 0
            x = bottleneck(
                x, params[name], stats[name],
                stride=stride if first else 1,
                dilation=previous_dilation if first else dilation,
                training=training,
            )
        if li == 2:
            aux = x
    return {"out": x, "aux": aux}


def aspp_forward(x, p, s, training=False, rates=(12, 24, 36)):
    outs = []
    b = conv2d(x, p["conv0"])
    b, _, _ = batch_norm(b, p["bn0"], s["bn0"], training)
    outs.append(F.relu(b))
    for i, r in enumerate(rates, start=1):
        b = conv2d(x, p[f"conv{i}"], padding=r, dilation=r)
        b, _, _ = batch_norm(b, p[f"bn{i}"], s[f"bn{i}"], training)
        outs.append(F.relu(b))
    pool = x.mean(dim=(2, 3), keepdim=True)
    pool = conv2d(pool, p["pool_conv"])
    pool, _, _ = batch_norm(pool, p["pool_bn"], s["pool_bn"], training)
    pool = F.relu(pool).expand(-1, -1, x.shape[2], x.shape[3])
    outs.append(pool)
    y = torch.cat(outs, dim=1)
    y = conv2d(y, p["project_conv"])
    y, _, _ = batch_norm(y, p["project_bn"], s["project_bn"], training)
    return F.relu(y)  # dropout inactive in eval


def deeplab_forward(x, params, stats, attention="none", training=False):
    input_size = x.shape[-2:]
    feats = resnet50_forward(x, params["backbone"], stats["backbone"], training)
    y = aspp_forward(feats["out"], params["aspp"], stats["aspp"], training)
    y = conv2d(y, params["head_conv"], padding=1)
    if attention != "spatial":
        y, _, _ = batch_norm(y, params["head_bn"], stats["head_bn"], training)
        y = F.relu(y)
    if attention == "channel":
        y = channel_attention(y, params["attention"])
    elif attention == "spatial":
        y = spatial_attention_conv(y, params["attention"], kernel_size=7)
    y = conv2d(y, params["classifier"])
    return F.interpolate(y, size=input_size, mode="bilinear", align_corners=False)


def fcn_forward(x, params, stats, attention="none", training=False):
    input_size = x.shape[-2:]
    feats = resnet50_forward(x, params["backbone"], stats["backbone"], training)
    y = feats["out"]
    if attention == "spatial":
        y = spatial_attention_conv(y, params["spatial_attention"], kernel_size=7)
    h = params["classifier"]
    hs = stats["classifier"]
    y = conv2d(y, h["conv1"], padding=1)
    y, _, _ = batch_norm(y, h["bn1"], hs["bn1"], training)
    y = F.relu(y)  # dropout inactive in eval
    y = conv2d(y, h["conv2"])
    return F.interpolate(y, size=input_size, mode="bilinear", align_corners=False)
