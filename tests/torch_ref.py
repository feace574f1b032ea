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
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


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
    rm, rv = t(s["mean"]).clone(), t(s["var"]).clone()
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
