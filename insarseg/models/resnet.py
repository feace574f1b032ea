"""Dilated ResNet-50 backbone (torchvision-segmentation semantics), NHWC.

The DeepLabV3 / FCN reference models wrap torchvision backbones built with
``replace_stride_with_dilation=[False, True, True]`` (output stride 8) and a
single-channel stem conv (/root/reference/DeepLabV3.py:55,67-96,
PSPNet.py:51,68-89). This module re-implements that backbone TPU-first:

- stem: Conv7x7 s2 p3 (bias-free) -> BN -> ReLU -> MaxPool3 s2 p1;
- layers [3, 4, 6, 3] of Bottleneck blocks, widths [64, 128, 256, 512],
  expansion 4;
- torchvision's dilation bookkeeping reproduced exactly: with dilate=True a
  layer's stride moves into dilation, the layer's *first* block keeps the
  previous dilation while later blocks use the new one (so layer3 = d(1,2,2,
  2,2,2), layer4 = d(2,4,4));
- optional SE bottlenecks: ``SEBlock`` after conv3/bn3, *before* the residual
  add — the ``BottleneckWithSE`` wrapper of
  /root/reference/PSPNet-ChannelAttention.py:83-126;
- torchvision init: conv kaiming_normal(fan_out, relu), BN gamma=1 beta=0.

Returns the IntermediateLayerGetter dict {'out': layer4, 'aux': layer3}
(tap points per torchvision segmentation).

TPU notes: NHWC; the dilated 3x3 convs lower to MXU convs; BN is sync under a
sharded batch; use ``dtype=bfloat16`` for inference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from insarseg.ops.blocks import SEBlock
from insarseg.ops.layers import BatchNorm2d, Conv2d, max_pool_2d

Dtype = Any

# torchvision ResNet conv init: kaiming_normal_(mode='fan_out',
# nonlinearity='relu') => N(0, sqrt(2/fan_out)), fan_out = cout*kh*kw.
# torch uses an untruncated normal, hence "normal" not flax's default
# truncated variant.
kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

BACKBONE_LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def backbone_layers(name: str):
    if name not in BACKBONE_LAYERS:
        raise ValueError(f"Unsupported backbone: {name}")
    return BACKBONE_LAYERS[name]


class Bottleneck(nn.Module):
    """ResNet Bottleneck (1x1 -> 3x3(stride, dilation) -> 1x1 x4), optional
    SE before the residual add."""

    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    use_se: bool = False
    dtype: Optional[Dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = lambda f, k, name, **kw: Conv2d(
            f, k, use_bias=False, kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype, name=name, **kw
        )
        bn = lambda name: BatchNorm2d(
            use_running_average=not train, dtype=self.dtype, name=name
        )

        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(
            bn("bn2")(
                conv(
                    self.planes, 3, "conv2",
                    stride=self.stride, padding=self.dilation,
                    dilation=self.dilation,
                )(out)
            )
        )
        out = bn("bn3")(conv(self.planes * self.expansion, 1, "conv3")(out))
        if self.use_se:
            # SE inserted after conv3/bn3, BEFORE the residual add
            # (/root/reference/PSPNet-ChannelAttention.py:117-124).
            out = SEBlock(dtype=self.dtype, name="se_block")(out)
        if self.use_downsample:
            identity = bn("downsample_bn")(
                conv(
                    self.planes * self.expansion, 1, "downsample_conv",
                    stride=self.stride,
                )(x)
            )
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """ResNet-50/101 feature extractor (no avgpool/fc), output-stride 8 by
    default. Input NHWC (any channel count — the reference grafts a 1-channel
    stem); returns {'out': (B,H/8,W/8,2048), 'aux': (B,H/8,W/8,1024)}.

    ``layers=(3,4,23,3)`` gives ResNet-101 — the reference models accept
    ``backbone='resnet101'`` (/root/reference/DeepLabV3.py:57-58,
    PSPNet.py:55-57)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, True, True)
    use_se: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = Conv2d(
            64, 7, stride=2, padding=3, use_bias=False,
            kernel_init=kaiming_normal_fan_out, dtype=self.dtype, name="conv1",
        )(x)
        x = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_2d(x, 3, stride=2, padding=1)

        dilation = 1
        in_planes = 64
        feats = {}
        widths = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        for li in range(4):
            planes, stride = widths[li], strides[li]
            dilate = li > 0 and self.replace_stride_with_dilation[li - 1]
            previous_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for bi in range(self.layers[li]):
                first = bi == 0
                x = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=previous_dilation if first else dilation,
                    use_downsample=first and (stride != 1 or in_planes != planes * 4),
                    use_se=self.use_se,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)
            in_planes = planes * 4
            if li == 2:
                feats["aux"] = x
        feats["out"] = x
        return feats
