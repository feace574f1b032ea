"""True PSPNet (pyramid pooling head) — the extension the reference *named*
but never implemented.

The reference's "PSPNet" scripts wrap FCN-ResNet50 (see insarseg.models.fcn);
its README claims an ASPP head that also doesn't exist (/root/reference/
Readme.md:14, SURVEY.md §0). This module provides the real architecture the
name promised (Zhao et al., CVPR 2017), as the optional extension called for
in SURVEY.md §0 and BASELINE.json configs[5]:

PPM head: for bins (1, 2, 3, 6), adaptive-avg-pool the OS=8 feature map to
bin x bin -> Conv1x1(2048->512, bias-free) -> BN -> ReLU -> bilinear upsample
back -> concat with the input (2048 + 4*512 = 4096) -> Conv3x3(4096->512,
bias-free) -> BN -> ReLU -> Dropout(0.1) -> Conv1x1(512->classes) ->
bilinear upsample to input.

Attention variants mirror the FCN family's insertion points: channel = SE
bottlenecks in the backbone; spatial = CBAM-spatial on the backbone output.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from insarseg.models.resnet import ResNet50, backbone_layers
from insarseg.ops.blocks import SpatialAttentionConv
from insarseg.ops.layers import BatchNorm2d, Conv2d, adaptive_avg_pool_2d
from insarseg.ops.resize import resize_bilinear

Dtype = Any

class PyramidPooling(nn.Module):
    bins: Sequence[int] = (1, 2, 3, 6)
    branch_features: int = 512
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        size = x.shape[1:3]
        outs = [x]
        for b in self.bins:
            p = adaptive_avg_pool_2d(x, b)
            p = Conv2d(self.branch_features, 1, use_bias=False, dtype=self.dtype,
                       name=f"conv_bin{b}")(p)
            p = BatchNorm2d(use_running_average=not train, dtype=self.dtype,
                            name=f"bn_bin{b}")(p)
            p = nn.relu(p)
            outs.append(resize_bilinear(p, size))
        return jnp.concatenate(outs, axis=-1)


class PSPNet(nn.Module):
    num_classes: int = 2
    attention: str = "none"
    backbone: str = "resnet50"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.attention in ("none", "channel", "spatial")
        input_size = x.shape[1:3]
        feats = ResNet50(
            layers=backbone_layers(self.backbone),
            use_se=self.attention == "channel", dtype=self.dtype, name="backbone"
        )(x, train=train)
        y = feats["out"]
        if self.attention == "spatial":
            y = SpatialAttentionConv(kernel_size=7, dtype=self.dtype,
                                     name="spatial_attention")(y)
        y = PyramidPooling(dtype=self.dtype, name="ppm")(y, train=train)
        y = Conv2d(512, 3, padding=1, use_bias=False, dtype=self.dtype,
                   name="bottleneck_conv")(y)
        y = BatchNorm2d(use_running_average=not train, dtype=self.dtype,
                        name="bottleneck_bn")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        y = Conv2d(self.num_classes, 1, dtype=self.dtype, name="classifier")(y)
        return resize_bilinear(y, input_size)
