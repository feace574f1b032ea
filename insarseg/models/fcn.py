"""FCN-ResNet50 family — the models the reference calls "PSPNet".

The reference's three ``PSPNet*.py`` scripts actually wrap torchvision
``fcn_resnet50`` (SURVEY.md §0 naming trap): class ``FCN_SingleChannel``
(/root/reference/PSPNet.py:41-104), SE variant with ``BottleneckWithSE``
swapped into every backbone layer (/root/reference/
PSPNet-ChannelAttention.py:131-203), and a spatial-attention variant applying
CBAM-spatial to the backbone output before the head
(/root/reference/PSPNet-SpatialAttention.py:77-152).

FCNHead (torchvision): Conv3x3(2048->512, pad 1, bias-free) -> BN -> ReLU ->
Dropout(0.1) -> Conv1x1(512->num_classes); forward bilinear-upsamples the
logits to the input size (align_corners=False).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from insarseg.models.resnet import ResNet50, backbone_layers
from insarseg.ops.blocks import SpatialAttentionConv
from insarseg.ops.layers import BatchNorm2d, Conv2d
from insarseg.ops.resize import resize_bilinear

Dtype = Any

class FCNHead(nn.Module):
    num_classes: int = 2
    inter_features: Optional[int] = None  # default in//4 (2048 -> 512)
    dropout_rate: float = 0.1  # torchvision default; 0 for dynamics-parity tests
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inter = self.inter_features or x.shape[-1] // 4
        y = Conv2d(inter, 3, padding=1, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        y = BatchNorm2d(use_running_average=not train, dtype=self.dtype,
                        name="bn1")(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return Conv2d(self.num_classes, 1, dtype=self.dtype, name="conv2")(y)


class FCN(nn.Module):
    """FCN-ResNet50 over NHWC; ``attention`` in {'none', 'channel',
    'spatial'}: channel = SE bottlenecks throughout the backbone, spatial =
    CBAM-spatial on the backbone output before the head."""

    num_classes: int = 2
    attention: str = "none"
    backbone: str = "resnet50"
    dropout_rate: float = 0.1
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
        y = FCNHead(self.num_classes, dropout_rate=self.dropout_rate,
                    dtype=self.dtype, name="classifier")(y, train=train)
        return resize_bilinear(y, input_size)
