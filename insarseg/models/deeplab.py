"""DeepLabV3 family: plain / channel-attention / spatial-attention.

Reproduces torchvision's ``deeplabv3_resnet50`` graph (dilated ResNet-50 ->
ASPP -> head -> bilinear upsample to input) as wrapped by the reference:

- plain: classifier final conv swapped to ``Conv2d(256, num_classes, 1)``,
  forward returns the upsampled 'out' (/root/reference/DeepLabV3.py:64,98-100).
- channel-attention: head decomposed into aspp / post_aspp_conv
  (= classifier[1..3]: Conv3x3 + BN + ReLU) / final 1x1; CBAM channel module
  inserted between post-conv and final conv
  (/root/reference/DeepLabV3-ChannelAttention.py:124-162).
- spatial-attention: same decomposition **but** post_aspp_conv keeps only
  classifier[1] (the 3x3 conv) — BN and ReLU are dropped
  (/root/reference/DeepLabV3-SpatialAttention.py:119,127-148). This is a real
  behavioral quirk of the reference, replicated for parity.

ASPP (torchvision): 1x1 branch + three 3x3 atrous branches (rates 12/24/36,
pad=rate, bias-free) + image-pool branch (GAP -> 1x1 -> BN -> ReLU ->
bilinear broadcast back), concat (1280ch) -> 1x1 project -> BN -> ReLU ->
Dropout(0.5). The multi-rate branches are independent MXU convs over the
same OS=8 feature map — XLA schedules them back-to-back from one VMEM
residency of the input.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from insarseg.models.resnet import ResNet50, backbone_layers
from insarseg.ops.blocks import ChannelAttentionModule, SpatialAttentionConv
from insarseg.ops.layers import BatchNorm2d, Conv2d, global_avg_pool
from insarseg.ops.resize import resize_bilinear

Dtype = Any


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling, torchvision semantics, 256 channels."""

    features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dropout_rate: float = 0.5  # torchvision default; 0 for dynamics-parity tests
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: BatchNorm2d(
            use_running_average=not train, dtype=self.dtype, name=name
        )
        f = self.features

        branches = []
        # branch 0: 1x1 conv
        b = nn.relu(bn("bn0")(Conv2d(f, 1, use_bias=False, dtype=self.dtype,
                                     name="conv0")(x)))
        branches.append(b)
        # branches 1..3: 3x3 atrous
        for i, rate in enumerate(self.rates, start=1):
            b = nn.relu(
                bn(f"bn{i}")(
                    Conv2d(
                        f, 3, padding=rate, dilation=rate, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}",
                    )(x)
                )
            )
            branches.append(b)
        # branch 4: image-level pooling
        p = global_avg_pool(x)
        p = nn.relu(bn("pool_bn")(Conv2d(f, 1, use_bias=False, dtype=self.dtype,
                                         name="pool_conv")(p)))
        p = jnp.broadcast_to(p, x.shape[:3] + (f,))
        branches.append(p)

        y = jnp.concatenate(branches, axis=-1)
        y = nn.relu(bn("project_bn")(Conv2d(f, 1, use_bias=False, dtype=self.dtype,
                                            name="project_conv")(y)))
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


class DeepLabV3(nn.Module):
    """DeepLabV3-ResNet50 over NHWC; ``attention`` in {'none', 'channel',
    'spatial'} selects the reference variant (incl. the SA post-conv quirk)."""

    num_classes: int = 2
    attention: str = "none"
    backbone: str = "resnet50"
    dropout_rate: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.attention in ("none", "channel", "spatial")
        input_size = x.shape[1:3]
        feats = ResNet50(layers=backbone_layers(self.backbone),
                         dtype=self.dtype, name="backbone")(x, train=train)
        y = ASPP(dropout_rate=self.dropout_rate, dtype=self.dtype,
                 name="aspp")(feats["out"], train=train)

        # classifier[1]: Conv3x3(256, 256, pad=1, bias-free)
        y = Conv2d(256, 3, padding=1, use_bias=False, dtype=self.dtype,
                   name="head_conv")(y)
        if self.attention != "spatial":
            # classifier[2,3]: BN + ReLU — dropped by the SA variant
            # (/root/reference/DeepLabV3-SpatialAttention.py:119).
            y = BatchNorm2d(use_running_average=not train, dtype=self.dtype,
                            name="head_bn")(y)
            y = nn.relu(y)

        if self.attention == "channel":
            y = ChannelAttentionModule(dtype=self.dtype, name="attention")(y)
        elif self.attention == "spatial":
            y = SpatialAttentionConv(kernel_size=7, dtype=self.dtype,
                                     name="attention")(y)

        # classifier[4]: final 1x1 to num_classes
        y = Conv2d(self.num_classes, 1, dtype=self.dtype, name="classifier")(y)
        return resize_bilinear(y, input_size)
