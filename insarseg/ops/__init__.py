"""Primitive NN ops and building blocks (NHWC, TPU-first)."""

from insarseg.ops.layers import (  # noqa: F401
    Conv2d,
    ConvTranspose2d,
    BatchNorm2d,
    Dense,
    max_pool_2d,
    global_avg_pool,
    global_max_pool,
)
from insarseg.ops.blocks import (  # noqa: F401
    DoubleConv,
    SELayer,
    SEBlock,
    ChannelAttentionModule,
    SpatialAttentionDC,
    SpatialAttentionConv,
)
from insarseg.ops.resize import resize_bilinear, resize_nearest  # noqa: F401
