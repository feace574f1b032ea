"""Reusable attention / conv blocks — the L3 "ops layer" of SURVEY.md §1.

The reference ships *five distinct* attention flavors that look similar but
are numerically different; all five are kept distinct here (SURVEY.md §2.2):

- :class:`SELayer`              — squeeze-excite with Linear MLP
  (/root/reference/Unet-ChannalAttention.py:45-72).
- :class:`SEBlock`              — squeeze-excite with 1x1-conv MLP
  (/root/reference/PSPNet-ChannelAttention.py:57-79).
- :class:`ChannelAttentionModule` — CBAM-channel: avg+max pool, shared MLP,
  summed (/root/reference/DeepLabV3-ChannelAttention.py:49-79).
- :class:`SpatialAttentionDC`   — channel mean/max -> DoubleConv(2->1) ->
  sigmoid (/root/reference/Unet-SpatialAttention.py:59-82).
- :class:`SpatialAttentionConv` — CBAM-spatial: channel mean/max ->
  Conv(2->1, k=7) -> sigmoid (/root/reference/DeepLabV3-SpatialAttention.py:
  44-67, PSPNet-SpatialAttention.py:51-73).

Plus :class:`DoubleConv` ((Conv3x3 -> BN -> ReLU) x2, optional SE tail,
/root/reference/Unet.py:40-54, Unet-ChannalAttention.py:75-97).

All blocks are NHWC and jit-friendly (static shapes, no Python branches on
traced values). The SE/CBAM "squeeze" paths reduce to tiny matmuls that XLA
fuses with the surrounding rescale (hand-fused Pallas variants were built,
measured slower than XLA's emitters, and retired — BASELINE.md "Retired
code ledger").
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from insarseg.ops.layers import (
    BatchNorm2d,
    Conv2d,
    Dense,
    global_avg_pool,
    global_max_pool,
)

Dtype = Any


class SELayer(nn.Module):
    """Squeeze-and-Excitation, Linear-MLP flavor (U-Net-CA).

    GAP -> Linear(C, C/r, no bias) -> ReLU -> Linear(C/r, C, no bias) ->
    sigmoid -> channelwise rescale.
    """

    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = global_avg_pool(x, keepdims=False)  # (B, C)
        y = Dense(c // self.reduction, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBlock(nn.Module):
    """Squeeze-and-Excitation, 1x1-conv flavor (FCN-SE bottlenecks).

    Same math as :class:`SELayer` but the MLP is two bias-free 1x1 convs —
    kept separate because the torch param tree differs (conv vs linear) and
    the converter must round-trip both.
    """

    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = global_avg_pool(x, keepdims=True)  # (B,1,1,C)
        y = Conv2d(c // self.reduction, 1, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = Conv2d(c, 1, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y


class ChannelAttentionModule(nn.Module):
    """CBAM channel attention (DeepLab-CA).

    avg-pool AND max-pool over space, shared bias-free 1x1-conv MLP
    (C -> C/r -> C), outputs summed, sigmoid, channelwise rescale.
    """

    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        mlp_fc1 = Conv2d(c // self.reduction, 1, use_bias=False, dtype=self.dtype, name="mlp_fc1")
        mlp_fc2 = Conv2d(c, 1, use_bias=False, dtype=self.dtype, name="mlp_fc2")

        def mlp(v):
            return mlp_fc2(nn.relu(mlp_fc1(v)))

        avg = mlp(global_avg_pool(x, keepdims=True))
        mx = mlp(global_max_pool(x, keepdims=True))
        att = nn.sigmoid(avg + mx)
        return x * att


class DoubleConv(nn.Module):
    """(Conv3x3 same-pad -> BN -> ReLU) x2, optional SE tail (U-Net-CA)."""

    features: int
    use_se: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # stop_bias_grad=train: each conv feeds a train-mode BN directly, so
        # the bias gradient is analytically zero (see Conv2d.stop_bias_grad);
        # skipping it removes ~11% of the 512^2 train step. In eval mode
        # (running stats) the cancellation doesn't hold, so grads stay live.
        x = Conv2d(self.features, 3, padding=1, dtype=self.dtype,
                   stop_bias_grad=train, name="conv1")(x)
        x = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = Conv2d(self.features, 3, padding=1, dtype=self.dtype,
                   stop_bias_grad=train, name="conv2")(x)
        x = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        if self.use_se:
            x = SELayer(dtype=self.dtype, name="se")(x)
        return x


class SpatialAttentionDC(nn.Module):
    """Spatial attention, DoubleConv flavor (U-Net-SA).

    Channelwise mean & max -> concat (...,2) -> DoubleConv(2->1) -> sigmoid ->
    spatial rescale. Heavier than the CBAM flavor: two 3x3 conv+BN+ReLU on the
    2-channel pooled map.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        m = jnp.concatenate([avg, mx], axis=-1)
        m = DoubleConv(1, dtype=self.dtype, name="compress_and_map")(m, train=train)
        return x * nn.sigmoid(m)


class SpatialAttentionConv(nn.Module):
    """CBAM spatial attention (DeepLab-SA / FCN-SA).

    Channelwise mean & max -> concat -> Conv2d(2->1, k, pad=k//2, no bias) ->
    sigmoid -> spatial rescale. ``kernel_size`` must be 3 or 7 (the reference
    asserts this at /root/reference/PSPNet-SpatialAttention.py:58).
    """

    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.kernel_size in (3, 7), "kernel size must be 3 or 7"
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        m = jnp.concatenate([avg, mx], axis=-1)
        m = Conv2d(
            1,
            self.kernel_size,
            padding=self.kernel_size // 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(m)
        return x * nn.sigmoid(m)
