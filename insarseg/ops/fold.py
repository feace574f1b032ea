"""Inference-time BatchNorm folding.

In eval mode BatchNorm is the affine map ``y = x * s + t`` with
``s = gamma / sqrt(var + eps)`` and ``t = beta - mean * s``. Folding it into
the preceding conv's epilogue (or into the conv weights themselves) removes
a full HBM round-trip per BN — the arithmetic every packed serving graph
(unet_serve/unet_s2d/resnet_serve) consumes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def fold_bn(
    bn_params: dict,
    bn_stats: dict,
    conv_bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (scale, bias) such that ``relu(conv(x) * scale + bias)`` ==
    ``relu(bn(conv(x) + conv_bias))`` in eval mode."""
    gamma = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    s = gamma * jax_rsqrt(var + eps)
    t = beta - mean * s
    if conv_bias is not None:
        t = t + jnp.asarray(conv_bias, jnp.float32) * s
    return s, t


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)
