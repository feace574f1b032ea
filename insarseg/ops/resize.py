"""Resize ops with torch ``F.interpolate`` / torchvision semantics.

The reference uses two resize flavors inside models:
- bilinear, half-pixel centers, no antialias — ``F.interpolate(...,
  mode='bilinear', align_corners=False)`` (/root/reference/
  PSPNet-SpatialAttention.py:150) and ``torchvision F_T.resize(...,
  InterpolationMode.BILINEAR)`` on tensors (/root/reference/
  DeepLabV3-ChannelAttention.py:160, Unet-ChannalAttention.py:138-157).
- nearest, for masks (handled host-side by the data pipeline via PIL).

``jax.image.resize(method='bilinear', antialias=False)`` uses the same
half-pixel sampling grid, so logits match torch to float tolerance for both
up- and down-scaling.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Resize NHWC (or HWC) to spatial ``size`` — bilinear, align_corners=False,
    no antialias (torch-parity)."""
    h, w = size
    if x.ndim == 4:
        shape = (x.shape[0], h, w, x.shape[3])
    elif x.ndim == 3:
        shape = (h, w, x.shape[2])
    else:
        raise ValueError(f"expected 3D/4D NHWC input, got shape {x.shape}")
    if x.shape[-3] == h and x.shape[-2] == w:
        return x
    return jax.image.resize(x, shape, method="bilinear", antialias=False).astype(
        x.dtype
    )


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC (or HWC / HW) to spatial ``size``.

    Note: uses jax.image.resize's half-pixel-center nearest rule, which
    matches PIL's NEAREST (the reference's mask-resize path runs through PIL
    host-side in ``data/voc.py``, so parity there is by construction); torch
    ``F.interpolate(mode='nearest')`` uses the floor rule and can differ by
    one source pixel — this on-device helper is for auxiliary use only.
    """
    h, w = size
    if x.ndim == 2:
        shape = (h, w)
    elif x.ndim == 3:
        shape = (h, w, x.shape[2])
    elif x.ndim == 4:
        shape = (x.shape[0], h, w, x.shape[3])
    else:
        raise ValueError(f"expected 2-4D input, got shape {x.shape}")
    if x.shape[-3 if x.ndim > 2 else 0] == h and x.shape[-2 if x.ndim > 2 else 1] == w:
        return x
    return jax.image.resize(x, shape, method="nearest")
