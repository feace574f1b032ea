"""On-device preprocessing & augmentation (north-star item; the reference
has no augmentation at all — SURVEY.md §2.2.17).

Everything here runs inside the jitted train step on the TPU:

- :func:`normalize_u8` — fused uint8 -> normalized float. Lets the host ship
  raw uint8 tiles (4x less host->device bandwidth than f32) and do the
  ``(x/255 - mean)/std`` of the reference transform
  (/root/reference/Unet.py:334-338) on-device.
- :func:`random_dihedral` — per-sample random D4 transform (horizontal /
  vertical flips + transpose = the 8 rotation/reflection symmetries),
  applied identically to image and mask. Vectorized ``jnp.where`` selects —
  no data-dependent control flow, one fused VPU pass, jit/GSPMD friendly
  (flips commute with batch sharding; transpose requires square tiles,
  which all presets use).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def normalize_u8(x: jnp.ndarray, mean: float = 0.5, std: float = 0.5,
                 dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B,H,W,C) -> ((x/255) - mean)/std in ``dtype``, on device."""
    a = 1.0 / (255.0 * std)
    b = -mean / std
    return (x.astype(jnp.float32) * a + b).astype(dtype)


def random_dihedral(
    rng: jax.Array, image: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random per-sample D4 symmetry applied to (image NHWC, mask NHW)."""
    b = image.shape[0]
    assert image.shape[1] == image.shape[2], "dihedral transpose needs square tiles"
    r1, r2, r3 = jax.random.split(rng, 3)
    flip_h = jax.random.bernoulli(r1, 0.5, (b,))
    flip_v = jax.random.bernoulli(r2, 0.5, (b,))
    transp = jax.random.bernoulli(r3, 0.5, (b,))

    def apply(x):
        fh = flip_h.reshape((b,) + (1,) * (x.ndim - 1))
        fv = flip_v.reshape((b,) + (1,) * (x.ndim - 1))
        tp = transp.reshape((b,) + (1,) * (x.ndim - 1))
        x = jnp.where(fh, jnp.flip(x, axis=2), x)
        x = jnp.where(fv, jnp.flip(x, axis=1), x)
        x = jnp.where(tp, jnp.swapaxes(x, 1, 2), x)
        return x

    return apply(image), apply(mask)
