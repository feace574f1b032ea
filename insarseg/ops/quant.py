"""Shared int8 post-training-quantization primitives.

One definition of the symmetric-int8 contract used by every PTQ engine
(insarseg/models/unet_int8.py, resnet_int8.py), so a change to rounding,
scale flooring, or the code range lands everywhere at once:

- weights: per-output-channel symmetric absmax scales, codes in [-127, 127]
  (the -128 code is unused, keeping the scale symmetric);
- activations: per-tensor scales derived from calibration absmax with a
  1e-12 floor (all-zero calibration tensors quantize to zero, not NaN);
- requantization: round-half-even (`rint`, matching XLA's epilogue
  rounding) then clip to [-127, 127].
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

QMAX = 127.0


def quant_weight(k) -> Dict[str, np.ndarray]:
    """HWIO (or 2-D) kernel -> {'q': int8 codes, 'ws': per-out-channel
    scales}, symmetric absmax over all non-output axes."""
    k = np.asarray(k, np.float32)
    s = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0) / QMAX
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(k / s), -127, 127).astype(np.int8)
    return {"q": q, "ws": s}


def absmax_to_scale(absmax: float) -> float:
    """Calibrated tensor absmax -> activation scale (floored)."""
    return max(float(absmax), 1e-12) / QMAX


def calib_stat_fn(stat: str):
    """Calibration statistic over |t| for activation scales.

    - 'absmax' (default): exact max — no clipping, fragile to a single
      outlier activation blowing up the scale (and with it the rounding
      error of every inlier).
    - 'p<percent>' (e.g. 'p99.9', 'p99'): percentile of |t| as a PERCENT
      in (50, 100) — values beyond the scale saturate at ±127 in requant
      (symmetric clipping), trading rare saturation for finer inlier
      resolution. The percent form is unambiguous: 'p99.9' is the 99.9th
      percentile ('p999' is rejected — 999 is not a percent — rather
      than silently meaning something surprising).
    """
    if stat == "absmax":
        return lambda t: jnp.max(jnp.abs(t))
    if stat.startswith("p"):
        try:
            pct = float(stat[1:])
        except ValueError:
            pct = float("nan")
        if not 50.0 < pct < 100.0:
            raise ValueError(
                f"bad calibration percentile {stat!r}: expected "
                "'p<percent>' with 50 < percent < 100, e.g. 'p99.9'")
        q = pct / 100.0
        return lambda t: jnp.quantile(
            jnp.abs(t).astype(jnp.float32).ravel(), q)
    raise ValueError(
        f"unknown calibration stat {stat!r}; expected 'absmax' or "
        "'p<percent>' (e.g. 'p99.9' for the 99.9th percentile)")


def requant(y: jnp.ndarray, s: float) -> jnp.ndarray:
    """f32 values -> int8 codes at scale ``s``."""
    return jnp.clip(jnp.rint(y / s), -127, 127).astype(jnp.int8)
