"""Unified inference-engine factory.

One entry point over the per-family serving graphs:

- ``module`` — the parity Flax graph (`model.apply(train=False)`), every
  model/attention cell; the default, bit-matches training eval.
- ``serve``  — BN-folded exact serving graph: all UNet cells
  (insarseg/models/unet_serve.py — SE gates deferred to fusible
  consumers, SA per-pixel gates in place), the space-to-depth fast
  variant (unet_stem.py), and all DeepLabV3/FCN/PSPNet cells
  (resnet_serve.py). Same math up to float reassociation.
- ``int8``   — opt-in post-training quantization (needs calibration
  batches): UNet none/channel via the H-s2d graph (unet_int8.py), the
  fast variant, and all DeepLabV3/FCN/PSPNet cells (resnet_int8.py).
  Not parity-preserving.

UNet-SA routes through the folded STANDARD-layout graphs for both fast
engines (its per-pixel gates are meaningless across s2d parity lanes).
Measured note: SA int8 is functional but SLOWER than its module graph
(733 vs 982 tiles/s at 256^2 — 64-lane L1 int8 convs + full-res gate
passes); prefer ``serve`` for SA unless the 4x activation-memory saving
matters. Every (model, attention, engine) cell is covered.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

ENGINES = ("module", "serve", "int8")


def supported(model_name: str, attention: str, engine: str) -> bool:
    """Whether (model, attention) runs on ``engine``."""
    if engine == "module":
        return True
    if engine not in ENGINES:
        return False
    if model_name == "unet":
        # every cell: SA serves/quantizes via the folded STANDARD-layout
        # graph (per-pixel gates are meaningless across s2d parity lanes)
        return True
    if model_name in ("unet-fast", "unet_fast"):
        return True  # SA rides the inner standard-layout packs too
    return model_name in ("deeplabv3", "fcn", "pspnet")


def make_engine(
    model_name: str,
    attention: str,
    model: Any,
    variables: Dict[str, Any],
    engine: str = "serve",
    calib_batches: Optional[List[jnp.ndarray]] = None,
    argmax: bool = False,
    input_dtype: Optional[Any] = None,
):
    """Build a jitted ``predict(images) -> logits | int32 class map``.

    ``calib_batches`` (normalized f32 input batches) is required for
    ``engine='int8'``.
    """
    model_name = model_name.lower().replace("_", "-")
    if not supported(model_name, attention, engine):
        raise ValueError(
            f"engine {engine!r} does not support ({model_name}, {attention}); "
            "supported: every (model, attention) cell on every engine")

    if engine == "module":
        @jax.jit
        def predict(images):
            if input_dtype is not None:
                images = images.astype(input_dtype)
            y = model.apply(variables, images, train=False)
            return jnp.argmax(y, -1).astype(jnp.int32) if argmax else y

        return predict

    if engine == "int8" and calib_batches is None:
        raise ValueError("engine='int8' needs calib_batches")

    if model_name == "unet-fast":
        from insarseg.models.unet_stem import (
            make_fast_int8_predict_fn,
            make_fast_serve_predict_fn,
        )

        if engine == "serve":
            return make_fast_serve_predict_fn(model, variables, argmax=argmax,
                                              input_dtype=input_dtype)
        return make_fast_int8_predict_fn(model, variables, calib_batches,
                                         argmax=argmax)
    if model_name == "unet":
        if engine == "serve":
            from insarseg.models.unet_serve import make_serve_predict_fn

            return make_serve_predict_fn(model, variables, argmax=argmax,
                                         input_dtype=input_dtype)
        from insarseg.models.unet_int8 import make_int8_predict_fn

        return make_int8_predict_fn(variables, calib_batches, argmax=argmax,
                                    s2d=attention != "spatial")

    if engine == "serve":
        from insarseg.models.resnet_serve import make_resnet_serve_predict_fn

        return make_resnet_serve_predict_fn(variables, argmax=argmax,
                                            input_dtype=input_dtype)
    from insarseg.models.resnet_int8 import make_resnet_int8_predict_fn

    return make_resnet_int8_predict_fn(variables, calib_batches, argmax=argmax)
