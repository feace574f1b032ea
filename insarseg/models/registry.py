"""Model registry: build any of the reference's 9 experiment cells (plus the
true-PSPNet extension) from a Config or by name."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from insarseg.models.deeplab import DeepLabV3
from insarseg.models.fcn import FCN
from insarseg.models.pspnet import PSPNet
from insarseg.models.unet import UNet

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_model(cfg) -> Any:
    """Construct the Flax module described by a ``insarseg.config.Config``."""
    return build(cfg.model, cfg.attention, num_classes=cfg.num_classes,
                 backbone=cfg.backbone, dtype=_DTYPES[cfg.compute_dtype],
                 remat=getattr(cfg, "remat", False))


def build(
    model: str,
    attention: str = "none",
    num_classes: int = 2,
    backbone: str = "resnet50",
    dtype: Optional[Any] = None,
    remat: bool = False,
):
    model = model.lower()
    attention = attention.lower()
    if model == "unet":
        return UNet(
            num_classes=num_classes,
            use_se=attention == "channel",
            use_sa=attention == "spatial",
            dtype=dtype,
            remat=remat,
        )
    if model in ("unet-fast", "unet_fast"):
        from insarseg.models.unet_stem import UNetFastS2D

        return UNetFastS2D(
            num_classes=num_classes,
            use_se=attention == "channel",
            use_sa=attention == "spatial",
            dtype=dtype,
            remat=remat,
        )
    if remat:
        # only the UNet families implement per-block remat; dropping the
        # flag silently would read as "remat doesn't help"
        raise ValueError(
            f"remat is implemented for the UNet families only, not "
            f"{model!r}")
    if model == "deeplabv3":
        return DeepLabV3(num_classes=num_classes, attention=attention,
                         backbone=backbone, dtype=dtype)
    if model == "fcn":
        return FCN(num_classes=num_classes, attention=attention,
                   backbone=backbone, dtype=dtype)
    if model == "pspnet":
        return PSPNet(num_classes=num_classes, attention=attention,
                      backbone=backbone, dtype=dtype)
    raise KeyError(
        f"unknown model {model!r}; expected unet|unet-fast|deeplabv3|fcn|pspnet")
