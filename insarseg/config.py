"""Configuration tree + the 9 named experiment presets.

The reference's "config system" is edit-the-constants: each script carries a
module-level block of UPPERCASE knobs marked ``TODO 【重要】``
(/root/reference/Unet.py:15-36, PSPNet-ChannelAttention.py:18-53). The
per-script divergences ARE the experiment grid (SURVEY.md §2.1): IMAGE_SIZE
64 vs 128, BATCH 8 vs 128, EPOCHS 25 vs 100, metric variant v1 (acc+miou
tuple) vs v2 (acc/miou/mpa/mf1 dict).

Here that grid becomes one frozen dataclass with nine named presets; the CLI
overrides any field. Preset names match the reference script stems so a
reference user can ``insarseg train --preset unet-channelattention`` and get
the same experiment.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # -- model --
    model: str = "unet"  # unet | unet-fast | deeplabv3 | fcn | pspnet
    attention: str = "none"  # none | channel | spatial
    num_classes: int = 2
    in_channels: int = 1
    backbone: str = "resnet50"  # for deeplabv3 / fcn / pspnet

    # -- data (L2) --
    voc_root: str = "data/VOCdevkit/VOC2012"
    image_size: int = 64
    ignore_index: int = 255
    # Mask contract: the reference pipeline stores masks as {0,255} pixels and
    # divides by 255 (ToTensor) before casting to long (/root/reference/
    # Unet.py:155-156) — "legacy" reproduces that; "index" reads raw class ids
    # and keeps ignore_index as a real feature (SURVEY.md §2.2.16).
    mask_contract: str = "legacy"  # legacy | index
    normalize_mean: float = 0.5
    normalize_std: float = 0.5
    # On-device D4 augmentation (flips+transpose) inside the train step.
    # The reference has no augmentation (SURVEY.md 2.2.17) -> default off.
    augment: bool = False

    # -- training (L5) --
    batch_size: int = 8
    num_epochs: int = 25
    learning_rate: float = 1e-4
    seed: int = 0
    # Drop the final partial train batch (torch DataLoader(drop_last=True)).
    # Default False pads the tail batch to the static shape; padded all-zero
    # images enter BN's train-batch statistics — the one known training-
    # parity deviation vs the reference, which trains on a genuinely smaller
    # final batch (/root/reference/Unet.py:341-349). drop_last=True removes
    # the deviation at the cost of skipping the tail samples.
    drop_last: bool = False
    # Rematerialize DoubleConv activations in the backward pass (UNet
    # families only; flax nn.remat per block). Identical grads; measured
    # NOT to extend the 512^2 batch envelope on v5e (XLA's automatic
    # remat already runs there — see UNet.remat). Off by default; for
    # memory shapes XLA's pass misses.
    remat: bool = False
    log_every_steps: int = 100
    # v1 = (acc, miou) tuple semantics (/root/reference/Unet.py:162-196);
    # v2 = {acc,miou,mpa,mf1} with the OA-denominator quirk
    # (/root/reference/Unet-ChannalAttention.py:215-269).
    metrics_version: int = 2
    # batch-mean (reference parity) vs global confusion-matrix accumulation
    metrics_mode: str = "batch_mean"  # batch_mean | global

    # -- checkpoint / history --
    model_save_path: str = "trained_models/model_best.ckpt"
    metrics_save_path: str = "training_metrics/history.json"

    # -- TPU execution --
    compute_dtype: str = "float32"  # float32 | bfloat16
    mesh_data: int = -1  # -1 = all devices on the data axis
    mesh_spatial: int = 1  # spatial partitioning of H (GSPMD halo exchange)

    @property
    def image_shape(self) -> Tuple[int, int]:
        return (self.image_size, self.image_size)


def _p(**kw) -> Config:
    return Config(**kw)


# One preset per reference script (SURVEY.md §2.1 table). BATCH/EPOCH/SIZE
# divergences preserved exactly.
PRESETS: Dict[str, Config] = {
    # /root/reference/Unet.py:15-36
    "unet": _p(model="unet", attention="none", image_size=64, batch_size=8,
               num_epochs=25, metrics_version=1,
               model_save_path="trained_models/unet_64_best.ckpt",
               metrics_save_path="training_metrics/unet_64.json"),
    # /root/reference/Unet-ChannalAttention.py:15-41 (IMAGE_SIZE=128)
    "unet-channelattention": _p(model="unet", attention="channel",
                                image_size=128, batch_size=8, num_epochs=25,
                                model_save_path="trained_models/unet_ca_128_best.ckpt",
                                metrics_save_path="training_metrics/unet_ca_128.json"),
    # /root/reference/Unet-SpatialAttention.py (BATCH=128)
    "unet-spatialattention": _p(model="unet", attention="spatial",
                                image_size=64, batch_size=128, num_epochs=25,
                                model_save_path="trained_models/unet_sa_64_best.ckpt",
                                metrics_save_path="training_metrics/unet_sa_64.json"),
    # /root/reference/DeepLabV3.py (metrics v1)
    "deeplabv3": _p(model="deeplabv3", attention="none", image_size=64,
                    batch_size=8, num_epochs=25, metrics_version=1,
                    model_save_path="trained_models/deeplabv3_64_best.ckpt",
                    metrics_save_path="training_metrics/deeplabv3_64.json"),
    # /root/reference/DeepLabV3-ChannelAttention.py (BATCH=128)
    "deeplabv3-channelattention": _p(model="deeplabv3", attention="channel",
                                     image_size=64, batch_size=128, num_epochs=25,
                                     model_save_path="trained_models/deeplabv3_ca_64_best.ckpt",
                                     metrics_save_path="training_metrics/deeplabv3_ca_64.json"),
    # /root/reference/DeepLabV3-SpatialAttention.py (BATCH=128)
    "deeplabv3-spatialattention": _p(model="deeplabv3", attention="spatial",
                                     image_size=64, batch_size=128, num_epochs=25,
                                     model_save_path="trained_models/deeplabv3_sa_64_best.ckpt",
                                     metrics_save_path="training_metrics/deeplabv3_sa_64.json"),
    # /root/reference/PSPNet.py — actually FCN-ResNet50 (SURVEY.md §0)
    "pspnet": _p(model="fcn", attention="none", image_size=64, batch_size=8,
                 num_epochs=25,
                 model_save_path="trained_models/fcn_64_best.ckpt",
                 metrics_save_path="training_metrics/fcn_64.json"),
    # /root/reference/PSPNet-ChannelAttention.py (BATCH=128, EPOCHS=100)
    "pspnet-channelattention": _p(model="fcn", attention="channel",
                                  image_size=64, batch_size=128, num_epochs=100,
                                  model_save_path="trained_models/fcn_se_64_best.ckpt",
                                  metrics_save_path="training_metrics/fcn_se_64.json"),
    # /root/reference/PSPNet-SpatialAttention.py (BATCH=128, EPOCHS=100)
    "pspnet-spatialattention": _p(model="fcn", attention="spatial",
                                  image_size=64, batch_size=128, num_epochs=100,
                                  model_save_path="trained_models/fcn_sa_64_best.ckpt",
                                  metrics_save_path="training_metrics/fcn_sa_64.json"),
    # Extension (no reference twin): space-to-depth-stem fast variant —
    # MXU-shaped level 1; see insarseg/models/unet_stem.py.
    "unet-fast-ca": _p(model="unet-fast", attention="channel",
                       image_size=128, batch_size=8, num_epochs=25,
                       model_save_path="trained_models/unet_fast_ca_best.ckpt",
                       metrics_save_path="training_metrics/unet_fast_ca.json"),
    # Extension (no reference twin): TRUE PSPNet — the pyramid-pooling head
    # the reference's "PSPNet" scripts claim but never implement (they wrap
    # torchvision fcn_resnet50, /root/reference/PSPNet.py:51; SURVEY.md §0).
    # Same protocol as the 'pspnet' (=FCN) preset so the two heads compare
    # directly in the sweeps.
    "pspnet-true": _p(model="pspnet", attention="none", image_size=64,
                      batch_size=8, num_epochs=25,
                      model_save_path="trained_models/pspnet_true_64_best.ckpt",
                      metrics_save_path="training_metrics/pspnet_true_64.json"),
}

# Presets with no reference twin (extensions beyond the 9-script grid).
EXTENSION_PRESETS: Tuple[str, ...] = ("unet-fast-ca", "pspnet-true")


def get_preset(name: str, **overrides) -> Config:
    key = name.lower().replace("_", "-")
    if key not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    cfg = PRESETS[key]
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
