"""Config presets mirror the reference experiment grid (SURVEY.md §2.1)."""

import dataclasses

import pytest

from insarseg.config import EXTENSION_PRESETS, PRESETS, get_preset


def test_nine_presets_exist():
    # 9 reference-script presets + the declared extensions
    reference = [k for k in PRESETS if k not in EXTENSION_PRESETS]
    assert len(reference) == 9
    for name in EXTENSION_PRESETS:
        assert name in PRESETS, name
    assert "unet-fast-ca" in EXTENSION_PRESETS
    # the true-PPM head the reference's "PSPNet" falsely claims (SURVEY §0)
    assert get_preset("pspnet-true").model == "pspnet"


def test_preset_grid_divergences():
    # IMAGE_SIZE=128 only for U-Net-CA (Unet-ChannalAttention.py:21)
    assert get_preset("unet-channelattention").image_size == 128
    assert get_preset("unet").image_size == 64
    # BATCH=128 cells (SURVEY.md §2.1 table)
    for name in ("unet-spatialattention", "deeplabv3-channelattention",
                 "deeplabv3-spatialattention", "pspnet-channelattention",
                 "pspnet-spatialattention"):
        assert get_preset(name).batch_size == 128, name
    # EPOCHS=100 only for the FCN attention cells
    assert get_preset("pspnet-channelattention").num_epochs == 100
    assert get_preset("pspnet-spatialattention").num_epochs == 100
    assert get_preset("pspnet").num_epochs == 25
    # metrics v1 for the two 2-metric scripts (Unet.py, DeepLabV3.py)
    assert get_preset("unet").metrics_version == 1
    assert get_preset("deeplabv3").metrics_version == 1
    assert get_preset("unet-channelattention").metrics_version == 2


def test_pspnet_presets_alias_fcn():
    # the naming trap: "PSPNet" scripts wrap FCN-ResNet50 (SURVEY.md §0)
    for name in ("pspnet", "pspnet-channelattention", "pspnet-spatialattention"):
        assert get_preset(name).model == "fcn", name


def test_preset_overrides_and_errors():
    cfg = get_preset("unet", batch_size=32, voc_root="/data")
    assert cfg.batch_size == 32 and cfg.voc_root == "/data"
    assert get_preset("UNET_CHANNELATTENTION").image_size == 128  # normalize
    with pytest.raises(KeyError):
        get_preset("resnet")
    # presets are frozen
    with pytest.raises(dataclasses.FrozenInstanceError):
        get_preset("unet").batch_size = 1


def test_all_lr_match_reference():
    # optim.Adam(lr=1e-4) everywhere (Unet.py:369 et al.)
    for cfg in PRESETS.values():
        assert cfg.learning_rate == 1e-4
        assert cfg.num_classes == 2
        assert cfg.ignore_index == 255
