"""Model zoo: UNet / DeepLabV3 / FCN ("PSPNet") families + registry."""

from insarseg.models.unet import UNet  # noqa: F401
