"""Model zoo: UNet / DeepLabV3 / FCN ("PSPNet") families + registry."""

from insarseg.models.unet import UNet  # noqa: F401
from insarseg.models.resnet import ResNet50  # noqa: F401
from insarseg.models.deeplab import DeepLabV3, ASPP  # noqa: F401
from insarseg.models.fcn import FCN, FCNHead  # noqa: F401
from insarseg.models.pspnet import PSPNet  # noqa: F401
from insarseg.models.registry import build, build_model  # noqa: F401
