"""PyTorch interop: state_dict <-> insarseg parameter-tree converters."""

from insarseg.compat.torch_io import (  # noqa: F401
    load_torch_state_dict,
    unet_variables_from_torch,
    unet_variables_to_torch,
    segmentation_variables_from_torch,
    segmentation_variables_to_torch,
)
