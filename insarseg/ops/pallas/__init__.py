"""Hand-fused Pallas (Mosaic) TPU kernels for the inference hot path.

Kernels here are the fusion targets named in the north star
(/root/repo/BASELINE.json): conv-BN-ReLU blocks and SE channel gating. Each
has a pure-XLA reference twin in ``insarseg.ops`` and is validated against it
in interpret mode on CPU; on TPU they are drop-in replacements used by the
fast inference path.
"""

from insarseg.ops.pallas.conv import conv3x3_bn_relu  # noqa: F401
from insarseg.ops.pallas.se import se_scale  # noqa: F401
