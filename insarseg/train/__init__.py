"""Training engine: losses, on-device metrics, jitted train/eval steps,
Orbax checkpointing, JSON history."""

from insarseg.train.losses import cross_entropy_loss  # noqa: F401
from insarseg.train.metrics import (  # noqa: F401
    confusion_counts,
    metrics_v1,
    metrics_v2,
    merge_counts,
)
