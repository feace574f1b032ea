"""Data layer: VOC-layout reader, transforms, batching, sliding-window
split/stitch, synthetic fixtures."""

from insarseg.data.voc import VOCSegDataset, BatchLoader  # noqa: F401
