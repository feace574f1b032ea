"""Synthetic data fixtures: a tiny on-disk VOC tree (pipeline tests) and
in-memory interferogram-like batches (benchmarks / smoke training).

The real dataset (Arctic landfast-ice InSAR tiles, /root/reference/
Readme.md:31-38) lives on Google Drive and is not vendored; these fixtures
replicate its format: grayscale JPEG tiles + {0,255} PNG masks in VOC layout.
"""

from __future__ import annotations

import os

import numpy as np


def make_synthetic_voc(
    root: str,
    n_train: int = 8,
    n_val: int = 4,
    size: int = 64,
    seed: int = 0,
    noise: float = 0.25,
    contrast: float = 0.5,
    band_width: tuple = (0.03, 0.08),
) -> str:
    """Write a miniature VOC2012-layout dataset of synthetic interferogram
    tiles. Images are smooth random phase-like fields; masks are {0,255}
    linear-feature bands (mimicking ice deformation features).

    ``noise``/``contrast``/``band_width`` tune difficulty: the defaults
    give an easily-learnable task (models saturate near mIoU 0.99 —
    pipeline QA). The measured "hard" setting is noise=0.6, contrast=0.2,
    band_width=(0.01, 0.03) — exactly what
    benchmarks/fast_vs_ca_synthetic.py --hard uses. Keep noise < 0.8: the
    phase term is scaled by (0.8 - noise) and would invert beyond that."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "JPEGImages")
    mask_dir = os.path.join(root, "SegmentationClass")
    split_dir = os.path.join(root, "ImageSets", "Segmentation")
    for d in (img_dir, mask_dir, split_dir):
        os.makedirs(d, exist_ok=True)

    def write_one(img_id: str):
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        a, b, c = rng.uniform(-3, 3, 3)
        phase = np.sin(2 * np.pi * (a * xx + b * yy + c)) * 0.5 + 0.5
        noise_f = rng.random((size, size), dtype=np.float32) * noise
        # linear deformation band through a random in-frame point (guaranteed
        # non-empty so class 1 is always present in every tile); the band is
        # a *visible* fringe discontinuity so the task is learnable
        theta = rng.uniform(0, np.pi)
        x0, y0 = rng.uniform(0.25, 0.75, 2)
        w0 = rng.uniform(*band_width)
        band = np.abs(np.cos(theta) * (xx - x0) + np.sin(theta) * (yy - y0)) < w0
        img_f = phase * (0.8 - noise) + noise_f
        # band brightness: 1 - (1-contrast)*img_f; contrast=0.5 reproduces
        # the original fixture bit-for-bit (1 - 0.5*img_f)
        img_f = np.where(band, 1.0 - (1.0 - contrast) * img_f, img_f)
        img = np.clip(img_f * 255, 0, 255).astype(np.uint8)
        mask = np.where(band, 255, 0).astype(np.uint8)
        Image.fromarray(img, "L").save(os.path.join(img_dir, f"{img_id}.jpg"))
        Image.fromarray(mask, "L").save(os.path.join(mask_dir, f"{img_id}.png"))

    train_ids = [f"tile_{i:04d}" for i in range(n_train)]
    val_ids = [f"tile_v{i:04d}" for i in range(n_val)]
    for i in train_ids + val_ids:
        write_one(i)
    with open(os.path.join(split_dir, "train.txt"), "w") as f:
        f.write("\n".join(train_ids) + "\n")
    with open(os.path.join(split_dir, "val.txt"), "w") as f:
        f.write("\n".join(val_ids) + "\n")
    return root


def synthetic_batch(batch_size: int, size: int, seed: int = 0):
    """In-memory batch (image NHWC in [-1,1], mask {0,1}) for smoke tests."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(-1, 1, (batch_size, size, size, 1)).astype(np.float32)
    mask = (rng.random((batch_size, size, size)) > 0.8).astype(np.int32)
    return {"image": img, "mask": mask, "n_valid": batch_size}
