"""VOC-layout dataset reader + batching loader (the L2 data layer).

Mirrors the observable behavior of the reference ``VOCSegDataset``
(/root/reference/Unet.py:114-158):

- layout: ``JPEGImages/{id}.jpg``, ``SegmentationClass/{id}.png``,
  ``ImageSets/Segmentation/{train,val}.txt``; ids from the split file;
  missing split file raises FileNotFoundError.
- images opened grayscale ('L'), PIL-bilinear resized to (S, S), scaled to
  [0,1], normalized with mean/std 0.5 -> [-1, 1]
  (/root/reference/Unet.py:334-338).
- masks opened 'L', PIL-nearest resized.

Mask contract (SURVEY.md §2.2.16): the reference runs masks through
``ToTensor()`` (divides by 255) then ``.long()`` (truncates), so stored
pixels {0, 255} become classes {0, 1} and anything <255 truncates to 0 —
``ignore_index=255`` can never fire through that pipeline. ``mask_contract=
'legacy'`` reproduces this exactly; ``'index'`` reads raw class ids and keeps
ignore-index support as a real feature.

TPU notes: output is NHWC float32 / int32 numpy; the :class:`BatchLoader`
zero-pads the final partial batch to a fixed batch size (padded pixels get
``ignore_index`` masks, so they contribute nothing to loss or metrics) — one
static shape per epoch means one XLA compilation, no recompiles on the tail
batch. Decode/resize runs on host worker threads, overlapped with TPU steps.

Caveat vs the reference: padded all-zero images DO enter BatchNorm's training
batch statistics (the reference trains on a genuinely smaller final batch).
The deviation is one batch per epoch and only moves running stats by
``momentum * pad/B`` of a zero-image moment; pass ``drop_last=True`` to
remove it entirely (at the cost of skipping the tail samples, like torch's
``DataLoader(drop_last=True)``).
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover - PIL is in the baked image
    Image = None


class VOCSegDataset:
    def __init__(
        self,
        voc_root: str,
        image_size: int,
        image_set: str = "train",
        mask_contract: str = "legacy",
        normalize_mean: float = 0.5,
        normalize_std: float = 0.5,
        ignore_index: int = 255,
        raw_u8: bool = False,
    ):
        self.voc_root = voc_root
        self.image_size = int(image_size)
        self.mask_contract = mask_contract
        self.mean = normalize_mean
        self.std = normalize_std
        self.ignore_index = ignore_index
        # raw_u8: skip host normalization; images ship as uint8 and the
        # jitted step normalizes on-device (insarseg.data.augment)
        self.raw_u8 = raw_u8

        self.image_dir = os.path.join(voc_root, "JPEGImages")
        self.mask_dir = os.path.join(voc_root, "SegmentationClass")
        split = os.path.join(voc_root, "ImageSets", "Segmentation", f"{image_set}.txt")
        if not os.path.exists(split):
            raise FileNotFoundError(f"ImageSets split file not found: {split}")
        with open(split) as f:
            self.ids = [line.strip() for line in f if line.strip()]

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (image (S, S, 1) float32 normalized, mask (S, S) int32)."""
        img_id = self.ids[idx]
        s = self.image_size

        img = Image.open(os.path.join(self.image_dir, f"{img_id}.jpg")).convert("L")
        img = img.resize((s, s), Image.BILINEAR)
        if self.raw_u8:
            x = np.asarray(img, dtype=np.uint8)
        else:
            x = np.asarray(img, dtype=np.float32) / 255.0
            x = (x - self.mean) / self.std

        mask = Image.open(os.path.join(self.mask_dir, f"{img_id}.png")).convert("L")
        mask = mask.resize((s, s), Image.NEAREST)
        m = np.asarray(mask)
        if self.mask_contract == "legacy":
            # ToTensor()/255 then .long(): only exactly-255 pixels become 1.
            m = (m == 255).astype(np.int32)
        else:
            m = m.astype(np.int32)
        return x[..., None], m


class BatchLoader:
    """Static-shape batching iterator over an indexable dataset.

    Yields dicts ``{"image": (B,S,S,1) f32, "mask": (B,S,S) i32,
    "n_valid": int}`` where the final partial batch is padded to B with
    ignore_index masks (``n_valid`` = real sample count, used for the
    reference's batch-size-weighted metric averaging).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        ignore_index: int = 255,
        drop_last: bool = False,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        self.ignore_index = ignore_index
        self.drop_last = drop_last
        self.num_workers = num_workers

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle order of the next iteration (deterministic:
        order = f(seed, epoch)). Without this, epochs advance automatically."""
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
            self._epoch += 1

        pool: Optional[concurrent.futures.ThreadPoolExecutor] = None
        if self.num_workers > 0:
            pool = concurrent.futures.ThreadPoolExecutor(self.num_workers)
        try:
            for start in range(0, n, self.batch_size):
                idxs = order[start : start + self.batch_size]
                if len(idxs) < self.batch_size and self.drop_last:
                    break
                if pool is not None:
                    items = list(pool.map(self.dataset.__getitem__, idxs))
                else:
                    items = [self.dataset[i] for i in idxs]
                imgs = np.stack([it[0] for it in items])
                masks = np.stack([it[1] for it in items])
                n_valid = len(items)
                if n_valid < self.batch_size:
                    pad = self.batch_size - n_valid
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]
                    )
                    masks = np.concatenate(
                        [masks,
                         np.full((pad,) + masks.shape[1:], self.ignore_index,
                                 masks.dtype)]
                    )
                yield {"image": imgs, "mask": masks, "n_valid": n_valid}
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
