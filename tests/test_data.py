"""Data pipeline: synthetic VOC tree, mask contracts, static-shape batching."""

import os

import numpy as np
import pytest

from insarseg.data.synthetic import make_synthetic_voc, synthetic_batch
from insarseg.data.voc import VOCSegDataset, BatchLoader


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    return make_synthetic_voc(str(root), n_train=6, n_val=3, size=32)


def test_dataset_contract(voc_root):
    ds = VOCSegDataset(voc_root, image_size=32, image_set="train")
    assert len(ds) == 6
    img, mask = ds[0]
    assert img.shape == (32, 32, 1) and img.dtype == np.float32
    assert mask.shape == (32, 32) and mask.dtype == np.int32
    # normalized to [-1, 1]
    assert img.min() >= -1.0 - 1e-6 and img.max() <= 1.0 + 1e-6
    # legacy contract: only classes {0,1}, ignore can never appear
    assert set(np.unique(mask)) <= {0, 1}


def test_legacy_vs_index_mask_contract(voc_root):
    # legacy: 255 -> 1, anything else -> 0 (the ToTensor()/255 + .long() quirk)
    leg = VOCSegDataset(voc_root, 32, "train", mask_contract="legacy")
    idx = VOCSegDataset(voc_root, 32, "train", mask_contract="index")
    _, ml = leg[1]
    _, mi = idx[1]
    assert set(np.unique(ml)) <= {0, 1}
    assert set(np.unique(mi)) <= {0, 255}
    np.testing.assert_array_equal(ml == 1, mi == 255)


def test_resize_is_applied(voc_root):
    ds = VOCSegDataset(voc_root, image_size=16, image_set="train")
    img, mask = ds[0]
    assert img.shape == (16, 16, 1) and mask.shape == (16, 16)


def test_missing_split_raises(voc_root):
    with pytest.raises(FileNotFoundError):
        VOCSegDataset(voc_root, 32, image_set="nope")


def test_batch_loader_pads_tail_to_static_shape(voc_root):
    ds = VOCSegDataset(voc_root, 32, "train")  # 6 samples
    loader = BatchLoader(ds, batch_size=4, ignore_index=255)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 1)
        assert b["mask"].shape == (4, 32, 32)
    assert batches[0]["n_valid"] == 4 and batches[1]["n_valid"] == 2
    # padded samples are fully ignored
    assert np.all(batches[1]["mask"][2:] == 255)
    # shuffling reorders across epochs
    l2 = BatchLoader(ds, batch_size=4, shuffle=True, seed=1)
    a = next(iter(l2))["image"]
    b = next(iter(l2))["image"]
    assert not np.array_equal(a, b)


def test_batch_loader_workers_match_serial(voc_root):
    ds = VOCSegDataset(voc_root, 32, "train")
    serial = list(BatchLoader(ds, batch_size=3))
    threaded = list(BatchLoader(ds, batch_size=3, num_workers=2))
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_synthetic_batch():
    b = synthetic_batch(2, 16)
    assert b["image"].shape == (2, 16, 16, 1)
    assert set(np.unique(b["mask"])) <= {0, 1}
