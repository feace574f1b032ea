"""Native C++ tile-preprocessing library: build, parity with numpy path,
prefetch loader semantics."""

import numpy as np
import pytest

from insarseg.data.native_loader import (
    NativeVOCSegDataset,
    PrefetchLoader,
    lib,
    normalize_batch_host,
    stitch_accumulate_host,
)
from insarseg.data.synthetic import make_synthetic_voc
from insarseg.data.voc import BatchLoader, VOCSegDataset


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    return make_synthetic_voc(str(root), n_train=4, n_val=2, size=24)


def test_native_lib_builds():
    assert lib() is not None, "g++ build of tileops.cpp failed"


@pytest.mark.parametrize("contract", ["legacy", "index"])
def test_native_dataset_matches_python(voc_root, contract):
    py = VOCSegDataset(voc_root, 24, "train", mask_contract=contract)
    nat = NativeVOCSegDataset(voc_root, 24, "train", mask_contract=contract)
    for i in range(len(py)):
        xi, mi = py[i]
        xn, mn = nat[i]
        np.testing.assert_allclose(xn, xi, atol=1e-6)
        np.testing.assert_array_equal(mn, mi)
        assert xn.dtype == np.float32 and mn.dtype == np.int32


@pytest.mark.parametrize("threads", [1, 4])
def test_normalize_batch_host_matches_numpy(threads):
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (5, 24, 24, 1), dtype=np.uint8)
    got = normalize_batch_host(u8, mean=0.4, std=0.25, n_threads=threads)
    want = ((u8.astype(np.float32) / 255.0) - 0.4) / 0.25
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.dtype == np.float32


def test_prefetch_loader_matches_serial(voc_root):
    ds = VOCSegDataset(voc_root, 24, "train")
    base = BatchLoader(ds, batch_size=2)
    serial = list(base)
    fetched = list(PrefetchLoader(base, depth=2))
    assert len(fetched) == len(serial) == len(base)
    for a, b in zip(serial, fetched):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_prefetch_propagates_errors():
    def bad():
        yield {"image": 1}
        raise RuntimeError("boom")

    it = iter(PrefetchLoader(bad()))
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_early_close_defers_worker_error(capsys):
    """A failure on a prefetched batch the consumer never requested must
    not propagate out of close() (fit()'s shape-probe peek and the calib
    peek close early by design) — it is logged instead."""

    def bad():
        yield {"image": 1}
        raise RuntimeError("boom on a prefetched batch")

    it = iter(PrefetchLoader(bad(), depth=2))
    next(it)
    it.close()  # must not raise — the consumer never asked for batch 2
    assert "ignored" in capsys.readouterr().err


def test_stitch_accumulate_host_matches_numpy():
    rng = np.random.default_rng(0)
    acc = np.zeros((16, 16, 3), np.float32)
    den = np.zeros((16, 16, 1), np.float32)
    acc2, den2 = acc.copy(), den.copy()
    tile = rng.standard_normal((8, 8, 3)).astype(np.float32)
    win = rng.random((8, 8)).astype(np.float32)

    stitch_accumulate_host(acc, den, tile, win, 3, 5)
    # numpy reference
    acc2[3:11, 5:13] += tile * win[..., None]
    den2[3:11, 5:13, 0] += win
    np.testing.assert_allclose(acc, acc2, atol=1e-6)
    np.testing.assert_allclose(den, den2, atol=1e-6)
