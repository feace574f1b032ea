"""ctypes bindings for the native tile-preprocessing library + a prefetching
loader.

- :func:`lib` lazily compiles ``insarseg/native/tileops.cpp`` with g++ (one
  .so cached next to the source; falls back to None if no toolchain).
- :class:`NativeVOCSegDataset` — drop-in VOCSegDataset with the
  normalize/mask conversions done in C (single fused pass, no numpy
  temporaries). PIL still does the JPEG/PNG decode and resize (exact parity
  with the reference's pipeline).
- :class:`PrefetchLoader` — wraps any batch iterator with a background
  thread + bounded queue so host preprocessing overlaps TPU steps (the
  reference's DataLoader-worker overlap, /root/reference/Unet.py:341-349).
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

from insarseg.data.voc import VOCSegDataset

_LIB = None
_LIB_TRIED = False


def _src_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "native", "tileops.cpp")


def lib() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.abspath(_src_path())
    so = os.path.join(os.path.dirname(src), "libtileops.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src],
                check=True, capture_output=True,
            )
        L = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        L.normalize_u8.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_float,
                                   ctypes.c_float]
        L.mask_legacy.argtypes = [u8p, i32p, ctypes.c_int64]
        L.mask_index.argtypes = [u8p, i32p, ctypes.c_int64]
        L.normalize_batch.argtypes = [ctypes.POINTER(u8p), f32p,
                                      ctypes.c_int32, ctypes.c_int64,
                                      ctypes.c_float, ctypes.c_float,
                                      ctypes.c_int32]
        L.stitch_accumulate.argtypes = [f32p, f32p] + [ctypes.c_int64] * 3 + \
            [f32p, f32p] + [ctypes.c_int64] * 3
        _LIB = L
    except Exception:
        _LIB = None
    return _LIB


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _as_f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _as_i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeVOCSegDataset(VOCSegDataset):
    """VOCSegDataset with C-kernel normalize/mask conversion (falls back to
    the numpy path when the native library is unavailable)."""

    def __getitem__(self, idx: int):
        L = lib()
        if L is None or self.raw_u8:
            # raw_u8 ships bytes; normalization happens on-device instead
            return super().__getitem__(idx)
        from PIL import Image

        img_id = self.ids[idx]
        s = self.image_size
        img = Image.open(os.path.join(self.image_dir, f"{img_id}.jpg")).convert("L")
        img = img.resize((s, s), Image.BILINEAR)
        u8 = np.ascontiguousarray(np.asarray(img, np.uint8))
        x = np.empty((s, s), np.float32)
        L.normalize_u8(_as_u8p(u8), _as_f32p(x), u8.size,
                       ctypes.c_float(self.mean), ctypes.c_float(self.std))

        mask = Image.open(os.path.join(self.mask_dir, f"{img_id}.png")).convert("L")
        mask = mask.resize((s, s), Image.NEAREST)
        mu8 = np.ascontiguousarray(np.asarray(mask, np.uint8))
        m = np.empty((s, s), np.int32)
        fn = L.mask_legacy if self.mask_contract == "legacy" else L.mask_index
        fn(_as_u8p(mu8), _as_i32p(m), mu8.size)
        return x[..., None], m


def normalize_batch_host(u8_batch: np.ndarray, mean: float = 0.5,
                         std: float = 0.5, n_threads: int = 4) -> np.ndarray:
    """Fused threaded u8 -> normalized-f32 conversion of a whole (B, ...)
    batch via the native kernel (numpy fallback). Used by the streaming
    scene pipeline to prepare tile batches while the TPU runs."""
    u8_batch = np.ascontiguousarray(u8_batch, np.uint8)
    b = u8_batch.shape[0]
    hw = int(u8_batch.size // max(b, 1))
    out = np.empty(u8_batch.shape, np.float32)
    L = lib()
    if L is None or b == 0:
        return ((u8_batch.astype(np.float32) / 255.0) - mean) / std
    u8p = ctypes.POINTER(ctypes.c_uint8)
    srcs = (u8p * b)(*(
        u8_batch[i].ctypes.data_as(u8p) for i in range(b)
    ))
    L.normalize_batch(srcs, _as_f32p(out), b, hw,
                      ctypes.c_float(mean), ctypes.c_float(std),
                      ctypes.c_int32(n_threads))
    return out


class PrefetchLoader:
    """Background-thread prefetch over any batch iterable (depth-bounded)."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        _END = object()
        err = []
        stop = threading.Event()

        def worker():
            try:
                for batch in self.loader:
                    if stop.is_set():
                        return  # abandoned consumer: drop the source iter
                    q.put(batch)
            except BaseException as e:  # propagate into the consumer
                err.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        raised = False
        closed = False
        try:
            while True:
                item = q.get()
                if item is _END:
                    if err:
                        raised = True
                        raise err[0]
                    return
                yield item
        except GeneratorExit:
            # deliberate early close (fit()'s shape-probe peek, calib peek)
            # or GC of an abandoned generator: the consumer never asked for
            # the batch that failed, so a deferred worker error must not
            # propagate out of close() — it is logged in the finally instead
            closed = True
            raise
        finally:
            # consumer closed early (e.g. fit()'s shape-probe peek): unblock
            # the worker's q.put by draining until the thread exits, so no
            # thread/queued-batch leaks outlive the iterator
            stop.set()
            while t.is_alive():
                try:
                    q.get(timeout=0.05)
                except queue.Empty:
                    pass
            if err and not raised:
                if closed:
                    import sys

                    print(
                        "PrefetchLoader: worker error on a prefetched batch "
                        f"after early close (ignored): {err[0]!r}",
                        file=sys.stderr)
                else:
                    # a loader failure that raced the normal-exhaustion
                    # window must not be swallowed by the drain
                    raise err[0]


def stitch_accumulate_host(acc: np.ndarray, den: np.ndarray, tile: np.ndarray,
                           window: np.ndarray, r0: int, c0: int) -> None:
    """Host-side stitch accumulation via the native kernel (numpy fallback)."""
    L = lib()
    t = tile.shape[0]
    if L is None:
        acc[r0 : r0 + t, c0 : c0 + t] += tile * window[..., None]
        den[r0 : r0 + t, c0 : c0 + t, 0] += window
        return
    h, w, c = acc.shape
    L.stitch_accumulate(
        _as_f32p(acc), _as_f32p(den.reshape(h, w)), h, w, c,
        _as_f32p(np.ascontiguousarray(tile, np.float32)),
        _as_f32p(np.ascontiguousarray(window, np.float32)),
        t, r0, c0,
    )
