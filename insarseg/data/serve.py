"""Streaming full-scene inference for scenes larger than host RAM.

``sliding_window_inference`` (insarseg/data/stitch.py) holds the whole scene,
every tile, and the stitched output on device — fine to ~4096^2, impossible
for a 50k x 50k interferogram strip. This module streams instead:

- the scene is read one *row band* (``tile`` rows) at a time from a
  ``reader`` (an ``np.memmap``, a rasterio-style window reader, anything
  sliceable or callable);
- each band is cut into column tiles, normalized on host through the native
  ``normalize_batch`` kernel (insarseg/native/tileops.cpp), and shipped to
  the TPU in fixed-shape batches (one compiled program for the whole scene);
- returned logits are blended into a **rolling accumulator** via the native
  ``stitch_accumulate`` kernel: only ``tile`` rows of (acc, den) live in RAM;
  rows above the current band can never be touched again (bands are
  processed top-down), so they are finalized (acc/den) and flushed to the
  ``writer`` as the band advances;
- host work is pipelined against the device: band k+1 is read/normalized and
  dispatched before band k's outputs are fetched and stitched, so the stitch
  and the read overlap the TPU forward (the device queue executes in order).

The reference has no scene path at all (it only ever sees one 64^2 tile,
/root/reference/Unet.py:21); this is the SURVEY.md §5 "long-context analog"
taken to the production-scale limit (BASELINE.json configs[5]).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np

from insarseg.data.native_loader import normalize_batch_host, stitch_accumulate_host
from insarseg.data.stitch import _window, plan_tiles, tile_starts as _starts

Reader = Union[np.ndarray, Callable[[int, int], np.ndarray]]
Writer = Union[np.ndarray, Callable[[int, np.ndarray], None]]


def _read_band(reader: Reader, r0: int, nrows: int) -> np.ndarray:
    band = reader(r0, nrows) if callable(reader) else reader[r0 : r0 + nrows]
    band = np.asarray(band)
    if band.ndim == 2:
        band = band[..., None]
    return band


class _RollingStitcher:
    """Rolling (acc, den) window over ``tile`` scene rows with ordered
    flush-on-advance; all accumulation goes through the native kernel."""

    def __init__(self, height: int, width: int, channels: int, tile: int,
                 window: np.ndarray, writer: Optional[Writer]):
        self.h, self.w, self.c, self.tile = height, width, channels, tile
        self.window = window
        self.acc = np.zeros((tile, width, channels), np.float32)
        self.den = np.zeros((tile, width, 1), np.float32)
        self.base = 0
        self.writer = writer
        self._out = None if writer is not None else np.empty(
            (height, width, channels), np.float32)

    def _emit(self, r0: int, rows: np.ndarray) -> None:
        if self.writer is None:
            self._out[r0 : r0 + rows.shape[0]] = rows
        elif callable(self.writer):
            self.writer(r0, rows)
        else:
            self.writer[r0 : r0 + rows.shape[0]] = rows

    def advance(self, new_base: int) -> None:
        """Finalize + flush rows [base, new_base); slide the window down."""
        shift = new_base - self.base
        assert 0 <= shift <= self.tile
        if shift == 0:
            return
        done = self.acc[:shift] / np.maximum(self.den[:shift], 1e-12)
        self._emit(self.base, done)
        self.acc[: self.tile - shift] = self.acc[shift:]
        self.acc[self.tile - shift :] = 0.0
        self.den[: self.tile - shift] = self.den[shift:]
        self.den[self.tile - shift :] = 0.0
        self.base = new_base

    def add(self, tile_out: np.ndarray, c0: int) -> None:
        stitch_accumulate_host(self.acc, self.den, tile_out, self.window, 0, c0)

    def finish(self) -> Optional[np.ndarray]:
        self.advance(min(self.base + self.tile, self.h))
        return self._out


def stream_scene_inference(
    apply_fn: Callable,
    reader: Reader,
    scene_shape: Tuple[int, int],
    out_channels: int,
    tile: int = 512,
    overlap: int = 64,
    window: str = "hann",
    batch_size: int = 128,
    normalize: Optional[Tuple[float, float]] = (0.5, 0.5),
    writer: Optional[Writer] = None,
    n_threads: int = 4,
    channel_major_fetch: Optional[bool] = None,
) -> Optional[np.ndarray]:
    """Stream a (possibly >RAM) scene through tiled inference.

    Args:
      apply_fn: jitted forward, ``(B, tile, tile, C_in) -> (B, tile, tile,
        out_channels)`` logits (e.g. a ``make_predict_fn`` output with
        ``argmax=False``).
      reader: the scene rows — an array-like sliced as ``reader[r0:r0+n]``
        (e.g. ``np.memmap``) or a callable ``reader(r0, n) -> (n, W[, C])``.
        uint8 input is normalized on host when ``normalize=(mean, std)``;
        float input is fed as-is.
      scene_shape: (H, W) of the full scene.
      out_channels: number of logit channels produced by ``apply_fn``.
      batch_size: tiles per device call (fixed shape; tail is
        zero-padded). Default 128 — every engine's measured batch
        sweet spot on the v5e (BASELINE.md "Round 4"; 613 t/s int8 at
        b128 vs 508 at b72).
      writer: where finalized output rows go — an array-like assigned as
        ``writer[r0:r0+n] = rows`` (e.g. ``np.memmap``) or a callable
        ``writer(r0, rows)``. When None, the stitched (H, W, out_channels)
        array is assembled in RAM and returned.
      channel_major_fetch: transpose logits to (B, C, tile, tile) ON DEVICE
        before the host fetch. A device->host fetch of a narrow-lane
        (..., 2) tensor relayouts with 64x lane padding on the TPU (16 GB
        for a (128,512,512,2) f32 chunk — measured, CLAUDE.md round 4);
        channel-major puts ``tile`` on the lane dim so the fetch streams at
        the real size. Default (None) auto-enables for out_channels < 8.

    Returns the stitched scene when ``writer`` is None, else None.
    """
    h, w = scene_shape
    assert h >= tile and w >= tile, (h, w, tile)
    if channel_major_fetch is None:
        channel_major_fetch = out_channels < 8
    if channel_major_fetch:
        import jax
        import jax.numpy as jnp

        inner = apply_fn
        # jit-of-jit inlines the engine: one program, one dispatch per chunk
        apply_fn = jax.jit(lambda x: jnp.transpose(inner(x), (0, 3, 1, 2)))
    stride = tile - overlap
    row_starts = _starts(h, tile, stride)
    col_starts = _starts(w, tile, stride)
    win = _np_window(tile, window)
    stitcher = _RollingStitcher(h, w, out_channels, tile, win, writer)

    def forward_band(band: np.ndarray) -> list:
        """Cut a (tile, W, C) band into column tiles and dispatch fixed-shape
        batches; returns the list of in-flight device outputs."""
        tiles = np.stack([band[:, c0 : c0 + tile] for c0 in col_starts])
        if tiles.dtype == np.uint8 and normalize is not None:
            tiles = normalize_batch_host(tiles, normalize[0], normalize[1],
                                         n_threads=n_threads)
        elif tiles.dtype != np.float32:
            tiles = tiles.astype(np.float32)
        outs = []
        for i in range(0, len(col_starts), batch_size):
            chunk = tiles[i : i + batch_size]
            valid = chunk.shape[0]
            if valid < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - valid,) + chunk.shape[1:],
                                     chunk.dtype)])
            outs.append((apply_fn(chunk), valid))
        return outs

    def stitch_band(r0: int, outs: list) -> None:
        stitcher.advance(r0)
        j = 0
        for dev_out, valid in outs:
            arr = np.asarray(dev_out).astype(np.float32, copy=False)
            if channel_major_fetch:
                arr = np.moveaxis(arr, 1, -1)  # view; add() re-contigs
            for k in range(valid):
                stitcher.add(np.ascontiguousarray(arr[k]), col_starts[j])
                j += 1

    pending = None
    for r0 in row_starts:
        outs = forward_band(_read_band(reader, r0, tile))
        if pending is not None:
            stitch_band(*pending)  # host stitch overlaps the device forward
        pending = (r0, outs)
    stitch_band(*pending)
    return stitcher.finish()


def _np_window(tile: int, kind: str) -> np.ndarray:
    return np.asarray(_window(tile, kind), np.float32)
