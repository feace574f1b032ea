"""Sliding-window split + overlap stitching for full-scene inference.

The reference only ever sees one 64^2/128^2 tile at a time; full 1024^2
interferogram scenes are the scaling axis the TPU rebuild adds
(BASELINE.json configs[5], SURVEY.md §5 "long-context analog"). Design:

- ``plan_tiles``: static tile grid for (H, W, tile, overlap) — torch-free,
  pure Python ints, so everything downstream is static-shape under jit.
- ``extract_tiles``: gather the (N, tile, tile, C) tile batch from a scene —
  one ``jnp.take`` per axis, XLA turns it into efficient dynamic slices.
- ``stitch_tiles``: weighted overlap-add of per-tile logits back to the
  scene: scatter-add of ``tile * window`` and of ``window``, then divide.
  ``window='hann'`` feathers seams (smooth blending); ``'uniform'`` averages.
- ``sliding_window_inference``: tiles -> batched model forward (optionally
  mesh-sharded: the tile grid is embarrassingly parallel, no halo exchange
  because tiles overlap by construction) -> stitch.

The scatter-add uses a static ``fori``-free formulation: tiles are grouped
so XLA sees a fixed unrolled sequence of dynamic_update_slice-adds (N is
small: 3x3..7x7 grids).
"""

from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def plan_tiles(h: int, w: int, tile: int, overlap: int) -> List[Tuple[int, int]]:
    """Static (row, col) origins covering (h, w) with the given overlap; the
    last tile in each axis is clamped flush to the border."""
    assert 0 <= overlap < tile, (tile, overlap)
    assert h >= tile and w >= tile, (h, w, tile)
    stride = tile - overlap

    def starts(n):
        s = list(range(0, n - tile + 1, stride))
        if s[-1] != n - tile:
            s.append(n - tile)
        return s

    return [(r, c) for r in starts(h) for c in starts(w)]


def _window(tile: int, kind: str) -> np.ndarray:
    if kind == "uniform":
        return np.ones((tile, tile), np.float32)
    if kind == "hann":
        # Avoid exact zeros at the borders so edge tiles keep full coverage.
        w1 = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(tile) + 0.5) / tile)
        w = np.outer(w1, w1).astype(np.float32)
        return np.maximum(w, 1e-3)
    raise KeyError(f"unknown window {kind!r}")


def extract_tiles(
    scene: jnp.ndarray, coords: Sequence[Tuple[int, int]], tile: int
) -> jnp.ndarray:
    """(H, W, C) scene -> (N, tile, tile, C) tile batch (static coords)."""
    return jnp.stack(
        [
            jax.lax.dynamic_slice(
                scene, (r, c, 0), (tile, tile, scene.shape[-1])
            )
            for r, c in coords
        ]
    )


def stitch_tiles(
    tiles: jnp.ndarray,
    coords: Sequence[Tuple[int, int]],
    out_hw: Tuple[int, int],
    window: str = "hann",
) -> jnp.ndarray:
    """(N, tile, tile, C) -> (H, W, C) weighted overlap-add."""
    n, t, _, c = tiles.shape
    assert n == len(coords)
    w = jnp.asarray(_window(t, window))[:, :, None]
    acc = jnp.zeros(out_hw + (c,), jnp.float32)
    den = jnp.zeros(out_hw + (1,), jnp.float32)
    for i, (r, cc) in enumerate(coords):
        patch = tiles[i].astype(jnp.float32) * w
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (r, cc, 0), (t, t, c)) + patch,
            (r, cc, 0),
        )
        den = jax.lax.dynamic_update_slice(
            den, jax.lax.dynamic_slice(den, (r, cc, 0), (t, t, 1)) + w,
            (r, cc, 0),
        )
    return (acc / den).astype(tiles.dtype)


def sliding_window_inference(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    scene: jnp.ndarray,
    tile: int = 512,
    overlap: int = 64,
    window: str = "hann",
    batch_size: Optional[int] = None,
) -> jnp.ndarray:
    """Full-scene logits via tiled forward + overlap stitch.

    Args:
      apply_fn: batched forward, (B, tile, tile, C_in) -> (B, tile, tile, C_out)
        — typically a ``make_predict_fn`` output (jitted, possibly
        mesh-sharded over the tile batch).
      scene: (H, W, C_in).
      batch_size: tiles per forward call (defaults to all tiles at once; pass
        a divisor-friendly size to bound memory; the tail chunk is padded so
        every call reuses one compiled shape).
    """
    h, w, _ = scene.shape
    # scenes smaller than the tile in either axis: zero-pad up, crop back
    pad_h, pad_w = max(0, tile - h), max(0, tile - w)
    if pad_h or pad_w:
        scene = jnp.pad(scene, ((0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = scene.shape[:2]
    coords = plan_tiles(ph, pw, tile, overlap)
    tiles = extract_tiles(scene, coords, tile)
    n = tiles.shape[0]
    bs = batch_size or n
    outs = []
    for i in range(0, n, bs):
        chunk = tiles[i : i + bs]
        if chunk.shape[0] < bs:
            pad = bs - chunk.shape[0]
            chunk = jnp.concatenate([chunk, jnp.zeros((pad,) + chunk.shape[1:],
                                                      chunk.dtype)])
            outs.append(apply_fn(chunk)[: bs - pad])
        else:
            outs.append(apply_fn(chunk))
    logits = jnp.concatenate(outs)
    out = stitch_tiles(logits, coords, (ph, pw), window)
    return out[:h, :w] if (pad_h or pad_w) else out
