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


def tile_starts(n: int, tile: int, stride: int) -> List[int]:
    """Tile origins along one axis: stride-spaced, the last clamped flush to
    the border (shared by in-memory planning and the streaming reader)."""
    s = list(range(0, n - tile + 1, stride))
    if s[-1] != n - tile:
        s.append(n - tile)
    return s


def plan_tiles(h: int, w: int, tile: int, overlap: int) -> List[Tuple[int, int]]:
    """Static (row, col) origins covering (h, w) with the given overlap; the
    last tile in each axis is clamped flush to the border."""
    assert 0 <= overlap < tile, (tile, overlap)
    assert h >= tile and w >= tile, (h, w, tile)
    stride = tile - overlap
    return [(r, c) for r in tile_starts(h, tile, stride)
            for c in tile_starts(w, tile, stride)]


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
    """(N, tile, tile, C) -> (H, W, C) weighted overlap-add.

    Implemented as one ``lax.scan`` over the tile axis (a read-modify-write
    ``dynamic_update_slice`` per step, executed in place on the carried
    accumulator), so the program is compile-flat: a 289-tile 8192^2 grid
    compiles the same loop body as a 3x3 grid, instead of 289 unrolled
    update pairs.
    """
    n, t, _, c = tiles.shape
    assert n == len(coords)
    w = jnp.asarray(_window(t, window))[:, :, None]
    coords_rc = jnp.asarray(list(coords), jnp.int32)
    acc0 = jnp.zeros(out_hw + (c,), jnp.float32)
    den0 = jnp.zeros(out_hw + (1,), jnp.float32)

    def step(carry, inp):
        acc, den = carry
        tile_i, rc = inp
        r, cc = rc[0], rc[1]
        patch = tile_i.astype(jnp.float32) * w
        cur = jax.lax.dynamic_slice(acc, (r, cc, 0), (t, t, c))
        acc = jax.lax.dynamic_update_slice(acc, cur + patch, (r, cc, 0))
        curd = jax.lax.dynamic_slice(den, (r, cc, 0), (t, t, 1))
        den = jax.lax.dynamic_update_slice(den, curd + w, (r, cc, 0))
        return (acc, den), None

    (acc, den), _ = jax.lax.scan(step, (acc0, den0), (tiles, coords_rc))
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
    logits = _chunked_forward(apply_fn, tiles, batch_size)
    out = stitch_tiles(logits, coords, (ph, pw), window)
    return out[:h, :w] if (pad_h or pad_w) else out


def _chunked_forward(
    apply_fn: Callable, tiles: jnp.ndarray, batch_size: Optional[int]
) -> jnp.ndarray:
    """Run ``apply_fn`` over the tile batch in fixed-size chunks (the tail
    chunk is zero-padded so every call reuses one compiled shape)."""
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
    return jnp.concatenate(outs)


def sliding_window_inference_batched(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    scenes: jnp.ndarray,
    tile: int = 512,
    overlap: int = 64,
    window: str = "hann",
    batch_size: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-scene sliding-window inference: ``(S, H, W, C_in) ->
    (S, H, W, C_out)``.

    All scenes share one tile plan, so their tiles are flattened into a
    single ``(S*N, tile, tile, C)`` stream of fixed-shape forward chunks —
    the device stays filled regardless of per-scene tile counts.

    Memory (round 4): forward chunks interleave with the overlap-add
    accumulation instead of materializing all ``S*N`` tiles and logits —
    peak HBM is the ``(S, H, W, C_out)`` accumulator plus ONE in-flight
    chunk. The collect-then-stitch formulation cost ~0.5 GB/Mpixel and
    compile-time-OOM'd 64x1024^2 scenes at 32 GB on the 16 GB chip; this
    one is bounded by the output itself. Results are bit-identical: each
    scene's tiles accumulate in the same order onto disjoint regions.
    """
    s, h, w, cin = scenes.shape
    pad_h, pad_w = max(0, tile - h), max(0, tile - w)
    if pad_h or pad_w:
        scenes = jnp.pad(scenes, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = scenes.shape[1:3]
    coords = plan_tiles(ph, pw, tile, overlap)
    n = len(coords)
    total = s * n
    # Do NOT clamp bs to total: callers round batch_size up to a mesh
    # multiple (cli._tile_batch_for) so the jitted engine's in_shardings
    # over 'data' stay divisible; the index-padded tail chunk below
    # already handles bs > total correctly (advisor finding, round 4).
    bs = batch_size or total
    wnd = jnp.asarray(_window(tile, window))[:, :, None]
    # flat tile k lives in scene k//n at coords[k%n] — static ints
    flat = [(k // n,) + coords[k % n] for k in range(total)]

    def gather(idx):
        # compile-flat tile extraction: one dynamic_slice in a scan body
        def g(_, src):
            t = jax.lax.dynamic_slice(
                scenes, (src[0], src[1], src[2], 0), (1, tile, tile, cin))
            return None, t[0]

        return jax.lax.scan(g, None, idx)[1]

    acc = den = out_dtype = None
    for i in range(0, total, bs):
        chunk = flat[i:i + bs]
        valid = len(chunk)
        if valid < bs:
            # pad the INDEX list so every forward reuses one compiled
            # shape; the repeated tiles are masked out of the overlap-add
            chunk = chunk + [chunk[-1]] * (bs - valid)
        idx = jnp.asarray(chunk, jnp.int32)
        mask = (jnp.arange(bs) < valid).astype(jnp.float32)
        logits = apply_fn(gather(idx))
        if acc is None:
            cout = logits.shape[-1]
            out_dtype = logits.dtype
            acc = jnp.zeros((s, ph, pw, cout), jnp.float32)
            den = jnp.zeros((s, ph, pw, 1), jnp.float32)

        def step(carry, inp):
            a, d = carry
            lg, src, m = inp
            si, r, c = src[0], src[1], src[2]
            patch = (lg.astype(jnp.float32) * wnd * m)[None]
            cur = jax.lax.dynamic_slice(
                a, (si, r, c, 0), (1, tile, tile, cout))
            a = jax.lax.dynamic_update_slice(a, cur + patch, (si, r, c, 0))
            curd = jax.lax.dynamic_slice(
                d, (si, r, c, 0), (1, tile, tile, 1))
            d = jax.lax.dynamic_update_slice(
                d, curd + (wnd * m)[None], (si, r, c, 0))
            return (a, d), None

        (acc, den), _ = jax.lax.scan(step, (acc, den), (logits, idx, mask))
    out = (acc / den).astype(out_dtype)
    return out[:, :h, :w] if (pad_h or pad_w) else out
