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
    device_stitch: Optional[bool] = None,
    emit: str = "logits",
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
        Host-stitch path only (the device path is always channel-major).
      device_stitch: run the window multiply, column overlap-add, and
        denominator divide ON DEVICE (default: True). The single-core host
        measures ~61 tiles/s through ``stitch_accumulate`` — an ~8x
        bottleneck vs the 613 t/s int8 engine — and a 128-tile device call
        holds only W/stride (~19 at 8192 px) real column tiles per row
        band, so the host path also pads ~85% of every forward batch. The
        device path fills calls with G = batch_size//n_cols row bands,
        threads the row-overlap carry through an in-program ``lax.scan``,
        and hands the host finalized output rows: host work is pure IO.
        ``False`` selects the original host rolling-stitcher path.
      emit: ``"logits"`` (default) hands the writer finalized f32
        ``(n, W, out_channels)`` logit rows; ``"argmax"`` (device-stitch
        path only) argmaxes ON DEVICE and hands the writer uint8 ``(n, W)``
        class rows — 8x less device->host traffic at C=2 f32, the lever
        that matters when the output must cross a host link (the stitched
        scene itself is the transfer floor; see benchmarks/stream_bench.py).
        The divide by the stitch denominator is a positive per-pixel scale
        shared across channels, so device argmax of the raw accumulator is
        exactly argmax of the stitched logits.

    Returns the stitched scene when ``writer`` is None, else None
    (``emit="argmax"`` returns/writes uint8 ``(H, W)`` class indices).
    """
    h, w = scene_shape
    assert h >= tile and w >= tile, (h, w, tile)
    assert emit in ("logits", "argmax"), emit
    if device_stitch is None:
        device_stitch = True
    if device_stitch:
        return _stream_device_stitch(
            apply_fn, reader, scene_shape, out_channels, tile, overlap,
            window, batch_size, normalize, writer, emit)
    assert emit == "logits", "emit='argmax' needs the device-stitch path"
    if channel_major_fetch is None:
        channel_major_fetch = out_channels < 8
    if channel_major_fetch:
        import jax
        import jax.numpy as jnp

        inner = apply_fn
        # separate jitted transpose AFTER the engine call (inlining the
        # engine into a wrapper jit would bake its packed weights into the
        # wrapper as constants — a ~140 MB MLIR program that crashes the
        # remote compile helper for bf16/f32 engines; measured round 5)
        cmaj = jax.jit(lambda y: jnp.transpose(y, (0, 3, 1, 2)))
        apply_fn = lambda x: cmaj(inner(x))  # noqa: E731
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
            # slice the pad tiles off ON DEVICE: fetching the full padded
            # batch cost 128/19 = 6.7x the wire bytes at 8192 px (the
            # tunnel moves ~100-160 MB/s; measured round 5)
            outs.append((apply_fn(chunk)[:valid], valid))
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


def _stream_device_stitch(
    apply_fn: Callable,
    reader: Reader,
    scene_shape: Tuple[int, int],
    out_channels: int,
    tile: int,
    overlap: int,
    window: str,
    batch_size: int,
    normalize: Optional[Tuple[float, float]],
    writer: Optional[Writer],
    emit: str = "logits",
) -> Optional[np.ndarray]:
    """Streaming scene inference with the stitch on device (TPU-first).

    Why: the single-core host runs ``stitch_accumulate`` at ~61 tiles/s —
    ~8x under the 613 t/s int8 engine — and one row band holds only
    ``W/stride`` column tiles (19 at 8192 px), so a 128-tile call in the
    host path pads ~85% of every forward batch. Here the chip does all the
    stitch work: a per-call pipeline of three compiled programs —
    ``prep`` (uint8 upload + on-device normalize: 4x less host->device
    traffic), the serving engine itself (called STANDALONE, not traced
    into a wrapper: inlining it would re-bake its packed weights as
    program constants, a ~140 MB MLIR blob that crashes the remote
    compile helper for bf16/f32 engines — measured round 5), and
    ``stitch`` — takes G = batch_size//n_cols row bands of logits plus the
    row-overlap carry, window-weights and column-overlap-adds each band at
    static offsets, divides the finalized rows by precomputed denominator
    constants, and emits channel-major (C, stride, W) rows — a narrow-lane
    (..., 2) fetch would relayout with 64x lane padding (CLAUDE.md round
    4). With ``emit="argmax"`` the stitch program also argmaxes the raw
    row accumulator (argmax is invariant to the positive per-pixel
    denominator divide), and the host fetches ONLY uint8 class rows — the
    stitched-output transfer drops 8x. The host does pure IO: stack input
    tiles, write output rows.

    Scene-edge cases are fixed up on host, once per scene, with O(tile*W)
    numpy (no second compiled program):
    - first band: its head rows were divided by the interior-overlap
      denominator; multiply back and re-divide by the first-band one;
    - clamped last band (``tile_starts`` flushes it to the border, so its
      stride to the previous band is shorter): run it through the same
      program with a zero carry, multiply the divides back out to recover
      the raw accumulator, and blend with the held-back previous band.

    Numerics: identical accumulation arithmetic to ``stitch_tiles``
    (insarseg/data/stitch.py) up to f32 summation ORDER — per-band partial
    sums are combined as blocks rather than tile-serially, an ulp-level
    difference (tested ≤1e-5 against ``sliding_window_inference``).
    """
    import jax
    import jax.numpy as jnp

    h, w = scene_shape
    C = out_channels
    stride = tile - overlap
    if 2 * overlap > tile:
        # bands would overlap beyond one neighbor; rare config — take the
        # general host path instead (argmaxing its f32 rows on host so the
        # writer contract stays the same)
        if emit == "argmax":
            h_, w_ = scene_shape
            out_u8 = None if writer is not None else np.empty(
                (h_, w_), np.uint8)

            def am_writer(r0: int, rows: np.ndarray) -> None:
                cls = np.argmax(rows, -1).astype(np.uint8)
                if writer is None:
                    out_u8[r0 : r0 + cls.shape[0]] = cls
                elif callable(writer):
                    writer(r0, cls)
                else:
                    writer[r0 : r0 + cls.shape[0]] = cls

            stream_scene_inference(
                apply_fn, reader, scene_shape, out_channels, tile, overlap,
                window, batch_size, normalize, am_writer,
                device_stitch=False)
            return out_u8
        return stream_scene_inference(
            apply_fn, reader, scene_shape, out_channels, tile, overlap,
            window, batch_size, normalize, writer, device_stitch=False)
    argmax = emit == "argmax"
    row_starts = _starts(h, tile, stride)
    col_starts = _starts(w, tile, stride)
    n_cols = len(col_starts)
    win = _np_window(tile, window)

    # per-band column-stitch denominator (t, W) and its row regions
    band_den = np.zeros((tile, w), np.float32)
    for c0 in col_starts:
        band_den[:, c0 : c0 + tile] += win
    den_head = band_den[:overlap]                      # scene-first band
    den_olap = band_den[stride:] + band_den[:overlap]  # interior head rows
    den_solo = band_den[overlap:stride]
    den_tail = band_den[stride:]                       # scene-last rows

    ragged = None
    n_uni = len(row_starts)
    if n_uni > 1 and row_starts[-1] - row_starts[-2] != stride:
        ragged = row_starts[-1]
        n_uni -= 1
    uni_rows = row_starts[:n_uni]

    G = min(max(1, (batch_size or n_cols) // n_cols), n_uni)
    B = G * n_cols
    # the engine batch stays the caller's batch_size (>= B): engines jitted
    # with mesh in_shardings need device-count-multiple batches, and b128 is
    # the measured int8 sweet spot; the pad tiles' logits are sliced off
    # before the stitch
    EB = max(batch_size or B, B)

    probe = _read_band(reader, 0, 1)
    is_u8 = probe.dtype == np.uint8
    do_norm = is_u8 and normalize is not None
    mean, std = normalize if normalize is not None else (0.0, 1.0)
    in_dtype = np.uint8 if is_u8 else np.float32

    wnd3 = jnp.asarray(win)[:, :, None]
    d_olap = jnp.asarray(den_olap)[:, :, None]
    d_solo = jnp.asarray(den_solo)[:, :, None]

    if do_norm:
        prep = jax.jit(lambda u: (u.astype(jnp.float32) / 255.0 - mean) / std)
    else:
        prep = jax.jit(lambda t: t.astype(jnp.float32))

    def stitch_program(lg_in, carry_cm):
        # the carry crosses the jit boundary channel-major: a (.., C=2)
        # narrow-lane layout can pay a 64x padded relayout there (CLAUDE.md)
        carry = jnp.transpose(carry_cm, (1, 2, 0))
        lg = lg_in[:B].astype(jnp.float32).reshape(G, n_cols, tile, tile, C)

        def step(cry, band):
            acc = jnp.zeros((tile, w, C), jnp.float32)
            for k, c0 in enumerate(col_starts):
                cur = jax.lax.dynamic_slice(
                    acc, (0, c0, 0), (tile, tile, C))
                acc = jax.lax.dynamic_update_slice(
                    acc, cur + band[k] * wnd3, (0, c0, 0))
            head_raw = cry + acc[:overlap]
            solo_raw = acc[overlap:stride]
            emit_raw = jnp.concatenate([head_raw, solo_raw], axis=0)
            emit = jnp.concatenate(
                [head_raw / d_olap, solo_raw / d_solo], axis=0)
            tail = acc[stride:]
            # argmax(raw) == argmax(stitched): the denominator divide is a
            # positive per-pixel scale shared across channels
            return tail, (jnp.transpose(emit, (2, 0, 1)),
                          jnp.argmax(emit_raw, -1).astype(jnp.uint8),
                          jnp.transpose(tail, (2, 0, 1)),
                          jnp.argmax(tail, -1).astype(jnp.uint8))

        cry_out, (emits, emits_u8, tails, tails_u8) = jax.lax.scan(
            step, carry, lg)
        return (emits, emits_u8, tails, tails_u8,
                jnp.transpose(cry_out, (2, 0, 1)))

    stitch = jax.jit(stitch_program)

    def prog(tiles, carry):
        # three queued dispatches per call: prep -> engine -> stitch. The
        # engine runs its OWN compiled program (never traced into another
        # jit — see the docstring); the extra dispatch boundaries cost
        # ~30 ms/call on the axon tunnel, amortized over EB tiles.
        return stitch(apply_fn(prep(tiles)), carry)

    if writer is not None:
        out = None
    else:
        out = (np.empty((h, w), np.uint8) if argmax
               else np.empty((h, w, C), np.float32))

    def emit_rows(r0: int, rows: np.ndarray) -> None:
        if writer is None:
            out[r0 : r0 + rows.shape[0]] = rows
        elif callable(writer):
            writer(r0, rows)
        else:
            writer[r0 : r0 + rows.shape[0]] = rows

    def emit_f32(r0: int, rows: np.ndarray) -> None:
        # scene-edge fixups are computed in f32 on host; in argmax mode
        # convert before handing them to the uint8 writer
        emit_rows(r0, np.argmax(rows, -1).astype(np.uint8) if argmax
                  else rows)

    def make_call(rows) -> np.ndarray:
        tiles = []
        for r0 in rows:
            band = _read_band(reader, r0, tile)
            tiles.extend(band[:, c0 : c0 + tile] for c0 in col_starts)
        stackd = np.stack(tiles).astype(in_dtype, copy=False)
        if len(tiles) < EB:  # pad to the engine batch; emits discarded
            stackd = np.concatenate(
                [stackd, np.zeros((EB - len(tiles),) + stackd.shape[1:],
                                  in_dtype)])
        return stackd

    hold = None  # (r_prev, emit, tail) of the last uniform band, if ragged

    def drain(rows, emits_dev, emits_u8_dev, tails_dev, tails_u8_dev,
              last_call: bool) -> None:
        nonlocal hold
        V = len(rows)
        # the bulk fetch: uint8 class rows in argmax mode (8x less than
        # f32 logits at C=2), channel-major f32 logit rows otherwise
        em = None if argmax else np.asarray(emits_dev[:V])
        em_u8 = np.asarray(emits_u8_dev[:V]) if argmax else None
        for g, r0 in enumerate(rows):
            if last_call and g == V - 1 and ragged is not None:
                # the clamped last band must be blended in raw f32 space;
                # hold this band's f32 rows back (fetched even in argmax
                # mode — one band, not the scene)
                e = np.ascontiguousarray(
                    np.moveaxis(np.asarray(emits_dev[g]), 0, -1))
                if r0 == 0:
                    e[:overlap] = (e[:overlap] * den_olap[:, :, None]
                                   / den_head[:, :, None])
                tail = np.moveaxis(np.asarray(tails_dev[V - 1]), 0, -1)
                hold = (r0, e, np.ascontiguousarray(tail))
                return
            if argmax:
                emit_rows(r0, em_u8[g])
                if last_call and g == V - 1:
                    emit_rows(r0 + stride, np.asarray(tails_u8_dev[V - 1]))
                continue
            e = np.moveaxis(em[g], 0, -1)  # (stride, W, C) view
            if r0 == 0:
                # first band: head rows carry no previous-band tail —
                # recover the raw accumulator and divide by the right den
                e = np.ascontiguousarray(e)
                e[:overlap] = (e[:overlap] * den_olap[:, :, None]
                               / den_head[:, :, None])
            emit_rows(r0, e)
            if last_call and g == V - 1:
                tail = np.moveaxis(np.asarray(tails_dev[V - 1]), 0, -1)
                emit_rows(r0 + stride, tail / den_tail[:, :, None])

    calls = [uni_rows[i : i + G] for i in range(0, n_uni, G)]
    carry = jnp.zeros((C, overlap, w), jnp.float32)
    pending = None
    for ci, rows in enumerate(calls):
        tiles = make_call(rows)
        emits_dev, emits_u8_dev, tails_dev, tails_u8_dev, carry = prog(
            tiles, carry)
        if pending is not None:
            drain(*pending)  # host IO overlaps the queued device forward
        pending = (rows, emits_dev, emits_u8_dev, tails_dev, tails_u8_dev,
                   ci == len(calls) - 1)

    if ragged is not None:
        # dispatch the clamped last band (zero carry: we recover raw acc)
        r_tiles = make_call([ragged])
        r_emits, _, r_tails, _, _ = prog(
            r_tiles, jnp.zeros((C, overlap, w), jnp.float32))
        drain(*pending)
        e_r = np.moveaxis(np.asarray(r_emits[0]), 0, -1)
        raw = np.empty((tile, w, C), np.float32)
        raw[:overlap] = e_r[:overlap] * den_olap[:, :, None]
        raw[overlap:stride] = e_r[overlap:stride] * den_solo[:, :, None]
        raw[stride:] = np.moveaxis(np.asarray(r_tails[0]), 0, -1)

        r_prev, prev_emit, prev_tail = hold
        s = ragged - r_prev  # in (0, stride)
        prev_head_den = den_head if n_uni == 1 else den_olap
        prev_emit_den = np.concatenate([prev_head_den, den_solo])
        prev_raw = np.concatenate(
            [prev_emit[s:] * prev_emit_den[s:, :, None], prev_tail])
        prev_prof = np.concatenate([prev_head_den, den_solo, den_tail])

        L = tile - s  # previous-band rows the clamped band re-covers
        total_acc = raw
        total_acc[:L] += prev_raw
        total_den = band_den.copy()
        total_den[:L] += prev_prof[s:]

        emit_f32(r_prev, prev_emit[:s])
        emit_f32(ragged, total_acc / total_den[:, :, None])
    else:
        drain(*pending)
    return out
