"""Scene-scale serving: batched multi-scene sliding window and the
streaming >RAM pipeline (insarseg/data/serve.py) against the in-RAM
reference path (insarseg/data/stitch.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.data.serve import stream_scene_inference
from insarseg.data.stitch import (
    sliding_window_inference,
    sliding_window_inference_batched,
)

TILE, OVERLAP = 48, 16


def apply_fn(x):
    # deterministic 2-logit "model": shape (B, t, t, 1) -> (B, t, t, 2)
    return jnp.concatenate([x * 2.0 + 1.0, -x], axis=-1)


def _scene(rng, h, w):
    return rng.standard_normal((h, w, 1)).astype(np.float32)


def test_batched_matches_per_scene():
    rng = np.random.default_rng(0)
    scenes = np.stack([_scene(rng, 100, 140) for _ in range(3)])
    batched = sliding_window_inference_batched(
        apply_fn, jnp.asarray(scenes), tile=TILE, overlap=OVERLAP)
    for i in range(3):
        single = sliding_window_inference(
            apply_fn, jnp.asarray(scenes[i]), tile=TILE, overlap=OVERLAP)
        np.testing.assert_allclose(batched[i], single, rtol=0, atol=1e-5)


def test_batched_chunked_tail_masked():
    """A batch_size that does not divide S*N exercises the masked tail
    chunk (the index list is padded with a REPEATED tile, which must be
    masked out of the overlap-add, not double-counted)."""
    rng = np.random.default_rng(3)
    scenes = jnp.asarray(np.stack([_scene(rng, 100, 100) for _ in range(3)]))
    full = sliding_window_inference_batched(
        apply_fn, scenes, tile=TILE, overlap=OVERLAP)
    n_tiles = 9  # 3x3 grid at 100^2 / tile 48 / overlap 16
    for bs in (4, 5, 27, 100):  # 27 tiles total: pad-tail, exact, oversized
        chunked = sliding_window_inference_batched(
            apply_fn, scenes, tile=TILE, overlap=OVERLAP, batch_size=bs)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                                   rtol=0, atol=1e-6), (bs, n_tiles)


def test_batched_mesh_multiple_batch_not_clamped():
    """Regression (round-4 advisor, high): batch_size is a mesh-multiple
    rounded UP by cli._tile_batch_for; when the scene group's total tile
    count is smaller / not divisible, the old ``min(bs, total)`` clamp fed
    a non-divisible chunk into a 'data'-sharded jitted engine and pjit
    raised. The index-padded tail must keep the rounded size instead."""
    import jax
    from insarseg.parallel import make_mesh
    from insarseg.parallel.mesh import batch_sharding

    mesh = make_mesh(data=8)
    sharded_apply = jax.jit(apply_fn, in_shardings=batch_sharding(mesh, None))
    rng = np.random.default_rng(6)
    # 3 scenes x (2x2 grid) = 12 tiles: not divisible by 8 devices
    scenes = jnp.asarray(np.stack([_scene(rng, 48, 48) for _ in range(3)]))
    full = sliding_window_inference_batched(
        apply_fn, scenes, tile=32, overlap=8)
    got = sliding_window_inference_batched(
        sharded_apply, scenes, tile=32, overlap=8, batch_size=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=0, atol=1e-6)


def test_batched_sub_tile_scene_pads():
    rng = np.random.default_rng(1)
    scenes = jnp.asarray(np.stack([_scene(rng, 30, 70) for _ in range(2)]))
    out = sliding_window_inference_batched(
        apply_fn, scenes, tile=TILE, overlap=OVERLAP)
    assert out.shape == (2, 30, 70, 2)


@pytest.mark.parametrize("hw", [(96, 96), (130, 200)])
def test_stream_matches_in_ram(hw):
    rng = np.random.default_rng(2)
    scene = _scene(rng, *hw)
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP))
    got = stream_scene_inference(
        apply_fn, scene, hw, out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=2, normalize=None)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_stream_memmap_reader_writer(tmp_path):
    """>RAM usage pattern: scene and output both live in memmapped files;
    only a rolling band is ever resident."""
    h, w = 144, 112
    rng = np.random.default_rng(3)
    scene = _scene(rng, h, w)
    src = np.memmap(tmp_path / "scene.f32", np.float32, "w+", shape=(h, w, 1))
    src[:] = scene
    src.flush()
    dst = np.memmap(tmp_path / "out.f32", np.float32, "w+", shape=(h, w, 2))
    ret = stream_scene_inference(
        apply_fn, src, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=3, normalize=None, writer=dst)
    assert ret is None
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP))
    np.testing.assert_allclose(np.asarray(dst), want, rtol=0, atol=1e-5)


def test_stream_u8_normalizes_on_host():
    h, w = 96, 96
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (h, w), np.uint8)
    normed = ((u8.astype(np.float32) / 255.0) - 0.5) / 0.5
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(normed[..., None]), tile=TILE, overlap=OVERLAP))
    got = stream_scene_inference(
        apply_fn, u8, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=4, normalize=(0.5, 0.5))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_stream_callable_reader_band_windows():
    """Callable reader sees only (r0, nrows) windows — no full-scene array."""
    h, w = 120, 96
    rng = np.random.default_rng(5)
    scene = _scene(rng, h, w)
    seen = []

    def reader(r0, n):
        seen.append((r0, n))
        return scene[r0 : r0 + n]

    got = stream_scene_inference(
        apply_fn, reader, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=2, normalize=None)
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    # full band windows only, plus the device path's 1-row dtype probe
    bands = [rn for rn in seen if rn != (0, 1)]
    assert all(n == TILE for _, n in bands) and len(bands) >= 3


# --- device-stitch streaming path (round 5) -------------------------------
# The device path batches G row bands per call, stitches columns and
# divides on device, and host-fixes the scene edges (first band head, the
# clamped last band). The H values below hit every edge regime for
# tile 48 / overlap 16 / stride 32:
#   112 -> uniform rows (tail-finalize path)
#    96 -> clamped last band, shift s == overlap
#   114 -> clamped last band, s = 2 < overlap
#   104 -> clamped last band, s = 24 > overlap
#    48 -> single band (head fixup + tail finalize in one)
#   146 -> clamped last band after >1 uniform bands, s = 2


@pytest.mark.parametrize("h", [112, 96, 114, 104, 48, 146])
@pytest.mark.parametrize("bs", [2, 100])  # G == 1 and G > n_rows (pad bands)
def test_stream_device_stitch_matches_in_ram(h, bs):
    w = 130
    rng = np.random.default_rng(7)
    scene = _scene(rng, h, w)
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP))
    got = stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=bs, normalize=None, device_stitch=True)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_stream_device_stitch_multiband_calls():
    """G > 1: several row bands per device call, plus a partial final call
    whose pad bands must not leak into the carry chain."""
    h, w = 240, 96  # rows [0,32,...,192]: 7 uniform bands, G=3 -> calls 3,3,1
    rng = np.random.default_rng(8)
    scene = _scene(rng, h, w)
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP))
    got = stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=3 * 3, normalize=None, device_stitch=True)  # n_cols=3
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_stream_device_stitch_u8_normalizes_on_device():
    h, w = 114, 96
    rng = np.random.default_rng(9)
    u8 = rng.integers(0, 256, (h, w), np.uint8)
    normed = ((u8.astype(np.float32) / 255.0) - 0.5) / 0.5
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(normed[..., None]), tile=TILE, overlap=OVERLAP))
    got = stream_scene_inference(
        apply_fn, u8, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=8, normalize=(0.5, 0.5), device_stitch=True)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_stream_device_stitch_memmap_writer(tmp_path):
    h, w = 146, 112
    rng = np.random.default_rng(10)
    scene = _scene(rng, h, w)
    dst = np.memmap(tmp_path / "out.f32", np.float32, "w+", shape=(h, w, 2))
    ret = stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=6, normalize=None, writer=dst, device_stitch=True)
    assert ret is None
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP))
    np.testing.assert_allclose(np.asarray(dst), want, rtol=0, atol=1e-5)


def test_stream_device_stitch_callable_writer_ordered():
    """Callable writers receive rows strictly in ascending order."""
    h, w = 146, 96
    rng = np.random.default_rng(11)
    scene = _scene(rng, h, w)
    got = np.zeros((h, w, 2), np.float32)
    seen_r0 = []

    def writer(r0, rows):
        seen_r0.append(r0)
        got[r0 : r0 + rows.shape[0]] = rows

    stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=4, normalize=None, writer=writer, device_stitch=True)
    assert seen_r0 == sorted(seen_r0)
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_stream_host_path_still_available():
    """device_stitch=False keeps the original host rolling-stitcher."""
    h, w = 96, 96
    rng = np.random.default_rng(12)
    scene = _scene(rng, h, w)
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP))
    got = stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=2, normalize=None, device_stitch=False)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_stream_device_stitch_big_overlap_falls_back():
    """overlap > tile/2 (bands overlap beyond one neighbor) routes to the
    host path transparently."""
    h, w = 96, 96
    rng = np.random.default_rng(13)
    scene = _scene(rng, h, w)
    want = np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=48, overlap=30))
    got = stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=48, overlap=30,
        batch_size=4, normalize=None, device_stitch=True)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


@pytest.mark.parametrize("h", [112, 114, 48, 146])
def test_stream_emit_argmax_matches_in_ram(h):
    """emit='argmax' computes the class map ON DEVICE (uint8 rows cross to
    the host — 8x less fetch than f32 logits at C=2) and must equal argmax
    of the in-RAM stitched logits across every band topology: uniform rows,
    clamped last band, single band, clamped-after-many."""
    w = 130
    rng = np.random.default_rng(21)
    scene = _scene(rng, h, w)
    want = np.argmax(np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP)), -1)
    got = stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=6, normalize=None, device_stitch=True, emit="argmax")
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_stream_emit_argmax_writer_u8(tmp_path):
    """argmax mode hands the writer uint8 (n, W) class rows (the CLI
    --stream contract: rows land straight in the prediction memmap)."""
    h, w = 146, 112
    rng = np.random.default_rng(22)
    scene = _scene(rng, h, w)
    dst = np.memmap(tmp_path / "pred.u8", np.uint8, "w+", shape=(h, w))
    ret = stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=TILE, overlap=OVERLAP,
        batch_size=6, normalize=None, writer=dst, device_stitch=True,
        emit="argmax")
    assert ret is None
    want = np.argmax(np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=TILE, overlap=OVERLAP)), -1)
    np.testing.assert_array_equal(np.asarray(dst), want)


def test_stream_emit_argmax_big_overlap_falls_back():
    """overlap > tile/2 routes argmax mode through the host path with a
    host-side argmax wrapper — same uint8 contract."""
    h, w = 96, 96
    rng = np.random.default_rng(23)
    scene = _scene(rng, h, w)
    want = np.argmax(np.asarray(sliding_window_inference(
        apply_fn, jnp.asarray(scene), tile=48, overlap=30)), -1)
    got = stream_scene_inference(
        apply_fn, scene, (h, w), out_channels=2, tile=48, overlap=30,
        batch_size=4, normalize=None, device_stitch=True, emit="argmax")
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_stream_engine_not_inlined():
    """The device-stitch path must call apply_fn OUTSIDE its own jitted
    programs: tracing the engine into a wrapper jit re-bakes its packed
    weights as program constants (a ~140 MB MLIR blob that crashed the
    remote compile helper for bf16/f32 engines, round 5)."""
    import jax

    h, w = 112, 96
    calls = []

    def spying_apply(x):
        calls.append(isinstance(jnp.zeros(()), jax.core.Tracer)
                     or isinstance(x, jax.core.Tracer))
        return apply_fn(x)

    rng = np.random.default_rng(24)
    scene = _scene(rng, h, w)
    stream_scene_inference(
        spying_apply, scene, (h, w), out_channels=2, tile=TILE,
        overlap=OVERLAP, batch_size=6, normalize=None, device_stitch=True)
    assert calls and not any(calls), "engine was traced into a jit"
