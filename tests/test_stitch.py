"""Sliding-window split/stitch property tests (SURVEY.md §4 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.data.stitch import (
    extract_tiles,
    plan_tiles,
    sliding_window_inference,
    stitch_tiles,
)


def test_plan_tiles_covers_scene():
    coords = plan_tiles(100, 100, 32, 8)
    cover = np.zeros((100, 100), bool)
    for r, c in coords:
        cover[r : r + 32, c : c + 32] = True
    assert cover.all()
    # flush last tile
    assert max(r for r, _ in coords) == 68


def test_plan_tiles_exact_grid():
    coords = plan_tiles(1024, 1024, 512, 256)
    assert len(coords) == 9  # 3x3 grid at stride 256... 0,256,512


@pytest.mark.parametrize("window", ["uniform", "hann"])
def test_stitch_inverts_extract(window):
    """stitch(extract(x)) == x: overlapping tiles of the same scene blend
    back to the scene for any positive window."""
    rng = np.random.default_rng(0)
    scene = jnp.asarray(rng.standard_normal((64, 48, 3), np.float32))
    coords = plan_tiles(64, 48, 16, 4)
    tiles = extract_tiles(scene, coords, 16)
    out = stitch_tiles(tiles, coords, (64, 48), window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(scene), atol=1e-5)


def test_sliding_window_identity_model():
    rng = np.random.default_rng(1)
    scene = jnp.asarray(rng.standard_normal((70, 70, 2), np.float32))
    out = sliding_window_inference(lambda t: t, scene, tile=32, overlap=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(scene), atol=1e-5)


def test_sliding_window_batched_chunks_match_full():
    rng = np.random.default_rng(2)
    scene = jnp.asarray(rng.standard_normal((64, 64, 1), np.float32))

    calls = []

    def apply_fn(t):
        calls.append(t.shape[0])
        return jnp.tanh(t)

    full = sliding_window_inference(apply_fn, scene, tile=32, overlap=16)
    chunked = sliding_window_inference(apply_fn, scene, tile=32, overlap=16,
                                       batch_size=4)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-6)
    # tail chunk was padded to the same static shape
    assert set(calls[1:]) == {4}


def test_sliding_window_with_model():
    from insarseg.models.unet import UNet
    from insarseg.parallel import make_predict_fn

    model = UNet(num_classes=2, base_features=4)
    scene = jnp.ones((48, 48, 1))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    predict = make_predict_fn(model)
    out = sliding_window_inference(
        lambda t: predict(variables, t), scene, tile=32, overlap=16
    )
    assert out.shape == (48, 48, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sliding_window_small_scene_pads_and_crops():
    rng = np.random.default_rng(3)
    scene = jnp.asarray(rng.standard_normal((20, 40, 2), np.float32))
    out = sliding_window_inference(lambda t: t, scene, tile=32, overlap=8)
    assert out.shape == (20, 40, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(scene), atol=1e-5)
