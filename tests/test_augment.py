"""On-device augmentation + u8 normalization tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.data.augment import normalize_u8, random_dihedral


def test_normalize_u8_matches_host_pipeline():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 8, 8, 1)).astype(np.uint8)
    got = normalize_u8(jnp.asarray(u8), 0.5, 0.5)
    want = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    assert float(jnp.max(got)) <= 1.0 and float(jnp.min(got)) >= -1.0


def test_dihedral_keeps_image_mask_aligned():
    # image channel 0 == mask pattern; any aligned transform preserves that
    rng = np.random.default_rng(1)
    mask = rng.integers(0, 2, (8, 16, 16)).astype(np.int32)
    image = mask[..., None].astype(np.float32)
    ai, am = random_dihedral(jax.random.key(0), jnp.asarray(image),
                             jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(ai[..., 0]).astype(np.int32),
                                  np.asarray(am))


def test_dihedral_actually_transforms_and_is_deterministic():
    rng = np.random.default_rng(2)
    image = jnp.asarray(rng.standard_normal((16, 8, 8, 1)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 2, (16, 8, 8)).astype(np.int32))
    a1, m1 = random_dihedral(jax.random.key(7), image, mask)
    a2, m2 = random_dihedral(jax.random.key(7), image, mask)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # with 16 samples, at least one must differ from the identity
    assert not np.array_equal(np.asarray(a1), np.asarray(image))
    # pixel multiset is preserved per sample
    np.testing.assert_allclose(
        np.sort(np.asarray(a1).reshape(16, -1), axis=1),
        np.sort(np.asarray(image).reshape(16, -1), axis=1),
    )


@pytest.mark.slow
def test_train_step_with_augment_and_u8_input():
    from insarseg.models.unet import UNet
    from insarseg.train import engine

    model = UNet(num_classes=2, base_features=4)
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (4, 16, 16, 1)).astype(np.uint8)
    masks = rng.integers(0, 2, (4, 16, 16)).astype(np.int32)
    state = engine.create_state(
        model, jax.random.key(0), normalize_u8(jnp.asarray(u8)), 1e-3
    )
    step = engine.make_train_step(model, 2, augment=True)
    state, out = step(state, jnp.asarray(u8), jnp.asarray(masks),
                      jax.random.key(1))
    assert np.isfinite(float(out["loss"]))
    assert int(state.step) == 1


def test_fit_with_augment_config(tmp_path):
    from insarseg.config import get_preset
    from insarseg.data.synthetic import make_synthetic_voc
    from insarseg.data.voc import BatchLoader, VOCSegDataset
    from insarseg.models.unet import UNet
    from insarseg.train import engine

    root = str(tmp_path / "voc")
    make_synthetic_voc(root, n_train=4, n_val=2, size=16)
    cfg = get_preset("unet", voc_root=root, image_size=16, batch_size=4,
                     num_epochs=1, augment=True)
    loader = BatchLoader(VOCSegDataset(root, 16, "train"), 4, shuffle=True)
    h = engine.fit(UNet(num_classes=2, base_features=4), cfg, loader,
                   verbose=False)
    assert np.isfinite(h[0]["train_loss"])
