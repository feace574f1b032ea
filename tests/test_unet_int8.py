"""int8 post-training quantization (insarseg/models/unet_int8.py):
quantized logits must track the f32 graph on a *trained* model (random-init
logits are near-zero ties, so training first makes the check meaningful)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from insarseg.models.unet import UNet
from insarseg.models.unet_int8 import pack_unet_int8, unet_int8_apply
from insarseg.train.engine import create_state, make_train_step

HW = 32


def _task_batch(rng, batch=8):
    """Learnable synthetic task: the class is a smooth threshold of the
    input field, so a few steps of training produce confident logits."""
    base = rng.standard_normal((batch, HW // 8, HW // 8, 1)).astype(np.float32)
    img = np.array(jax.image.resize(jnp.asarray(base), (batch, HW, HW, 1),
                                    "linear"))
    img += 0.05 * rng.standard_normal(img.shape).astype(np.float32)
    mask = (img[..., 0] > 0.0).astype(np.int32)
    return jnp.asarray(img), jnp.asarray(mask)


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    model = UNet(num_classes=2, base_features=16, use_se=True)
    img, mask = _task_batch(rng)
    state = create_state(model, jax.random.key(0), img,
                         tx=optax.adam(3e-3))
    step = make_train_step(model, num_classes=2, normalize=None)
    key = jax.random.key(1)
    for i in range(40):
        img, mask = _task_batch(rng)
        key, k = jax.random.split(key)
        state, metrics = step(state, img, mask, k)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    calib = [_task_batch(rng, 4)[0] for _ in range(2)]
    return model, variables, calib


def test_int8_tracks_f32_argmax(trained):
    model, variables, calib = trained
    packed = pack_unet_int8(variables, calib)
    rng = np.random.default_rng(7)
    img, _ = _task_batch(rng, 4)
    want = model.apply(variables, img, train=False)
    got = unet_int8_apply(packed, img)
    assert got.shape == want.shape
    agree = float(jnp.mean(
        (jnp.argmax(got, -1) == jnp.argmax(want, -1)).astype(jnp.float32)))
    assert agree > 0.98, agree
    # logit error bounded relative to the dynamic range
    scale = float(jnp.max(jnp.abs(want)))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want))) / scale
    assert err < 0.15, err


def test_int8_argmax_path(trained):
    model, variables, calib = trained
    packed = pack_unet_int8(variables, calib)
    rng = np.random.default_rng(8)
    img, _ = _task_batch(rng, 2)
    cls = unet_int8_apply(packed, img, argmax=True)
    assert cls.shape == (2, HW, HW) and cls.dtype == jnp.int32
    logits = unet_int8_apply(packed, img)
    np.testing.assert_array_equal(np.asarray(cls),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_int8_plain_unet_no_se():
    """The plain (no-SE) variant quantizes through the same pack."""
    rng = np.random.default_rng(1)
    model = UNet(num_classes=2, base_features=16, use_se=False)
    img, _ = _task_batch(rng, 4)
    variables = model.init(jax.random.key(0), img)
    packed = pack_unet_int8(variables, [img])
    got = unet_int8_apply(packed, img)
    want = model.apply(variables, img, train=False)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.98, corr


def test_int8_sa_variant_standard_layout():
    """The SA variant quantizes through the standard-layout pack: gates
    computed from the dequantized codes, applied on the codes in place."""
    rng = np.random.default_rng(2)
    model = UNet(num_classes=2, base_features=16, use_sa=True)
    img, _ = _task_batch(rng, 4)
    variables = model.init(jax.random.key(0), img)
    packed = pack_unet_int8(variables, [img], s2d=False)
    assert "sa1" in packed and "sa4" in packed
    got = unet_int8_apply(packed, img)
    want = model.apply(variables, img, train=False)
    assert got.shape == want.shape
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.98, corr
