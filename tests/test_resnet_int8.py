"""int8 PTQ for the ResNet families (insarseg/models/resnet_int8.py):
quantized logits must track the f32 folded graph. (ResNet50 training is too
slow for the single-core CPU suite, so these use perturbed-init models and
a correlation check — the trained-model argmax check runs for the UNet
engine in test_unet_int8.py, which shares the epilogue/requant design.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.models.registry import build
from insarseg.models.resnet_int8 import (
    make_resnet_int8_predict_fn,
    pack_resnet_int8,
    resnet_int8_apply,
)

HW = 32


def _init(model_name, attention, seed=0):
    model = build(model_name, attention)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, HW, HW, 1)))
    stats = jax.tree.map(
        lambda v: jnp.abs(
            v + 0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape) % 1.3
        ) + 0.05 if v.ndim else v,
        variables["batch_stats"],
    )
    return model, {"params": variables["params"], "batch_stats": stats}


def _smooth_batch(rng, batch=2):
    base = rng.standard_normal((batch, HW // 8, HW // 8, 1)).astype(np.float32)
    img = np.asarray(jax.image.resize(jnp.asarray(base), (batch, HW, HW, 1),
                                      "linear"))
    return jnp.asarray(img)


@pytest.mark.parametrize(
    "model_name,attention",
    [("deeplabv3", "none"), ("deeplabv3", "spatial"), ("fcn", "channel"),
     ("pspnet", "none")],
)
def test_int8_tracks_f32(model_name, attention):
    model, variables = _init(model_name, attention)
    rng = np.random.default_rng(0)
    calib = [_smooth_batch(rng) for _ in range(2)]
    packed = pack_resnet_int8(variables, calib)
    img = _smooth_batch(rng)
    want = np.asarray(model.apply(variables, img, train=False), np.float32)
    got = np.asarray(resnet_int8_apply(packed, img), np.float32)
    assert got.shape == want.shape
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.97, corr


def test_int8_argmax_path_and_jit():
    _, variables = _init("fcn", "spatial")
    rng = np.random.default_rng(3)
    calib = [_smooth_batch(rng)]
    predict = make_resnet_int8_predict_fn(variables, calib, argmax=True)
    img = _smooth_batch(rng)
    cls = predict(img)
    assert cls.shape == (2, HW, HW) and cls.dtype == jnp.int32
    logits = resnet_int8_apply(pack_resnet_int8(variables, calib), img)
    agree = float(jnp.mean((cls == jnp.argmax(logits, -1)).astype(jnp.float32)))
    assert agree == 1.0, agree
