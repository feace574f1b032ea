"""Exactness of the H-space-to-depth UNet inference graph
(insarseg/models/unet_s2d.py) against the standard module forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.models.unet import UNet
from insarseg.models.unet_s2d import (
    make_s2d_predict_fn,
    pack_unet_s2d,
    unet_s2d_apply,
)


def _init(use_se, base_features=16, hw=64, cin=1, seed=0):
    model = UNet(num_classes=2, base_features=base_features, use_se=use_se)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, hw, hw, cin)))
    # non-trivial batch_stats so BN folding is actually exercised
    stats = jax.tree.map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        if v.ndim else v,
        variables["batch_stats"],
    )
    stats = jax.tree.map(jnp.abs, stats)  # keep variances positive
    return model, {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("use_se", [False, True])
def test_s2d_matches_unet(use_se):
    model, variables = _init(use_se)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = unet_s2d_apply(pack_unet_s2d(variables), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_s2d_argmax_map_matches():
    model, variables = _init(True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    want = jnp.argmax(model.apply(variables, x, train=False), axis=-1)
    got = unet_s2d_apply(pack_unet_s2d(variables), x, argmax=True)
    assert got.shape == (2, 64, 64)
    # logit near-ties can flip the argmax at float tolerance; demand ~all
    agree = float(jnp.mean((got == want).astype(jnp.float32)))
    assert agree > 0.999, agree


def test_s2d_rectangular_and_jit():
    model, variables = _init(True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 96, 64, 1)), jnp.float32)
    want = model.apply(variables, x, train=False)
    predict = make_s2d_predict_fn(model, variables)
    got = predict(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_s2d_bf16_close_to_f32():
    model, variables = _init(True)
    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
    want = model.apply(variables, x32, train=False)
    got = unet_s2d_apply(pack_unet_s2d(variables), x32.astype(jnp.bfloat16))
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    assert diff.max() < 0.15, diff.max()  # bf16 accumulation noise


def test_s2d_rejects_sa_variant():
    model = UNet(num_classes=2, base_features=16, use_sa=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    with pytest.raises(AssertionError):
        pack_unet_s2d(variables)
