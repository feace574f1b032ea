"""Exactness of the deferred-SE-gate serving graph
(insarseg/models/unet_serve.py) against the standard module forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.models.unet import UNet
from insarseg.models.unet_serve import (
    make_serve_predict_fn,
    pack_unet_serve,
    unet_serve_apply,
)


def _init(use_se, base_features=16, hw=64, cin=1, seed=0):
    model = UNet(num_classes=2, base_features=base_features, use_se=use_se)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, hw, hw, cin)))
    stats = jax.tree.map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        if v.ndim else v,
        variables["batch_stats"],
    )
    stats = jax.tree.map(jnp.abs, stats)
    return model, {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("use_se", [False, True])
def test_serve_matches_unet(use_se):
    model, variables = _init(use_se)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = unet_serve_apply(pack_unet_serve(variables), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_serve_matches_unet_sa():
    """SA variant: per-pixel gates stay in place, BNs fold (incl. the SA
    DoubleConvs)."""
    model = UNet(num_classes=2, base_features=16, use_sa=True)
    variables = model.init(jax.random.key(3), jnp.zeros((1, 64, 64, 1)))
    stats = jax.tree.map(
        lambda v: jnp.abs(v + 0.07 * jnp.arange(
            v.size, dtype=v.dtype).reshape(v.shape) % 1.3) + 0.02
        if v.ndim else v,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = unet_serve_apply(pack_unet_serve(variables), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_serve_matches_unet_trained():
    """Parity must hold on TRAINED weights. Fresh-init SE gates are ~0.5
    uniform, which once masked a dropped decoder gate (the deferred gates of
    conv1..conv3 were never applied — 51% relative logit error on a trained
    model while this file stayed green); train first so every gate is
    informative."""
    import optax

    from insarseg.train.engine import create_state, make_train_step

    rng = np.random.default_rng(5)

    def batch(n=8):
        base = rng.standard_normal((n, 4, 4, 1)).astype(np.float32)
        img = np.array(jax.image.resize(jnp.asarray(base), (n, 32, 32, 1),
                                        "linear"))
        img += 0.05 * rng.standard_normal(img.shape).astype(np.float32)
        return jnp.asarray(img), jnp.asarray(
            (img[..., 0] > 0.0).astype(np.int32))

    model = UNet(num_classes=2, base_features=16, use_se=True)
    img, mask = batch()
    state = create_state(model, jax.random.key(0), img, tx=optax.adam(3e-3))
    step = make_train_step(model, num_classes=2, normalize=None)
    key = jax.random.key(1)
    for _ in range(25):
        img, mask = batch()
        key, k = jax.random.split(key)
        state, _ = step(state, img, mask, k)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    x, _ = batch(4)
    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(unet_serve_apply(pack_unet_serve(variables), x))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4 * max(scale, 1.0))


def test_serve_argmax_and_jit():
    model, variables = _init(True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 96, 64, 1)), jnp.float32)
    want = jnp.argmax(model.apply(variables, x, train=False), axis=-1)
    predict = make_serve_predict_fn(model, variables, argmax=True)
    got = predict(x)
    assert got.shape == (2, 96, 64) and got.dtype == jnp.int32
    agree = float(jnp.mean((got == want).astype(jnp.float32)))
    assert agree > 0.999, agree


def test_serve_gate_pool_commutation_exact():
    """maxpool(x*g) == maxpool(x)*g must hold bit-for-bit in bf16 too."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 16)), jnp.bfloat16)
    g = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((2, 1, 1, 16)),
                                   jnp.bfloat16))
    from insarseg.ops.layers import max_pool_2d
    a = max_pool_2d((x * g).astype(jnp.bfloat16), 2)
    b = (max_pool_2d(x, 2) * g).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


def test_s2d_pack_rejects_sa_variant():
    """The H-s2d graphs stay SE/plain-only (the SA channel mean/max would
    mix pixels across the folded parity lanes)."""
    from insarseg.models.unet_s2d import pack_unet_s2d

    model = UNet(num_classes=2, base_features=16, use_sa=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    with pytest.raises(AssertionError):
        pack_unet_s2d(variables)
