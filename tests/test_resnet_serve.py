"""Exactness of the BN-folded ResNet-family serving graphs
(insarseg/models/resnet_serve.py) against the module forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.models.registry import build
from insarseg.models.resnet_serve import (
    make_resnet_serve_predict_fn,
    pack_resnet_serve,
    resnet_serve_apply,
)


def _init(model_name, attention, hw=32, cin=1, seed=0):
    model = build(model_name, attention)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, hw, hw, cin)))
    # perturb the running stats so BN folding is non-trivial (init is
    # mean=0 var=1, which folding would trivially satisfy)
    stats = jax.tree.map(
        lambda v: jnp.abs(
            v + 0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape) % 1.7
        ) + 0.01 if v.ndim else v,
        variables["batch_stats"],
    )
    return model, {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize(
    "model_name,attention",
    [("deeplabv3", "none"), ("deeplabv3", "channel"), ("deeplabv3", "spatial"),
     ("fcn", "none"), ("fcn", "channel"), ("fcn", "spatial"),
     ("pspnet", "none"), ("pspnet", "spatial")],
)
def test_serve_matches_module(model_name, attention):
    model, variables = _init(model_name, attention)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = resnet_serve_apply(pack_resnet_serve(variables), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-4)


def test_serve_argmax_jit_and_rect():
    model, variables = _init("fcn", "channel")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 48, 32, 1)), jnp.float32)
    want = jnp.argmax(model.apply(variables, x, train=False), axis=-1)
    predict = make_resnet_serve_predict_fn(variables, argmax=True)
    got = predict(x)
    assert got.shape == (2, 48, 32) and got.dtype == jnp.int32
    agree = float(jnp.mean((got == want).astype(jnp.float32)))
    assert agree > 0.999, agree


def test_pack_detects_sa_head_quirk():
    """DeepLab-SA packs a bare 3x3 head conv (no folded BN) — the
    reference's dropped-BN quirk must survive the serving transform."""
    _, v_sa = _init("deeplabv3", "spatial")
    _, v_ca = _init("deeplabv3", "channel")
    p_sa = pack_resnet_serve(v_sa)
    p_ca = pack_resnet_serve(v_ca)
    assert "s" not in p_sa["head"] and "s" in p_ca["head"]
    assert p_sa["attention"]["type"] == "spatial"
    assert p_ca["attention"]["type"] == "channel"
