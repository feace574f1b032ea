"""Unified engine factory (insarseg/engines.py): support matrix + the
module engine wrapper. Heavy engine parity is covered per-family in
test_unet_serve/test_unet_int8/test_resnet_serve/test_resnet_int8."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.engines import make_engine, supported


def test_support_matrix():
    assert supported("unet", "channel", "serve")
    assert supported("unet", "none", "int8")
    assert supported("unet", "spatial", "serve")  # BN-folded, gates in place
    assert supported("unet", "spatial", "int8")   # standard-layout pack
    assert supported("unet", "spatial", "module")
    assert supported("unet-fast", "spatial", "serve")
    for fam in ("deeplabv3", "fcn", "pspnet"):
        for att in ("none", "channel", "spatial"):
            for eng in ("module", "serve", "int8"):
                assert supported(fam, att, eng), (fam, att, eng)
    assert supported("unet-fast", "channel", "int8")
    assert not supported("unet", "none", "bogus")


def test_module_engine_wraps_apply():
    from insarseg.models.unet import UNet

    model = UNet(num_classes=2, base_features=8)
    x = jnp.zeros((1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    predict = make_engine("unet", "none", model, variables, "module",
                          argmax=True)
    want = jnp.argmax(model.apply(variables, img, train=False), -1)
    np.testing.assert_array_equal(np.asarray(predict(img)), np.asarray(want))


def test_int8_requires_calib():
    from insarseg.models.unet import UNet

    model = UNet(num_classes=2, base_features=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    with pytest.raises(ValueError, match="calib"):
        make_engine("unet", "none", model, variables, "int8")


def test_unknown_engine_raises():
    with pytest.raises(ValueError, match="unknown engine"):
        make_engine("unet", "none", None, {}, "bogus")


def test_unknown_model_raises():
    with pytest.raises(ValueError, match="unknown model"):
        make_engine("resnext", "none", None, {}, "serve")
