"""Pallas fused kernels vs XLA reference twins (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.models.unet import UNet
from insarseg.models.unet_fast import unet_fused_apply
from insarseg.ops.blocks import SELayer
from insarseg.ops.fold import fold_bn
from insarseg.ops.layers import BatchNorm2d, Conv2d
from insarseg.ops.pallas import conv3x3_bn_relu, se_scale


def test_fold_bn_matches_eval_bn():
    rng = np.random.default_rng(0)
    c = 8
    x = jnp.asarray(rng.standard_normal((2, 4, 4, c), np.float32))
    params = {"scale": jnp.asarray(rng.standard_normal(c), jnp.float32),
              "bias": jnp.asarray(rng.standard_normal(c), jnp.float32)}
    stats = {"mean": jnp.asarray(rng.standard_normal(c), jnp.float32),
             "var": jnp.asarray(rng.random(c) + 0.5, jnp.float32)}
    bn = BatchNorm2d()
    want = bn.apply({"params": params, "batch_stats": stats}, x,
                    use_running_average=True)
    s, t = fold_bn(params, stats)
    np.testing.assert_allclose(np.asarray(x * s + t), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout,h,w", [(8, 16, 8, 8), (16, 8, 16, 12)])
def test_conv3x3_bn_relu_kernel(cin, cout, h, w):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin), np.float32))
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout), np.float32)) * 0.1
    scale = jnp.asarray(rng.random(cout) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)

    got = conv3x3_bn_relu(x, wk, scale, bias, interpret=True)

    conv = Conv2d(cout, 3, padding=1, use_bias=False)
    y = conv.apply({"params": {"kernel": wk}}, x)
    want = jnp.maximum(y * scale + bias, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_kernel_no_relu_and_block_h():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), np.float32))
    wk = jnp.asarray(rng.standard_normal((3, 3, 4, 4), np.float32)) * 0.1
    one = jnp.ones(4, jnp.float32)
    zero = jnp.zeros(4, jnp.float32)
    got = conv3x3_bn_relu(x, wk, one, zero, relu=False, block_h=2,
                          interpret=True)
    conv = Conv2d(4, 3, padding=1, use_bias=False)
    want = conv.apply({"params": {"kernel": wk}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    assert np.asarray(got).min() < 0  # relu really off


def test_se_scale_kernel():
    rng = np.random.default_rng(3)
    c, r = 32, 16
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c), np.float32))
    w1 = jnp.asarray(rng.standard_normal((c, c // r), np.float32))
    w2 = jnp.asarray(rng.standard_normal((c // r, c), np.float32))
    got = se_scale(x, w1, w2, interpret=True)
    se = SELayer(reduction=r)
    want = se.apply({"params": {"fc1": {"kernel": w1}, "fc2": {"kernel": w2}}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("use_se,use_sa", [(False, False), (True, False), (False, True)])
def test_unet_fused_apply_matches_module(use_se, use_sa):
    model = UNet(num_classes=2, base_features=16, use_se=use_se, use_sa=use_sa)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1), np.float32))
    variables = model.init(jax.random.key(0), x)
    want = model.apply(variables, x)
    got = unet_fused_apply(variables, x, use_sa=use_sa, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
