"""Layer-level numeric parity vs torch.nn.functional (CPU golden)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from insarseg.ops import layers as L
from tests import torch_ref as TR


def nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def nchw(y_nhwc) -> np.ndarray:
    return np.transpose(np.asarray(y_nhwc), (0, 3, 1, 2))


@pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 3, 1), (1, 2, 2)])
def test_conv2d_matches_torch(stride, padding, dilation):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16, 16), dtype=np.float32)
    m = L.Conv2d(7, 3, stride=stride, padding=padding, dilation=dilation)
    params = m.init(jax.random.key(0), nhwc(x))["params"]
    y = m.apply({"params": params}, nhwc(x))
    yt = TR.conv2d(torch.from_numpy(x), params, stride, padding, dilation)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,stride", [(2, 2), (3, 2), (4, 2)])
def test_conv_transpose2d_matches_torch(k, stride):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 8, 8), dtype=np.float32)
    m = L.ConvTranspose2d(4, k, stride=stride)
    params = m.init(jax.random.key(0), nhwc(x))["params"]
    y = m.apply({"params": params}, nhwc(x))
    yt = TR.conv_transpose2d(torch.from_numpy(x), params, stride=stride)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


def test_batchnorm_eval_and_train_match_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 3, 8, 8), dtype=np.float32)
    m = L.BatchNorm2d()
    v = m.init(jax.random.key(0), nhwc(x), use_running_average=False)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), jnp.float32), v["params"]
    )
    stats = {
        "mean": jnp.asarray(rng.standard_normal(3), jnp.float32),
        "var": jnp.asarray(rng.random(3) + 0.5, jnp.float32),
    }

    # eval mode
    y = m.apply({"params": params, "batch_stats": stats}, nhwc(x),
                use_running_average=True)
    yt, _, _ = TR.batch_norm(torch.from_numpy(x), params, stats, training=False)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)

    # train mode: normalized output AND running-stat updates must match
    y, mut = m.apply(
        {"params": params, "batch_stats": stats}, nhwc(x),
        use_running_average=False, mutable=["batch_stats"],
    )
    yt, rm, rv = TR.batch_norm(torch.from_numpy(x), params, stats, training=True)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(mut["batch_stats"]["mean"], rm.numpy(), atol=1e-6)
    np.testing.assert_allclose(mut["batch_stats"]["var"], rv.numpy(), atol=1e-5)


def test_max_pool_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 9, 9), dtype=np.float32)
    # MaxPool2d(2): floor mode -> 4x4
    y = L.max_pool_2d(nhwc(x), 2)
    yt = F.max_pool2d(torch.from_numpy(x), 2)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=0)
    # MaxPool2d(3, stride=2, padding=1) — the ResNet stem pool
    y = L.max_pool_2d(nhwc(x), 3, stride=2, padding=1)
    yt = F.max_pool2d(torch.from_numpy(x), 3, stride=2, padding=1)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=0)


def test_resize_bilinear_matches_torch_interpolate():
    from insarseg.ops.resize import resize_bilinear

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 7, 7), dtype=np.float32)
    for size in [(14, 14), (56, 56), (5, 9)]:
        y = resize_bilinear(nhwc(x), size)
        yt = F.interpolate(torch.from_numpy(x), size=size, mode="bilinear",
                           align_corners=False)
        np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


def test_torch_default_init_distribution():
    # kaiming_uniform(a=sqrt(5)) ==> U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    m = L.Conv2d(64, 3, padding=1)
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 32)))["params"]
    bound = 1.0 / np.sqrt(32 * 9)
    k = np.asarray(params["kernel"])
    assert np.abs(k).max() <= bound
    assert np.abs(k).max() > 0.9 * bound  # actually fills the range
    assert np.abs(np.asarray(params["bias"])).max() <= bound
