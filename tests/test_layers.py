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


def test_stop_bias_grad_is_the_analytic_zero():
    """DoubleConv convs feed train-mode BN directly, so the conv-bias
    gradient is analytically zero: BN subtracts the per-channel batch mean
    and its variance uses E[x^2]-E[x]^2, so a per-channel constant shift
    cancels exactly. Conv2d(stop_bias_grad=True) (set by DoubleConv when
    train=True) makes autodiff return that exact zero instead of paying
    full-activation-tensor reductions for ~1e-8 summation noise — 24.9 of
    215.7 ms/iter on the 512^2 exact bf16 train step (BASELINE.md
    "Round 5: train-step speed of light"). Three claims, each checked:
    the loss is invariant to a LARGE bias shift; the stopped grads are
    exactly 0 where the free ones are fp noise; every other grad is
    bit-identical with and without the stop."""
    from unittest import mock

    import insarseg.ops.layers as L_
    from insarseg.models.registry import build
    from insarseg.train.losses import cross_entropy_loss

    model = build("unet", "channel", num_classes=2)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 1))
    y = jax.random.randint(jax.random.key(1), (2, 32, 32), 0, 2)
    v = model.init(jax.random.key(2), x, train=True)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return cross_entropy_loss(out, y, 255)

    # 1) loss invariance under a large per-channel shift of a stopped bias
    shifted = jax.tree_util.tree_map(jnp.asarray, jax.device_get(v["params"]))
    shifted["inc"]["conv1"]["bias"] = shifted["inc"]["conv1"]["bias"] + 3.7
    l0, l1 = float(loss_fn(v["params"])), float(loss_fn(shifted))
    assert abs(l1 - l0) / abs(l0) < 1e-5

    # 2+3) stopped grads exactly zero; all other grads bit-identical
    g_stop = jax.grad(loss_fn)(v["params"])
    with mock.patch.object(L_.lax, "stop_gradient", lambda t: t):
        g_free = jax.grad(loss_fn)(v["params"])
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_stop),
        jax.tree_util.tree_leaves_with_path(g_free),
    ):
        ps = jax.tree_util.keystr(path)
        is_dc_bias = ps.endswith("['conv1']['bias']") or ps.endswith(
            "['conv2']['bias']")
        if is_dc_bias:
            assert float(jnp.max(jnp.abs(a))) == 0.0, ps
            assert float(jnp.max(jnp.abs(b))) < 1e-6, ps  # fp noise, not signal
        else:
            assert float(jnp.max(jnp.abs(a - b))) == 0.0, ps


def test_stop_bias_grad_off_in_eval_mode():
    """In eval mode BN uses running stats — no cancellation — so DoubleConv
    must leave bias grads live (stop_bias_grad follows ``train``)."""
    from insarseg.ops.blocks import DoubleConv

    m = DoubleConv(8)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    v = m.init(jax.random.key(1), x, train=True)

    def loss(p):
        return jnp.sum(m.apply({"params": p, "batch_stats": v["batch_stats"]},
                               x, train=False) ** 2)

    g = jax.grad(loss)(v["params"])
    assert float(jnp.max(jnp.abs(g["conv1"]["bias"]))) > 0.0
