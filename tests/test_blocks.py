"""Attention-block numerics vs torch-functional goldens + hand math."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from insarseg.ops import blocks as B
from tests import torch_ref as TR


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape, dtype=np.float32)


def test_se_layer_matches_torch():
    x = _rand((2, 32, 6, 6), 0)
    m = B.SELayer(reduction=16)
    p = m.init(jax.random.key(0), nhwc(x))["params"]
    y = m.apply({"params": p}, nhwc(x))
    yt = TR.se_layer(torch.from_numpy(x), p)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


def test_se_block_matches_torch():
    x = _rand((2, 32, 6, 6), 1)
    m = B.SEBlock(reduction=16)
    p = m.init(jax.random.key(1), nhwc(x))["params"]
    y = m.apply({"params": p}, nhwc(x))
    yt = TR.se_block(torch.from_numpy(x), p)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


def test_channel_attention_matches_torch():
    x = _rand((2, 32, 6, 6), 2)
    m = B.ChannelAttentionModule(reduction=16)
    p = m.init(jax.random.key(2), nhwc(x))["params"]
    y = m.apply({"params": p}, nhwc(x))
    yt = TR.channel_attention(torch.from_numpy(x), p)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


def test_spatial_attention_conv_matches_torch():
    x = _rand((2, 16, 8, 8), 3)
    m = B.SpatialAttentionConv(kernel_size=7)
    p = m.init(jax.random.key(3), nhwc(x))["params"]
    y = m.apply({"params": p}, nhwc(x))
    yt = TR.spatial_attention_conv(torch.from_numpy(x), p, kernel_size=7)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


def test_spatial_attention_dc_matches_torch():
    x = _rand((2, 16, 8, 8), 4)
    m = B.SpatialAttentionDC()
    v = m.init(jax.random.key(4), nhwc(x))
    y = m.apply(v, nhwc(x))
    yt = TR.spatial_attention_dc(torch.from_numpy(x), v["params"], v["batch_stats"])
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


def test_se_hand_math():
    """SE with identity-ish weights: constant-channel input -> sigmoid gate."""
    c, r = 16, 16
    m = B.SELayer(reduction=r)
    x = jnp.ones((1, 4, 4, c))
    p = m.init(jax.random.key(0), x)["params"]
    # fc1: C->1 all ones => pooled sum = C; fc2: 1->C weight w
    p = {
        "fc1": {"kernel": jnp.ones((c, 1))},
        "fc2": {"kernel": jnp.full((1, c), 0.5)},
    }
    y = m.apply({"params": p}, x)
    # squeeze=1 per channel; fc1 -> 16; relu; fc2 -> 8; sigmoid(8)~0.99966
    expected = 1.0 / (1.0 + np.exp(-8.0))
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0], expected, rtol=1e-5)


def test_double_conv_se_insertion():
    m = B.DoubleConv(32, use_se=True)
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)))
    assert "se" in v["params"]
    assert v["params"]["se"]["fc1"]["kernel"].shape == (32, 2)


def test_small_channel_se_reduction_guard():
    # reduction=16 on <16 channels would create a 0-width layer in torch too;
    # our blocks mirror torch and are only instantiated at >=64 channels.
    m = B.SELayer(reduction=4)
    v = m.init(jax.random.key(0), jnp.zeros((1, 4, 4, 8)))
    assert v["params"]["fc1"]["kernel"].shape == (8, 2)
