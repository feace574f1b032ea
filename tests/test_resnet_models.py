"""ResNet-50 backbone + DeepLabV3/FCN/PSPNet families: structure, OS=8,
torchvision param-count invariants, and torch logit parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from insarseg.models import DeepLabV3, FCN, PSPNet, ResNet50, build
from insarseg.ops.layers import adaptive_avg_pool_2d
from tests import torch_ref as TR


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def n_params(tree):
    return sum(int(p.size) for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def resnet_vars():
    model = ResNet50()
    x = jnp.zeros((1, 16, 16, 1))
    return model, model.init(jax.random.key(0), x)


def test_resnet_output_stride_8(resnet_vars):
    model, variables = resnet_vars
    x = jnp.zeros((1, 32, 32, 1))
    feats = model.apply(variables, x)
    assert feats["out"].shape == (1, 4, 4, 2048)
    assert feats["aux"].shape == (1, 4, 4, 1024)


def test_resnet50_param_count(resnet_vars):
    # torchvision resnet50: 25,557,032 params incl. fc (2,049,000) and a
    # 3-channel conv1 (9,408). Backbone-only with a 1-channel stem:
    # 25,557,032 - 2,049,000 - (9408 - 3136) = 23,501,760.
    _, variables = resnet_vars
    assert n_params(variables["params"]) == 23_501_760


def test_resnet_parity_vs_torch(resnet_vars):
    model, variables = resnet_vars
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 1, 16, 16), dtype=np.float32)
    feats = model.apply(variables, nhwc(x))
    with torch.no_grad():
        ft = TR.resnet50_forward(
            torch.from_numpy(x), variables["params"], variables["batch_stats"]
        )
    np.testing.assert_allclose(nchw(feats["out"]), ft["out"].numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(nchw(feats["aux"]), ft["aux"].numpy(),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("attention", ["none", "channel", "spatial"])
def test_deeplab_parity_vs_torch(attention):
    model = DeepLabV3(num_classes=2, attention=attention)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 16, 16), dtype=np.float32)
    variables = model.init(jax.random.key(1), nhwc(x))
    y = model.apply(variables, nhwc(x))
    assert y.shape == (1, 16, 16, 2)
    with torch.no_grad():
        yt = TR.deeplab_forward(
            torch.from_numpy(x), variables["params"], variables["batch_stats"],
            attention=attention,
        )
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=2e-4, rtol=1e-4)


def test_deeplab_sa_quirk_no_head_bn():
    """The SA variant drops BN+ReLU after the head conv
    (/root/reference/DeepLabV3-SpatialAttention.py:119)."""
    x = jnp.zeros((1, 16, 16, 1))
    sa = DeepLabV3(attention="spatial").init(jax.random.key(0), x)["params"]
    ca = DeepLabV3(attention="channel").init(jax.random.key(0), x)["params"]
    assert "head_bn" not in sa and "head_bn" in ca


@pytest.mark.parametrize("attention", ["none", "channel", "spatial"])
def test_fcn_parity_vs_torch(attention):
    model = FCN(num_classes=2, attention=attention)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1, 16, 16), dtype=np.float32)
    variables = model.init(jax.random.key(2), nhwc(x))
    y = model.apply(variables, nhwc(x))
    assert y.shape == (1, 16, 16, 2)
    with torch.no_grad():
        yt = TR.fcn_forward(
            torch.from_numpy(x), variables["params"], variables["batch_stats"],
            attention=attention,
        )
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=2e-4, rtol=1e-4)


def test_fcn_se_in_every_bottleneck():
    x = jnp.zeros((1, 16, 16, 1))
    p = FCN(attention="channel").init(jax.random.key(0), x)["params"]["backbone"]
    blocks = [k for k in p if k.startswith("layer")]
    assert len(blocks) == 16  # 3+4+6+3
    assert all("se_block" in p[k] for k in blocks)


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 8, 8), dtype=np.float32)
    for bins in (1, 2, 3, 6):
        y = adaptive_avg_pool_2d(nhwc(x), bins)
        yt = F.adaptive_avg_pool2d(torch.from_numpy(x), bins)
        np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)
    # non-divisible output on odd input
    x = rng.standard_normal((1, 2, 7, 5), dtype=np.float32)
    y = adaptive_avg_pool_2d(nhwc(x), (3, 2))
    yt = F.adaptive_avg_pool2d(torch.from_numpy(x), (3, 2))
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-5, rtol=1e-5)


def test_pspnet_shapes_and_train_mode():
    model = PSPNet(num_classes=2)
    x = jnp.zeros((1, 48, 48, 1))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 48, 48, 2)
    # PPM branches exist for each bin
    assert all(f"conv_bin{b}" in variables["params"]["ppm"] for b in (1, 2, 3, 6))
    y2, _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    assert y2.shape == (1, 48, 48, 2)


def test_registry_builds_all_cells():
    for m in ("unet", "deeplabv3", "fcn", "pspnet"):
        for a in ("none", "channel", "spatial"):
            mod = build(m, a)
            assert mod is not None
    with pytest.raises(KeyError):
        build("segformer")


def test_resnet101_backbone_option():
    """backbone='resnet101' (accepted by the reference wrappers,
    /root/reference/DeepLabV3.py:57-58) -> layers (3,4,23,3)."""
    model = FCN(num_classes=2, backbone="resnet101")
    v = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    blocks = [k for k in v["params"]["backbone"] if k.startswith("layer3_")]
    assert len(blocks) == 23
    y = model.apply(v, jnp.zeros((1, 16, 16, 1)))
    assert y.shape == (1, 16, 16, 2)
    with pytest.raises(ValueError, match="Unsupported backbone"):
        DeepLabV3(backbone="resnet34").init(jax.random.key(0),
                                            jnp.zeros((1, 16, 16, 1)))
