"""UNet family: shape contracts, variant structure, torch logit parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from insarseg.models.unet import UNet
from tests import torch_ref as TR


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("use_se,use_sa", [(False, False), (True, False), (False, True)])
def test_unet_output_shape(use_se, use_sa):
    # base>=16 so SE's reduction-16 MLP is non-degenerate (as in torch)
    model = UNet(num_classes=2, base_features=16, use_se=use_se, use_sa=use_sa)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 32, 32, 2)


def test_unet_variant_param_structure():
    x = jnp.zeros((1, 16, 16, 1))
    plain = UNet(base_features=8).init(jax.random.key(0), x)["params"]
    se = UNet(base_features=16, use_se=True).init(jax.random.key(0), x)["params"]
    sa = UNet(base_features=8, use_sa=True).init(jax.random.key(0), x)["params"]
    assert "se" not in plain["inc"] and "se" in se["inc"]
    assert "sa1" in sa and "sa1" not in plain
    # SE MLP uses reduction 16 on the bottleneck-level channels
    c = 16 * 16
    assert se["down4"]["se"]["fc1"]["kernel"].shape == (c, c // 16)


@pytest.mark.parametrize("use_se,use_sa", [(False, False), (True, False), (False, True)])
def test_unet_logit_parity_vs_torch(use_se, use_sa):
    """<=1e-4 per-pixel logit parity against a torch-functional golden
    (BASELINE configs[1-3])."""
    model = UNet(num_classes=2, base_features=16, use_se=use_se, use_sa=use_sa)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    variables = model.init(jax.random.key(42), nhwc(x))
    params, stats = variables["params"], variables["batch_stats"]

    y = model.apply(variables, nhwc(x))  # eval mode
    with torch.no_grad():
        yt = TR.unet_forward(torch.from_numpy(x), params, stats, use_sa=use_sa)
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-4, rtol=1e-4)


def test_unet_train_mode_parity_vs_torch():
    model = UNet(num_classes=2, base_features=8)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((4, 1, 16, 16), dtype=np.float32)
    variables = model.init(jax.random.key(0), nhwc(x))
    y, _ = model.apply(variables, nhwc(x), train=True, mutable=["batch_stats"])
    with torch.no_grad():
        yt = TR.unet_forward(
            torch.from_numpy(x), variables["params"], variables["batch_stats"],
            training=True,
        )
    np.testing.assert_allclose(nchw(y), yt.numpy(), atol=1e-4, rtol=1e-4)


def test_unet_jit_and_grad():
    model = UNet(num_classes=2, base_features=8)
    x = jnp.ones((1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x)

    @jax.jit
    def loss_fn(params):
        y = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, x)
        return jnp.mean(y**2)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)
    assert any(np.abs(np.asarray(a)).max() > 0 for a in flat)
