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


@pytest.mark.slow
def test_remat_identical_training_step():
    """UNet(remat=True) must produce bit-equal logits and numerically
    identical grads/BN updates — jax.checkpoint only changes WHEN the
    DoubleConv activations are (re)computed, not what is computed."""
    import optax

    from insarseg.models.unet import UNet
    from insarseg.train.engine import create_state, make_train_step

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (2, 32, 32)), jnp.int32)

    models = [UNet(num_classes=2, base_features=16, use_se=True, remat=r)
              for r in (False, True)]
    variables = models[0].init(jax.random.key(0), img)
    # remat must not change the parameter structure
    v2 = models[1].init(jax.random.key(0), img)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    # host copy: the train step donates its state, so each model gets
    # fresh device buffers
    host_vars = jax.device_get(variables)
    outs = []
    for m in models:
        fresh = jax.tree.map(jnp.asarray, host_vars)
        y = m.apply(fresh, img, train=False)
        state = create_state(m, jax.random.key(0), img, tx=optax.sgd(0.1))
        state = state.replace(params=fresh["params"],
                              batch_stats=fresh["batch_stats"])
        step = make_train_step(m, num_classes=2, normalize=None)
        state, metrics = step(state, img, mask, jax.random.key(7))
        outs.append((y, metrics["loss"], state.params, state.batch_stats))
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    np.testing.assert_allclose(float(outs[0][1]), float(outs[1][1]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][2]), jax.tree.leaves(outs[1][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][3]), jax.tree.leaves(outs[1][3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
