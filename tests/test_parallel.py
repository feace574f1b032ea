"""Multi-device (8 virtual CPU) sharding tests: data-parallel training step
equivalence, spatially-partitioned inference (GSPMD halo exchange), sharded
predict fn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.models.unet import UNet
from insarseg.parallel import make_mesh, make_predict_fn, replicate, shard_batch
from insarseg.train import engine


@pytest.fixture()
def setup():
    # Function-scoped: the train step donates its input state, so every test
    # needs fresh (undeleted) arrays.
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    model = UNet(num_classes=2, base_features=4)
    batch = {
        "image": np.random.default_rng(0)
        .standard_normal((8, 16, 16, 1))
        .astype(np.float32),
        "mask": np.random.default_rng(1).integers(0, 2, (8, 16, 16)).astype(np.int32),
        "n_valid": 8,
    }
    state = engine.create_state(
        model, jax.random.key(0), jnp.asarray(batch["image"]), 1e-3
    )
    return model, batch, state


def test_data_parallel_train_step_matches_single_device(setup):
    import optax

    model, batch, _ = setup
    step = engine.make_train_step(model, 2)
    # SGD keeps the update linear in the gradient, so the comparison directly
    # checks the all-reduced gradients (Adam would amplify reduction-order
    # noise on near-zero grads chaotically).
    tx = optax.sgd(0.1)
    state = engine.create_state(
        model, jax.random.key(0), jnp.asarray(batch["image"]), tx=tx
    )

    # single device
    s1, out1 = step(
        state, jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]),
        jax.random.key(7),
    )

    # 8-way data parallel: same math, global-batch BN/grads via GSPMD
    mesh = make_mesh(data=8)
    state8 = engine.create_state(
        model, jax.random.key(0), jnp.asarray(batch["image"]), tx=tx
    )
    state8 = state8.replace(
        params=replicate(state8.params, mesh),
        batch_stats=replicate(state8.batch_stats, mesh),
        opt_state=replicate(state8.opt_state, mesh),
    )
    sb = shard_batch(batch, mesh)
    s8, out8 = step(state8, sb["image"], sb["mask"], jax.random.key(7))

    np.testing.assert_allclose(float(out1["loss"]), float(out8["loss"]), rtol=1e-5)
    for k in ("tp", "fp", "fn"):
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out8[k]))
    # params after the update must match (grad all-reduce correctness);
    # tolerance covers reduction-order noise amplified by Adam's rescaling
    a = jax.tree.leaves(s1.params)
    b = jax.tree.leaves(s8.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)
    # BN running stats must match (sync-BN via global-batch reduction)
    for x, y in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_spatial_partitioning_matches_unsharded(setup):
    """Sharding H over 'spatial' must be numerically invisible — XLA inserts
    conv halo exchanges."""
    model, batch, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ref = make_predict_fn(model)(variables, jnp.asarray(batch["image"]))

    mesh = make_mesh(data=4, spatial=2)
    predict = make_predict_fn(model, mesh=mesh)
    vrep = replicate(variables, mesh)
    sharded = shard_batch(batch, mesh)
    got = predict(vrep, sharded["image"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_predict_fn_argmax_and_dtype(setup):
    model, batch, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = make_mesh(data=8)
    predict = make_predict_fn(model, mesh=mesh, argmax=True,
                              input_dtype=jnp.bfloat16)
    vrep = replicate(variables, mesh)
    preds = predict(vrep, shard_batch(batch, mesh)["image"])
    assert preds.shape == (8, 16, 16) and preds.dtype == jnp.int32
    assert set(np.unique(np.asarray(preds))) <= {0, 1}


def test_mesh_shapes():
    m = make_mesh(data=8)
    assert m.shape == {"data": 8, "spatial": 1}
    m = make_mesh(data=-1, spatial=4)
    assert m.shape == {"data": 2, "spatial": 4}
