"""The space-to-depth fast variant (insarseg/models/unet_stem.py):
shape contract, lossless stem, trainability, registry/preset wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from insarseg.models.registry import build
from insarseg.models.unet_stem import (
    UNetFastS2D,
    depth_to_space,
    space_to_depth,
)
from insarseg.train.engine import create_state, make_train_step


def test_s2d_d2s_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))
    assert space_to_depth(x).shape == (2, 16, 16, 12)


def test_fast_variant_shapes_and_params():
    model = UNetFastS2D(num_classes=2, level1_features=32, use_se=True)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 2)
    # inner plan: level1 stays at level1_features, deeper levels double
    p = variables["params"]["unet"]
    assert p["inc"]["conv2"]["kernel"].shape[-1] == 32
    assert p["down1"]["conv2"]["kernel"].shape[-1] == 32
    assert p["down4"]["conv2"]["kernel"].shape[-1] == 256


def test_fast_variant_trains():
    """Loss decreases on the smooth-threshold synthetic task."""
    rng = np.random.default_rng(0)
    model = UNetFastS2D(num_classes=2, level1_features=32, use_se=True)

    def batch(b=8, hw=32):
        base = rng.standard_normal((b, hw // 8, hw // 8, 1)).astype(np.float32)
        img = np.array(jax.image.resize(jnp.asarray(base), (b, hw, hw, 1),
                                        "linear"))
        mask = (img[..., 0] > 0.0).astype(np.int32)
        return jnp.asarray(img), jnp.asarray(mask)

    img, mask = batch()
    state = create_state(model, jax.random.key(0), img, tx=optax.adam(3e-3))
    step = make_train_step(model, num_classes=2, normalize=None)
    key = jax.random.key(1)
    losses = []
    for _ in range(8):
        img, mask = batch()
        key, k = jax.random.split(key)
        state, metrics = step(state, img, mask, k)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_fast_variant_registry_and_preset():
    from insarseg.config import get_preset
    from insarseg.models.registry import build_model

    m = build("unet-fast", "channel")
    assert isinstance(m, UNetFastS2D) and m.use_se
    cfg = get_preset("unet-fast-ca", image_size=64)
    m2 = build_model(cfg)
    assert isinstance(m2, UNetFastS2D)


def test_fast_variant_serving_engines():
    """serve (exact) and int8 engines on the fast variant vs module apply."""
    from insarseg.models.unet_stem import (
        make_fast_int8_predict_fn,
        make_fast_serve_predict_fn,
    )

    rng = np.random.default_rng(3)
    model = UNetFastS2D(num_classes=2, level1_features=32, use_se=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    # non-trivial stats so BN folding is exercised
    stats = jax.tree.map(
        lambda v: jnp.abs(v + 0.05 * jnp.arange(v.size, dtype=v.dtype)
                          .reshape(v.shape)) if v.ndim else v,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    want = model.apply(variables, x, train=False)

    serve = make_fast_serve_predict_fn(model, variables)
    got = serve(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)
    cls = make_fast_serve_predict_fn(model, variables, argmax=True)(x)
    assert cls.shape == (2, 64, 64)

    int8 = make_fast_int8_predict_fn(model, variables, [np.asarray(x)])
    got8 = int8(x)
    assert got8.shape == want.shape
    corr = np.corrcoef(np.asarray(got8, np.float32).ravel(),
                       np.asarray(want).ravel())[0, 1]
    assert corr > 0.98, corr
    cls8 = make_fast_int8_predict_fn(model, variables, [np.asarray(x)],
                                     argmax=True)(x)
    assert cls8.shape == (2, 64, 64) and cls8.dtype == jnp.int32


def test_fast_variant_sa_serving_engines():
    """The SA fast variant rides the same serve/int8 packs (per-pixel
    gates in the inner standard-layout graph)."""
    from insarseg.models.unet_stem import (
        make_fast_int8_predict_fn,
        make_fast_serve_predict_fn,
    )

    rng = np.random.default_rng(5)
    model = UNetFastS2D(num_classes=2, level1_features=32, use_sa=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    stats = jax.tree.map(
        lambda v: jnp.abs(v + 0.04 * jnp.arange(v.size, dtype=v.dtype)
                          .reshape(v.shape)) if v.ndim else v,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    want = model.apply(variables, x, train=False)

    got = make_fast_serve_predict_fn(model, variables)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)
    got8 = make_fast_int8_predict_fn(model, variables, [np.asarray(x)])(x)
    corr = np.corrcoef(np.asarray(got8, np.float32).ravel(),
                       np.asarray(want).ravel())[0, 1]
    assert corr > 0.98, corr
