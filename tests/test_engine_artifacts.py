"""Engine artifacts (insarseg/engines_io.py + engines.pack_engine /
engine_from_artifact): pack/calibrate once, save to disk, serve anywhere —
the artifact predict must be bit-exact vs the predict make_engine builds
from the original variables, across families, engines, and dtypes
(int8 codes, bf16 folded weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.engines import engine_from_artifact, make_engine, pack_engine
from insarseg.engines_io import load_artifact, save_artifact
from insarseg.models.registry import build


def _smooth(rng, shape):
    b, h, w, c = shape
    coarse = rng.standard_normal((b, max(h // 4, 1), max(w // 4, 1), c))
    return np.asarray(jax.image.resize(
        jnp.asarray(coarse, jnp.float32), shape, "bilinear"))


def _init(model_name, attention, hw=32):
    if model_name == "unet":
        from insarseg.models.unet import UNet

        model = UNet(num_classes=2, base_features=16,
                     use_se=attention == "channel",
                     use_sa=attention == "spatial")
    elif model_name == "unet-fast":
        from insarseg.models.unet_stem import UNetFastS2D

        model = UNetFastS2D(num_classes=2, level1_features=16,
                            use_se=attention == "channel")
    else:
        model = build(model_name, attention)
    variables = model.init(jax.random.key(0), jnp.zeros((1, hw, hw, 1)))
    if model_name not in ("unet", "unet-fast"):
        stats = jax.tree.map(
            lambda v: jnp.abs(v + 0.03 * jnp.arange(
                v.size, dtype=v.dtype).reshape(v.shape) % 1.3) + 0.01
            if v.ndim else v,
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}
    return model, variables


@pytest.mark.parametrize(
    "model_name,attention,engine",
    [("unet", "channel", "serve"), ("unet", "channel", "int8"),
     ("unet", "spatial", "int8"), ("unet-fast", "channel", "int8"),
     ("fcn", "channel", "serve"), ("deeplabv3", "none", "int8")],
)
def test_artifact_roundtrip_bit_exact(tmp_path, model_name, attention,
                                      engine):
    model, variables = _init(model_name, attention)
    rng = np.random.default_rng(0)
    x = jnp.asarray(_smooth(rng, (2, 32, 32, 1)))
    calib = [np.asarray(x)] if engine == "int8" else None

    want = make_engine(model_name, attention, model, variables, engine,
                       calib_batches=calib)(x)

    art = pack_engine(model_name, attention, model, variables, engine,
                      calib_batches=calib)
    path = save_artifact(str(tmp_path / "eng"), art)
    loaded = load_artifact(path)
    assert loaded["model"] == model_name.replace("_", "-")
    got = engine_from_artifact(loaded)(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                  err_msg=f"{model_name}/{attention}/{engine}")


def test_artifact_preserves_exotic_dtypes(tmp_path):
    """int8 codes and bf16 folded weights must survive the raw-bytes
    round trip bit-for-bit."""
    tree = {"codes": jnp.arange(-128, 128, dtype=jnp.int8).reshape(16, 16),
            "w": jnp.linspace(-3, 3, 64).astype(jnp.bfloat16),
            "scale": 1.5e-3, "flag": True, "none": None,
            "name": "x", "shape": (2, 3), "plan": [3, 4, 6, 3]}
    art = {"format": 1, "model": "unet", "attention": "none",
           "engine": "serve", "meta": {}, "tree": tree}
    back = load_artifact(save_artifact(str(tmp_path / "t"), art))["tree"]
    np.testing.assert_array_equal(np.asarray(back["codes"]),
                                  np.asarray(tree["codes"]))
    assert back["codes"].dtype == np.int8
    assert str(back["w"].dtype) == "bfloat16"
    np.testing.assert_array_equal(np.asarray(back["w"]).view(np.uint16),
                                  np.asarray(tree["w"]).view(np.uint16))
    assert back["scale"] == tree["scale"] and back["flag"] is True
    assert back["none"] is None and back["name"] == "x"
    assert back["shape"] == (2, 3) and back["plan"] == [3, 4, 6, 3]


def test_artifact_engine_on_mesh():
    from insarseg.parallel import make_mesh

    model, variables = _init("unet", "channel")
    rng = np.random.default_rng(1)
    x = jnp.asarray(_smooth(rng, (8, 32, 32, 1)))
    art = pack_engine("unet", "channel", model, variables, "int8",
                      calib_batches=[np.asarray(x)])
    single = engine_from_artifact(art)(x)
    sharded = engine_from_artifact(art, mesh=make_mesh(data=8))(x)
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=0, atol=1e-5)


def test_pack_engine_rejects_module():
    model, variables = _init("unet", "none")
    with pytest.raises(ValueError, match="live Flax graph"):
        pack_engine("unet", "none", model, variables, "module")


def test_artifact_records_num_classes():
    """pack_engine records num_classes in meta for every family so serving
    can cross-check an artifact against the CLI config."""
    for name in ("unet", "fcn"):
        model, variables = _init(name, "none")
        art = pack_engine(name, "none", model, variables, "serve")
        assert art["meta"]["num_classes"] == 2, name


def test_load_artifact_rejects_corruption(tmp_path):
    """Truncated bytes or a gutted manifest must raise a clear 'corrupt
    engine artifact' error naming the file, not an opaque numpy reshape."""
    model, variables = _init("unet", "none")
    art = pack_engine("unet", "none", model, variables, "serve")
    path = save_artifact(str(tmp_path / "eng"), art)

    with np.load(path) as z:
        payload = {k: z[k] for k in z.files}
    payload["arr_0"] = payload["arr_0"][:-3]  # truncate one array
    with open(path, "wb") as f:
        np.savez(f, **payload)
    with pytest.raises(ValueError, match="corrupt engine artifact"):
        load_artifact(path)

    bad = str(tmp_path / "not_an_artifact.npz")
    with open(bad, "wb") as f:
        np.savez(f, junk=np.zeros(3))  # no manifest at all
    with pytest.raises(ValueError, match="corrupt engine artifact"):
        load_artifact(bad)
