"""torch_io converters: round-trips and reference-naming contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insarseg.compat import (
    segmentation_variables_from_torch,
    segmentation_variables_to_torch,
    unet_variables_from_torch,
    unet_variables_to_torch,
)
from insarseg.models import DeepLabV3, FCN, UNet


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=path + "/" + str(k)
            )


@pytest.mark.parametrize("use_se,use_sa", [(False, False), (True, False), (False, True)])
def test_unet_roundtrip(use_se, use_sa):
    model = UNet(base_features=16, use_se=use_se, use_sa=use_sa)
    v = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    sd = unet_variables_to_torch(v, use_se=use_se, use_sa=use_sa)
    # reference naming spot-checks (/root/reference/Unet.py:61-81)
    assert "inc.double_conv.0.weight" in sd
    assert "down1.1.double_conv.1.running_mean" in sd
    assert "up1.weight" in sd and sd["up1.weight"].shape == (256, 128, 2, 2)
    if use_se:
        assert "inc.double_conv.6.fc.0.weight" in sd
    if use_sa:
        assert "sa1.compress_and_map.double_conv.0.weight" in sd
    back = unet_variables_from_torch(sd, use_se=use_se, use_sa=use_sa)
    _tree_equal(
        {"params": v["params"], "batch_stats": v["batch_stats"]}, back
    )


def _fake_torchvision_sd(variables, model, attention):
    """Inverse of segmentation_variables_from_torch, written independently in
    torchvision naming, to exercise the forward mapping."""
    p, s = variables["params"], variables["batch_stats"]
    sd = {}

    def conv(jp, name):
        sd[name + ".weight"] = np.asarray(jp["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in jp:
            sd[name + ".bias"] = np.asarray(jp["bias"])

    def bn(jp, js, name):
        sd[name + ".weight"] = np.asarray(jp["scale"])
        sd[name + ".bias"] = np.asarray(jp["bias"])
        sd[name + ".running_mean"] = np.asarray(js["mean"])
        sd[name + ".running_var"] = np.asarray(js["var"])

    bp, bs = p["backbone"], s["backbone"]
    conv(bp["conv1"], "backbone.conv1")
    bn(bp["bn1"], bs["bn1"], "backbone.bn1")
    for li, blocks in enumerate((3, 4, 6, 3), start=1):
        for bi in range(blocks):
            j, js = bp[f"layer{li}_{bi}"], bs[f"layer{li}_{bi}"]
            t = f"backbone.layer{li}.{bi}"
            for ci in (1, 2, 3):
                conv(j[f"conv{ci}"], f"{t}.conv{ci}")
                bn(j[f"bn{ci}"], js[f"bn{ci}"], f"{t}.bn{ci}")
            if "downsample_conv" in j:
                conv(j["downsample_conv"], f"{t}.downsample.0")
                bn(j["downsample_bn"], js["downsample_bn"], f"{t}.downsample.1")
            if "se_block" in j:
                conv(j["se_block"]["fc1"], f"{t}.se_block.fc.0")
                conv(j["se_block"]["fc2"], f"{t}.se_block.fc.2")

    if model == "deeplabv3":
        ap, as_ = p["aspp"], s["aspp"]
        for i in range(4):
            conv(ap[f"conv{i}"], f"classifier.0.convs.{i}.0")
            bn(ap[f"bn{i}"], as_[f"bn{i}"], f"classifier.0.convs.{i}.1")
        conv(ap["pool_conv"], "classifier.0.convs.4.1")
        bn(ap["pool_bn"], as_["pool_bn"], "classifier.0.convs.4.2")
        conv(ap["project_conv"], "classifier.0.project.0")
        bn(ap["project_bn"], as_["project_bn"], "classifier.0.project.1")
        conv(p["head_conv"], "classifier.1")
        if attention != "spatial":
            bn(p["head_bn"], s["head_bn"], "classifier.2")
        conv(p["classifier"], "classifier.4")
        if attention == "channel":
            conv(p["attention"]["mlp_fc1"], "attention_module.mlp.0")
            conv(p["attention"]["mlp_fc2"], "attention_module.mlp.2")
        elif attention == "spatial":
            conv(p["attention"]["conv"], "attention_module.conv")
    else:
        conv(p["classifier"]["conv1"], "classifier.0")
        bn(p["classifier"]["bn1"], s["classifier"]["bn1"], "classifier.1")
        conv(p["classifier"]["conv2"], "classifier.4")
        if attention == "spatial":
            conv(p["spatial_attention"]["conv"], "spatial_attention.conv")
    return sd


@pytest.mark.parametrize(
    "model,attention",
    [("deeplabv3", "none"), ("deeplabv3", "channel"), ("deeplabv3", "spatial"),
     ("fcn", "none"), ("fcn", "channel"), ("fcn", "spatial")],
)
def test_segmentation_from_torchvision_naming(model, attention):
    cls = DeepLabV3 if model == "deeplabv3" else FCN
    m = cls(num_classes=2, attention=attention)
    v = m.init(jax.random.key(3), jnp.zeros((1, 16, 16, 1)))
    sd = _fake_torchvision_sd(v, model, attention)
    back = segmentation_variables_from_torch(sd, model, attention)
    _tree_equal({"params": v["params"], "batch_stats": v["batch_stats"]}, back)


@pytest.mark.parametrize(
    "model,attention",
    [("deeplabv3", "none"), ("deeplabv3", "channel"), ("deeplabv3", "spatial"),
     ("fcn", "none"), ("fcn", "channel"), ("fcn", "spatial")],
)
def test_segmentation_export_matches_independent_inverse(model, attention):
    """The exporter must produce the torchvision-naming state_dict that the
    independently-written `_fake_torchvision_sd` produces, and round-trip."""
    cls = DeepLabV3 if model == "deeplabv3" else FCN
    m = cls(num_classes=2, attention=attention)
    v = m.init(jax.random.key(5), jnp.zeros((1, 16, 16, 1)))
    sd = segmentation_variables_to_torch(v, model, attention)
    golden = _fake_torchvision_sd(v, model, attention)
    # exporter adds torch's num_batches_tracked bookkeeping keys
    extras = {k for k in sd if k.endswith("num_batches_tracked")}
    assert set(sd) - extras == set(golden)
    for k in golden:
        np.testing.assert_array_equal(sd[k], golden[k], err_msg=k)
    back = segmentation_variables_from_torch(sd, model, attention)
    _tree_equal({"params": v["params"], "batch_stats": v["batch_stats"]}, back)
