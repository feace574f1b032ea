"""PyTorch state_dict <-> insarseg variables converters.

Lets a reference user bring their trained ``.pth`` checkpoints
(``torch.save(model.state_dict(), ...)`` at /root/reference/Unet.py:308,
PSPNet.py:31) into the TPU framework, and powers golden-parity testing.

Layout mapping (NCHW/OIHW torch -> NHWC/HWIO jax):
- Conv2d.weight (O, I, kh, kw)        -> kernel (kh, kw, I, O)
- ConvTranspose2d.weight (I, O, kh, kw) -> kernel (kh, kw, I, O)
- Linear.weight (O, I)                -> kernel (I, O)
- BatchNorm weight/bias -> params scale/bias; running_mean/var ->
  batch_stats mean/var.

Name mapping covers:
- the hand-rolled UNet family (``inc.double_conv.0`` indexing of
  /root/reference/Unet.py:40-81, SE tail at index 6 of
  Unet-ChannalAttention.py:90-92, ``sa1..sa4`` of
  Unet-SpatialAttention.py:110-113),
- torchvision segmentation naming (``backbone.layer1.0.conv1`` /
  ``classifier.0.convs...``) for the DeepLabV3/FCN families, including the
  reference wrappers' extra modules (``attention_module``,
  ``spatial_attention``, per-bottleneck ``se_block``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` state_dict into numpy (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


class _Builder:
    """torch state_dict -> jax variables (import direction)."""

    def __init__(self, state_dict: Mapping[str, Any], prefix: str = ""):
        self.sd = {k: _np(v) for k, v in state_dict.items()}
        self.prefix = prefix
        self.params: Dict = {}
        self.stats: Dict = {}

    def conv(self, tkey: str, *jpath: str, transpose: bool = False) -> None:
        w = self.sd[self.prefix + tkey + ".weight"]
        if transpose:  # ConvTranspose2d: (I, O, kh, kw) -> (kh, kw, I, O)
            _set(self.params, jpath + ("kernel",), w.transpose(2, 3, 0, 1))
        else:  # Conv2d: (O, I, kh, kw) -> (kh, kw, I, O)
            _set(self.params, jpath + ("kernel",), w.transpose(2, 3, 1, 0))
        b = self.sd.get(self.prefix + tkey + ".bias")
        if b is not None:
            _set(self.params, jpath + ("bias",), b)

    def linear(self, tkey: str, *jpath: str) -> None:
        w = self.sd[self.prefix + tkey + ".weight"]
        _set(self.params, jpath + ("kernel",), w.T)
        b = self.sd.get(self.prefix + tkey + ".bias")
        if b is not None:
            _set(self.params, jpath + ("bias",), b)

    def bn(self, tkey: str, *jpath: str) -> None:
        p = self.prefix + tkey
        _set(self.params, jpath + ("scale",), self.sd[p + ".weight"])
        _set(self.params, jpath + ("bias",), self.sd[p + ".bias"])
        _set(self.stats, jpath + ("mean",), self.sd[p + ".running_mean"])
        _set(self.stats, jpath + ("var",), self.sd[p + ".running_var"])

    def has(self, tkey: str, *jpath: str) -> bool:
        return self.prefix + tkey + ".weight" in self.sd

    def graft_stem_if_rgb(self, *jpath: str) -> None:
        """Pretrained torchvision checkpoints have an RGB stem; graft to
        grayscale via mean-over-RGB (the reference's adaptation,
        SURVEY.md §2.2.9). Import-only: exported kernels are already 1-ch."""
        node = self.params
        for k in jpath:
            node = node[k]
        if node["kernel"].shape[2] == 3:
            node["kernel"] = graft_grayscale_stem(node["kernel"])

    def variables(self) -> Dict[str, Dict]:
        return {"params": self.params, "batch_stats": self.stats}


class _Exporter:
    """jax variables -> torch state_dict (export direction). Mirror of
    :class:`_Builder` so one mapping function serves both directions."""

    def __init__(self, variables: Mapping[str, Any], prefix: str = ""):
        self.params = variables["params"]
        self.stats = variables.get("batch_stats", {})
        self.prefix = prefix
        self.out: Dict[str, np.ndarray] = {}

    @staticmethod
    def _get(tree, path: Tuple[str, ...]):
        node = tree
        for k in path:
            node = node[k]
        return node

    def conv(self, tkey: str, *jpath: str, transpose: bool = False) -> None:
        p = self._get(self.params, jpath)
        k = _np(p["kernel"])
        self.out[self.prefix + tkey + ".weight"] = (
            k.transpose(2, 3, 0, 1) if transpose else k.transpose(3, 2, 0, 1)
        )
        if "bias" in p:
            self.out[self.prefix + tkey + ".bias"] = _np(p["bias"])

    def linear(self, tkey: str, *jpath: str) -> None:
        p = self._get(self.params, jpath)
        self.out[self.prefix + tkey + ".weight"] = _np(p["kernel"]).T
        if "bias" in p:
            self.out[self.prefix + tkey + ".bias"] = _np(p["bias"])

    def bn(self, tkey: str, *jpath: str) -> None:
        p = self._get(self.params, jpath)
        s = self._get(self.stats, jpath)
        t = self.prefix + tkey
        self.out[t + ".weight"] = _np(p["scale"])
        self.out[t + ".bias"] = _np(p["bias"])
        self.out[t + ".running_mean"] = _np(s["mean"])
        self.out[t + ".running_var"] = _np(s["var"])
        self.out[t + ".num_batches_tracked"] = np.asarray(0)

    def has(self, tkey: str, *jpath: str) -> bool:
        try:
            self._get(self.params, jpath)
            return True
        except KeyError:
            return False

    def graft_stem_if_rgb(self, *jpath: str) -> None:
        pass  # export side: the jax stem is already single-channel


# --------------------------------------------------------------------------
# UNet family
# --------------------------------------------------------------------------

def _double_conv(b: _Builder, tmod: str, *jpath: str, use_se: bool) -> None:
    b.conv(f"{tmod}.double_conv.0", *jpath, "conv1")
    b.bn(f"{tmod}.double_conv.1", *jpath, "bn1")
    b.conv(f"{tmod}.double_conv.3", *jpath, "conv2")
    b.bn(f"{tmod}.double_conv.4", *jpath, "bn2")
    if use_se:
        b.linear(f"{tmod}.double_conv.6.fc.0", *jpath, "se", "fc1")
        b.linear(f"{tmod}.double_conv.6.fc.2", *jpath, "se", "fc2")


def unet_variables_from_torch(
    state_dict: Mapping[str, Any], use_se: bool = False, use_sa: bool = False
) -> Dict[str, Dict]:
    """Reference UNet state_dict -> insarseg ``{'params', 'batch_stats'}``."""
    b = _Builder(state_dict)
    _double_conv(b, "inc", "inc", use_se=use_se)
    for i in range(1, 5):
        # down_i is Sequential(MaxPool2d, DoubleConv) -> index 1
        _double_conv(b, f"down{i}.1", f"down{i}", use_se=use_se)
        b.conv(f"up{i}", f"up{i}", transpose=True)
        _double_conv(b, f"conv{i}", f"conv{i}", use_se=use_se)
        if use_sa:
            _double_conv(
                b, f"sa{i}.compress_and_map", f"sa{i}", "compress_and_map",
                use_se=False,
            )
    b.conv("outc", "outc")
    return b.variables()


def unet_variables_to_torch(
    variables: Mapping[str, Any], use_se: bool = False, use_sa: bool = False
) -> Dict[str, np.ndarray]:
    """Inverse converter (insarseg -> reference torch naming), for exporting
    checkpoints back to PyTorch users and for round-trip tests."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}

    def put_conv(jp, js, tmod, transpose=False):
        k = _np(jp["kernel"])
        out[f"{tmod}.weight"] = (
            k.transpose(2, 3, 0, 1) if transpose else k.transpose(3, 2, 0, 1)
        )
        if "bias" in jp:
            out[f"{tmod}.bias"] = _np(jp["bias"])

    def put_bn(jp, js, tmod):
        out[f"{tmod}.weight"] = _np(jp["scale"])
        out[f"{tmod}.bias"] = _np(jp["bias"])
        out[f"{tmod}.running_mean"] = _np(js["mean"])
        out[f"{tmod}.running_var"] = _np(js["var"])
        out[f"{tmod}.num_batches_tracked"] = np.asarray(0)

    def put_dc(jp, js, tmod, se):
        put_conv(jp["conv1"], None, f"{tmod}.double_conv.0")
        put_bn(jp["bn1"], js["bn1"], f"{tmod}.double_conv.1")
        put_conv(jp["conv2"], None, f"{tmod}.double_conv.3")
        put_bn(jp["bn2"], js["bn2"], f"{tmod}.double_conv.4")
        if se:
            out[f"{tmod}.double_conv.6.fc.0.weight"] = _np(jp["se"]["fc1"]["kernel"]).T
            out[f"{tmod}.double_conv.6.fc.2.weight"] = _np(jp["se"]["fc2"]["kernel"]).T

    put_dc(params["inc"], stats["inc"], "inc", use_se)
    for i in range(1, 5):
        put_dc(params[f"down{i}"], stats[f"down{i}"], f"down{i}.1", use_se)
        put_conv(params[f"up{i}"], None, f"up{i}", transpose=True)
        put_dc(params[f"conv{i}"], stats[f"conv{i}"], f"conv{i}", use_se)
        if use_sa:
            put_dc(
                params[f"sa{i}"]["compress_and_map"],
                stats[f"sa{i}"]["compress_and_map"],
                f"sa{i}.compress_and_map", False,
            )
    put_conv(params["outc"], None, "outc")
    return out


def graft_grayscale_stem(kernel: np.ndarray) -> np.ndarray:
    """Adapt an RGB stem conv kernel to single-channel input by averaging the
    input-channel axis — the reference's pretrained-weight adaptation
    (``original_conv1.weight.mean(dim=1, keepdim=True)`` at
    /root/reference/DeepLabV3.py:86, PSPNet.py:83, etc.).

    Accepts either layout: HWIO (kh, kw, 3, cout) -> (kh, kw, 1, cout), or
    torch OIHW (cout, 3, kh, kw) -> (cout, 1, kh, kw).
    """
    k = np.asarray(kernel)
    if k.ndim != 4:
        raise ValueError(f"expected a 4D conv kernel, got shape {k.shape}")
    if k.shape[2] == 3:  # HWIO
        return k.mean(axis=2, keepdims=True)
    if k.shape[1] == 3:  # OIHW
        return k.mean(axis=1, keepdims=True)
    raise ValueError(f"no 3-channel input axis found in kernel shape {k.shape}")


# --------------------------------------------------------------------------
# torchvision-segmentation family (DeepLabV3 / FCN, incl. reference wrappers)
# --------------------------------------------------------------------------

def _resnet_backbone(m, use_se: bool, layers=(3, 4, 6, 3)) -> None:
    """Direction-agnostic resnet mapping: ``m`` is a _Builder or _Exporter."""
    m.conv("backbone.conv1", "backbone", "conv1")
    m.graft_stem_if_rgb("backbone", "conv1")
    m.bn("backbone.bn1", "backbone", "bn1")
    for li, blocks in enumerate(layers, start=1):
        for bi in range(blocks):
            t = f"backbone.layer{li}.{bi}"
            j = ("backbone", f"layer{li}_{bi}")
            for ci in (1, 2, 3):
                m.conv(f"{t}.conv{ci}", *j, f"conv{ci}")
                m.bn(f"{t}.bn{ci}", *j, f"bn{ci}")
            if m.has(f"{t}.downsample.0", *j, "downsample_conv"):
                m.conv(f"{t}.downsample.0", *j, "downsample_conv")
                m.bn(f"{t}.downsample.1", *j, "downsample_bn")
            if use_se:
                m.conv(f"{t}.se_block.fc.0", *j, "se_block", "fc1")
                m.conv(f"{t}.se_block.fc.2", *j, "se_block", "fc2")


def _map_segmentation(m, model: str, attention: str, backbone: str) -> None:
    """The full torchvision-naming <-> insarseg-tree mapping for the
    DeepLabV3/FCN families, shared by import and export. Naming follows the
    reference wrappers (``attention_module`` at
    /root/reference/DeepLabV3-ChannelAttention.py:138, ``spatial_attention``
    at PSPNet-SpatialAttention.py:124, per-bottleneck ``se_block`` at
    PSPNet-ChannelAttention.py:117)."""
    from insarseg.models.resnet import backbone_layers

    _resnet_backbone(m, use_se=(model == "fcn" and attention == "channel"),
                     layers=backbone_layers(backbone))

    if model == "deeplabv3":
        # classifier.0 = ASPP
        for i in range(4):  # convs.0..3: 1x1 + three atrous branches
            m.conv(f"classifier.0.convs.{i}.0", "aspp", f"conv{i}")
            m.bn(f"classifier.0.convs.{i}.1", "aspp", f"bn{i}")
        m.conv("classifier.0.convs.4.1", "aspp", "pool_conv")
        m.bn("classifier.0.convs.4.2", "aspp", "pool_bn")
        m.conv("classifier.0.project.0", "aspp", "project_conv")
        m.bn("classifier.0.project.1", "aspp", "project_bn")
        m.conv("classifier.1", "head_conv")
        if attention != "spatial":
            m.bn("classifier.2", "head_bn")
        m.conv("classifier.4", "classifier")
        if attention == "channel":
            m.conv("attention_module.mlp.0", "attention", "mlp_fc1")
            m.conv("attention_module.mlp.2", "attention", "mlp_fc2")
        elif attention == "spatial":
            m.conv("attention_module.conv", "attention", "conv")
    elif model == "fcn":
        m.conv("classifier.0", "classifier", "conv1")
        m.bn("classifier.1", "classifier", "bn1")
        m.conv("classifier.4", "classifier", "conv2")
        if attention == "spatial":
            m.conv("spatial_attention.conv", "spatial_attention", "conv")
    else:
        raise KeyError(f"unknown model {model!r}")


def segmentation_variables_from_torch(
    state_dict: Mapping[str, Any],
    model: str,
    attention: str = "none",
    prefix: str = "",
    backbone: str = "resnet50",
) -> Dict[str, Dict]:
    """torchvision-style DeepLabV3/FCN state_dict -> insarseg variables.

    ``prefix`` strips a wrapper prefix (the reference wrappers nest the
    torchvision model under ``model.``). ``model`` in {'deeplabv3', 'fcn'}.
    """
    b = _Builder(state_dict, prefix)
    _map_segmentation(b, model, attention, backbone)
    return b.variables()


def segmentation_variables_to_torch(
    variables: Mapping[str, Any],
    model: str,
    attention: str = "none",
    prefix: str = "",
    backbone: str = "resnet50",
) -> Dict[str, np.ndarray]:
    """Inverse converter: insarseg DeepLabV3/FCN variables -> a torchvision-
    naming state_dict the reference wrappers can ``load_state_dict``
    (the reference's users save ``fcn_*.pth`` / deeplab ``.pth`` checkpoints,
    /root/reference/PSPNet.py:31, DeepLabV3.py:30)."""
    e = _Exporter(variables, prefix)
    _map_segmentation(e, model, attention, backbone)
    return e.out
