"""Opt-in fast UNet variant: space-to-depth stem + widened level 1.

**Architecture-altering** — this is NOT the parity model. The reference's
U-Net-CA (/root/reference/Unet-ChannalAttention.py:100-163) spends its
level-1 compute on C=64 features at full resolution, which underfills the
TPU MXU's 128 lanes (BASELINE.md "Speed of light": level-1 convs are the
flagship bottleneck at every precision). This variant moves the same FLOP
budget into an MXU-shaped network:

- **stem**: lossless space-to-depth, ``(B, H, W, C) -> (B, H/2, W/2, 4C)``
  — no information is discarded, resolution becomes channels;
- **level 1 widened to 128** channels at H/2 (same FLOPs as the exact
  model's 64 @ H: 9*64*64*H*W == 9*128*128*(H/2)*(W/2)), deeper levels
  keep the reference channel plan (128, 256, 512, 1024);
- **head**: 1x1 conv to ``4*num_classes`` followed by depth-to-space, so
  logits come back at full input resolution with per-position weights.

The result consumes/produces exactly the standard shapes
``(B, H, W, C_in) -> (B, H, W, num_classes)`` and trains with the standard
engine (it is a regular Flax module; the registry exposes it as model
``unet-fast``). Accuracy must be re-established by training — published
mIoU numbers apply to the exact architecture only.

Measured head-to-head (benchmarks/fast_vs_ca_synthetic.py, identical
protocol/seeds, 512^2 synthetic interferograms, 256 train tiles, one
v5e chip): default task (20 ep) unet-ca 0.99710 vs unet-fast-ca 0.99623
(−0.09 pt); harder task (--hard, 30 ep) 0.99239 vs 0.98540 (−0.70 pt).
Both inside the ≤1 pt acceptance bar; int8 engine mIoU drop ≤3e-5 on
all runs (README.md "fast-variant accuracy").
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from insarseg.models.unet import UNet

Dtype = Any


def space_to_depth(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C); channel order (dr, dc, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """(B, H, W, f*f*C) -> (B, f*H, f*W, C); inverse of space_to_depth."""
    b, h, w, fc = x.shape
    c = fc // (f * f)
    x = x.reshape(b, h, w, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, f * h, f * w, c)


class UNetFastS2D(nn.Module):
    """Space-to-depth-stem UNet (``model='unet-fast'`` in the registry).

    ``(B, H, W, C_in) -> (B, H, W, num_classes)``; H, W divisible by
    ``2 * 16``. All three attention modes of the inner UNet are available.
    """

    num_classes: int = 2
    level1_features: int = 128
    use_se: bool = False
    use_sa: bool = False
    factor: int = 2
    dtype: Optional[Dtype] = None
    remat: bool = False  # per-DoubleConv rematerialization (see UNet.remat)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f = self.factor
        l1 = self.level1_features
        inner = UNet(
            num_classes=self.num_classes * f * f,
            features_plan=(l1, l1, l1 * 2, l1 * 4, l1 * 8),
            use_se=self.use_se,
            use_sa=self.use_sa,
            shape_fix=False,
            dtype=self.dtype,
            remat=self.remat,
            name="unet",
        )
        y = inner(space_to_depth(x, f), train=train)
        return depth_to_space(y, f)


def _inner_variables(variables):
    return {"params": variables["params"]["unet"],
            "batch_stats": variables["batch_stats"]["unet"]}


def make_fast_serve_predict_fn(model: UNetFastS2D, variables,
                               argmax: bool = False, input_dtype=None,
                               mesh=None):
    """Exact serving of the fast variant: deferred-SE graph
    (insarseg/models/unet_serve.py) on the inner UNet, s2d/d2s at the rim.
    ``input_dtype`` casts the incoming images (e.g. bf16) like the other
    serve factories — the graph follows the input dtype. ``mesh`` shards
    the batch over the mesh's ``data`` axis."""
    from insarseg.engines import check_hw, jit_engine, mesh_replicate_packed
    from insarseg.models.unet_serve import pack_unet_serve, unet_serve_apply

    f, nc = model.factor, model.num_classes
    packed = mesh_replicate_packed(
        pack_unet_serve(_inner_variables(variables)), mesh)

    def predict(images):
        check_hw(images.shape, 16 * f, 16 * f, "serve", "unet-fast")
        if input_dtype is not None:
            images = images.astype(input_dtype)
        y = unet_serve_apply(packed, space_to_depth(images, f))
        if argmax:
            b, h, w, _ = y.shape
            cls = jnp.argmax(y.reshape(b, h, w, f * f, nc), -1)
            return depth_to_space(cls.astype(jnp.int32), f)[..., 0]
        return depth_to_space(y, f)

    return jit_engine(predict, mesh)


def make_fast_int8_predict_fn(model: UNetFastS2D, variables, calib_batches,
                              argmax: bool = False, mesh=None,
                              calib_stat: str = "absmax"):
    """int8 PTQ serving of the fast variant: standard-layout (no-s2d)
    quantized graph (insarseg/models/unet_int8.py) on the inner UNet."""
    import numpy as np

    from insarseg.engines import check_hw, jit_engine, mesh_replicate_packed
    from insarseg.models.unet_int8 import pack_unet_int8, unet_int8_apply

    f, nc = model.factor, model.num_classes
    calib = [np.asarray(space_to_depth(jnp.asarray(b, jnp.float32), f))
             for b in calib_batches]
    packed = mesh_replicate_packed(
        pack_unet_int8(_inner_variables(variables), calib, s2d=False,
                       calib_stat=calib_stat), mesh)

    def predict(images):
        check_hw(images.shape, 16 * f, 16 * f, "int8", "unet-fast")
        y = unet_int8_apply(packed, space_to_depth(images, f))
        if argmax:
            b, h, w, _ = y.shape
            cls = jnp.argmax(y.reshape(b, h, w, f * f, nc), -1)
            return depth_to_space(cls.astype(jnp.int32), f)[..., 0]
        return depth_to_space(y, f)

    return jit_engine(predict, mesh)
