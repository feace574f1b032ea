"""U-Net family: plain / channel-attention (SE) / spatial-attention.

One Flax module covers all three reference scripts:

- plain:       ``UNet()``                 (/root/reference/Unet.py:56-110)
- channel-att: ``UNet(use_se=True)``      (/root/reference/
               Unet-ChannalAttention.py:100-163) — SE appended to every
               DoubleConv; decoder adds a bilinear shape-fix resize before
               each skip-concat (only fires for non-power-of-two sizes).
- spatial-att: ``UNet(use_sa=True)``      (/root/reference/
               Unet-SpatialAttention.py:85-154) — SpatialAttentionDC applied
               after each skip-concat, before the decoder DoubleConv.

Topology (NHWC): encoder ``inc`` C_in->64 then 4x (MaxPool2 + DoubleConv)
to 1024 channels at H/16; decoder 4x (ConvTranspose k2 s2 + concat[skip, up]
+ DoubleConv); 1x1 head to ``num_classes``. Channel concat order is
[skip, upsampled], matching ``torch.cat([x4, x], dim=1)``
(/root/reference/Unet.py:93).

TPU notes: all shapes are static under jit; the concat+DoubleConv pairs fuse
into MXU convs; use ``dtype=jnp.bfloat16`` for the inference fast path
(params stay f32, BN statistics always f32).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from insarseg.ops.blocks import DoubleConv, SpatialAttentionDC
from insarseg.ops.layers import ConvTranspose2d, Conv2d, max_pool_2d
from insarseg.ops.resize import resize_bilinear

Dtype = Any


class UNet(nn.Module):
    """5-level U-Net over NHWC inputs ``(B, H, W, C_in)`` -> logits
    ``(B, H, W, num_classes)``. H and W must be divisible by 16 unless
    ``shape_fix`` is set (then odd decoder sizes are bilinear-fixed, as the
    reference CA variant does)."""

    num_classes: int = 2
    base_features: int = 64
    use_se: bool = False
    use_sa: bool = False
    shape_fix: Optional[bool] = None  # default: True iff use_se (parity)
    # optional per-level channel plan (5 ints, level 1..5); None keeps the
    # reference doubling (f, 2f, 4f, 8f, 16f). Used by the opt-in fast
    # variant to widen level 1 without scaling the deeper levels.
    features_plan: Optional[Any] = None
    dtype: Optional[Dtype] = None
    # rematerialize each DoubleConv in the backward pass (flax nn.remat /
    # jax.checkpoint). Numerically identical grads/BN updates
    # (tests/test_unet.py::test_remat_identical_training_step). MEASURED
    # NOT to extend the 512^2 batch envelope on v5e: XLA's automatic
    # rematerialization pass already runs on this program (the OOM dump
    # shows .remat fusions), so manual per-block remat leaves peak HBM at
    # ~22 GB for b32 (vs 21 GB auto) and costs 12% at b16 (43.5 vs 49.2
    # tiles/s). Kept for memory shapes XLA's pass misses; default off.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f = self.base_features
        plan = tuple(self.features_plan) if self.features_plan is not None \
            else (f, f * 2, f * 4, f * 8, f * 16)
        assert len(plan) == 5, plan
        shape_fix = self.use_se if self.shape_fix is None else self.shape_fix
        # static_argnums=(2,): (0=module, 1=x, 2=train) — train drives
        # Python-level branching (BN mode) and must stay out of the trace
        dc_cls = nn.remat(DoubleConv, static_argnums=(2,)) if self.remat \
            else DoubleConv
        dc = lambda feats, name: dc_cls(
            feats, use_se=self.use_se, dtype=self.dtype, name=name
        )

        # Encoder
        x1 = dc(plan[0], "inc")(x, train)
        x2 = dc(plan[1], "down1")(max_pool_2d(x1, 2), train)
        x3 = dc(plan[2], "down2")(max_pool_2d(x2, 2), train)
        x4 = dc(plan[3], "down3")(max_pool_2d(x3, 2), train)
        x5 = dc(plan[4], "down4")(max_pool_2d(x4, 2), train)

        # Decoder
        def up_block(y, skip, feats, idx):
            y = ConvTranspose2d(feats, 2, stride=2, dtype=self.dtype, name=f"up{idx}")(y)
            if shape_fix and y.shape[1:3] != skip.shape[1:3]:
                y = resize_bilinear(y, skip.shape[1:3])
            y = jnp.concatenate([skip, y], axis=-1)
            if self.use_sa:
                y = SpatialAttentionDC(dtype=self.dtype, name=f"sa{idx}")(y, train=train)
            return dc(feats, f"conv{idx}")(y, train)

        y = up_block(x5, x4, plan[3], 1)
        y = up_block(y, x3, plan[2], 2)
        y = up_block(y, x2, plan[1], 3)
        y = up_block(y, x1, plan[0], 4)

        logits = Conv2d(self.num_classes, 1, dtype=self.dtype, name="outc")(y)
        return logits
