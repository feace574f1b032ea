"""Fused conv3x3 + folded-BN + ReLU Pallas kernel (inference).

The DoubleConv stack ((Conv3x3 -> BN -> ReLU) x2, /root/reference/
Unet.py:40-54) dominates U-Net inference. This kernel runs one
conv3x3-same + per-channel scale/bias (+ optional ReLU) entirely in VMEM:

- formulation: 9 shifted MXU matmuls — for each (dy, dx) tap, a
  (rows*W, Cin) x (Cin, Cout) dot accumulated in f32. M = rows*W is large
  (thousands), so the MXU runs near-full tiles even at Cin=64.
- memory: the input lives in HBM (pre-padded by 1 pixel); each grid step
  DMAs its (block_h + 2)-row halo window into a VMEM scratch, computes, and
  writes one (block_h, W, Cout) output block. Halos overlap by two rows —
  BlockSpecs can't express that, hence the manual ``make_async_copy``.
- Mosaic tiling constraints: sliced extents must align to the (8, 128)
  sublane/lane tiles, so W+2 is padded to a multiple of 8 and Cin to a
  multiple of 128 (the HBM memref is lane-padded to 128 anyway, so the
  explicit zero-pad costs no extra traffic). The dx in {1, 2} taps use
  ``pltpu.roll`` (sublane rotate) instead of unaligned slices.
- epilogue: the folded BN affine (insarseg.ops.fold.fold_bn) and ReLU are
  applied to the f32 accumulator before the store — BN never touches HBM.

Shapes that can't satisfy the tile constraints (W not a multiple of 8) fall
back to the identical-math XLA path. Validated against that path in
interpret mode (tests/test_pallas.py); used by ``insarseg.models.unet_fast``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3x3_bn_relu_xla(x, w, scale, bias, relu=True):
    """Reference/fallback path: lax conv + affine epilogue (XLA fuses)."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y


def _pick_block_h(h: int, w: int, cin: int, vmem_budget: int = 8 * 2 ** 20) -> int:
    """Largest power-of-two row block whose halo window + accumulator fit the
    VMEM budget."""
    bh = 1
    for cand in (2, 4, 8, 16, 32, 64, 128):
        if h % cand != 0:
            continue
        window = (cand + 2) * (w + 8) * cin * 2  # bf16 input window
        acc = cand * w * max(cin, 128) * 4  # f32 accumulator upper bound
        if window + acc <= vmem_budget:
            bh = cand
    return bh


def conv3x3_bn_relu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    relu: bool = True,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused same-padding conv3x3 + per-channel affine (+ ReLU).

    Args:
      x: (B, H, W, Cin), any float dtype (computed as given; bf16 on TPU).
      w: (3, 3, Cin, Cout) HWIO kernel.
      scale, bias: (Cout,) folded-BN affine (see insarseg.ops.fold.fold_bn).
    Returns (B, H, W, Cout) in x.dtype.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, cin), w.shape

    if not interpret and wd % 8 != 0:
        return conv3x3_bn_relu_xla(x, w, scale, bias, relu)

    bh = block_h or _pick_block_h(h, wd, cin)
    assert h % bh == 0, (h, bh)

    # Mosaic tile constraints: W slices 8-aligned, channel lane 128-aligned.
    wp = math.ceil((wd + 2) / 8) * 8
    cp = math.ceil(cin / 128) * 128 if not interpret else cin
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, cp - cin)))
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))
    scale2 = jnp.asarray(scale, jnp.float32).reshape(1, cout)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(1, cout)

    kernel = functools.partial(_kernel, bh=bh, wd=wd, wp=wp, cin=cp,
                               cout=cout, relu=relu, interpret=interpret)
    return pl.pallas_call(
        kernel,
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, bh, wd, cout), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wpad.astype(x.dtype), scale2, bias2)


def _kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, win, sem, *,
            bh, wd, wp, cin, cout, relu, interpret):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    # halo window: padded rows [i*bh, i*bh + bh + 2)
    dma = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(i * bh, bh + 2), :, :], win, sem
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((bh * wd, cout), jnp.float32)
    window = win[:]
    for dx in range(3):
        for dy in range(3):
            # tap extents are tile-aligned (wd % 8 == 0, cin % 128 == 0);
            # the dx offset is a sublane shift Mosaic lowers in-register
            tap = jax.lax.slice(
                window, (dy, dx, 0), (dy + bh, dx + wd, cin)
            ).reshape(bh * wd, cin)
            acc = acc + jnp.dot(
                tap, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    y = acc * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(1, bh, wd, cout).astype(out_ref.dtype)
