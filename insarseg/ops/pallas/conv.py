"""Fused conv3x3 + folded-BN + ReLU Pallas kernel (inference).

The DoubleConv stack ((Conv3x3 -> BN -> ReLU) x2, /root/reference/
Unet.py:40-54) dominates U-Net inference. This kernel runs one
conv3x3-same + per-channel scale/bias (+ optional ReLU) entirely in VMEM:

- formulation: 9 shifted MXU matmuls — for each (dy, dx) tap, a
  (rows*W, Cin) x (Cin, Cout_tile) dot accumulated in f32. M = rows*W is
  large (thousands), so the MXU runs near-full tiles even at Cin=64.
- grid: (batch, H-blocks, Cout-tiles). The input lives in HBM (pre-padded
  by 1 pixel); the halo window for an (batch, H-block) pair is DMA'd into a
  VMEM scratch once (on the first Cout-tile — the scratch persists across
  the sequential grid) and reused for all Cout tiles. Halo windows overlap
  by two rows, which BlockSpecs can't express — hence the manual
  ``make_async_copy``. Weights/scale/bias/output are BlockSpec-tiled over
  Cout so the deep 1024->1024 levels fit VMEM.
- Mosaic tiling constraints: sliced extents must align to the (8, 128)
  sublane/lane tiles, so W+2 is padded to a multiple of 8 and Cin to a
  multiple of 128 (the HBM memref is lane-padded to 128 anyway, so the
  explicit zero-pad costs no extra traffic). The dx taps use in-register
  sublane-offset slices.
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


def _pick_blocks(h: int, w: int, cin: int, cout: int,
                 vmem_budget: int = 9 * 2 ** 20):
    """(block_h, cout_tile) fitting scoped VMEM: halo window + f32
    accumulator + double-buffered weight and output blocks."""
    ct = min(cout, 256)
    best = 1
    for cand in (2, 4, 8, 16, 32, 64, 128):
        if h % cand != 0:
            continue
        window = (cand + 2) * (w + 8) * max(cin, 128) * 2  # bf16 input window
        weights = 2 * 9 * max(cin, 128) * max(ct, 128) * 2  # dbl-buffered w
        acc = cand * w * max(ct, 128) * 4  # f32 accumulator
        out2 = 2 * cand * w * max(ct, 128) * 2  # dbl-buffered out block
        if window + weights + acc + out2 <= vmem_budget:
            best = cand
    return best, ct


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

    bh, ct = _pick_blocks(h, wd, cin, cout)
    if block_h is not None:
        bh = block_h
    if not interpret and (wd % 8 != 0 or cout % ct != 0):
        return conv3x3_bn_relu_xla(x, w, scale, bias, relu)
    if cout % ct != 0:
        ct = cout
    assert h % bh == 0, (h, bh)

    # Mosaic tile constraints: W slices 8-aligned, channel lane 128-aligned.
    wp = math.ceil((wd + 2) / 8) * 8
    cp = math.ceil(cin / 128) * 128 if not interpret else cin
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, cp - cin)))
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))
    scale2 = jnp.asarray(scale, jnp.float32).reshape(1, cout)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(1, cout)

    kernel = functools.partial(_kernel, bh=bh, wd=wd, wp=wp, cin=cp, ct=ct,
                               relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(b, h // bh, cout // ct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input, HBM
            pl.BlockSpec((3, 3, cp, ct), lambda bi, i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda bi, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda bi, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, wd, ct), lambda bi, i, j: (bi, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, wp, cp), x.dtype),  # double-buffered halo
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wpad.astype(x.dtype), scale2, bias2)


def _kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, win, sem, *,
            bh, wd, wp, cin, ct, relu):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_i = pl.num_programs(1)

    # The halo window depends only on (bi, i); j is the fastest grid axis and
    # the scratch persists across sequential grid steps. Double-buffered:
    # while computing row-block (bi, i) from its slot, the next block's
    # window streams into the other slot. Slot parity follows the *global*
    # row-block counter so it alternates correctly across batch boundaries.
    slot = jax.lax.rem(bi * n_i + i, 2)

    def start_dma(b_idx, i_idx, s):
        pltpu.make_async_copy(
            x_ref.at[b_idx, pl.ds(i_idx * bh, bh + 2), :, :],
            win.at[s], sem.at[s],
        ).start()

    @pl.when(j == 0)
    def _():
        @pl.when(jnp.logical_and(bi == 0, i == 0))
        def _():
            start_dma(bi, i, slot)

        pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(i * bh, bh + 2), :, :], win.at[slot],
            sem.at[slot],
        ).wait()

        # prefetch the next row block (possibly of the next batch element)
        is_last_i = i == n_i - 1
        next_bi = jnp.where(is_last_i, bi + 1, bi)
        next_i = jnp.where(is_last_i, 0, i + 1)

        @pl.when(next_bi < pl.num_programs(0))
        def _():
            start_dma(next_bi, next_i, 1 - slot)

    acc = jnp.zeros((bh * wd, ct), jnp.float32)
    window = win[slot]
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
    out_ref[:] = y.reshape(1, bh, wd, ct).astype(out_ref.dtype)
