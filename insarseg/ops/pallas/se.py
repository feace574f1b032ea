"""Fused squeeze-excite rescale Pallas kernel (inference).

SE (GAP -> MLP -> sigmoid -> channel rescale, /root/reference/
Unet-ChannalAttention.py:45-72) costs three extra HBM passes when left to
XLA at large spatial sizes (read for the pool, read+write for the rescale).
This kernel does the pooled-MLP gate in SMEM-scale math and fuses the
rescale with the final read/write:

- pass 1 (grid over (B, H-blocks)): accumulate per-channel partial sums into
  a VMEM accumulator (revisited output block per batch).
- pass 2: tiny MLP matmuls on the (1, C) pooled vector -> gate.
- pass 3 (grid over (B, H-blocks)): x * gate, streamed.

For simplicity and robustness the three phases are three pallas_calls; the
expensive phases (1, 3) are each single-pass streams, the gate math is
negligible. Validated against ``insarseg.ops.blocks.SELayer`` in interpret
mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sum_kernel(x_ref, out_ref):
    # out_ref holds the whole (B, C) sums array (it's tiny); the sequential
    # grid revisits it, accumulating row ``bi`` across the H blocks.
    bi = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    s = jnp.sum(x_ref[:].astype(jnp.float32), axis=(0, 1, 2)).reshape(1, -1)
    out_ref[pl.ds(bi, 1), :] = out_ref[pl.ds(bi, 1), :] + s


def _scale_kernel(x_ref, gate_ref, out_ref):
    bi = pl.program_id(0)
    gate = gate_ref[pl.ds(bi, 1), :]  # (1, C) row of the full gate array
    out_ref[:] = (
        x_ref[:].astype(jnp.float32) * gate.reshape(1, 1, 1, -1)
    ).astype(out_ref.dtype)


def se_scale(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """SELayer forward: ``x * sigmoid(relu(mean(x) @ w1) @ w2)``.

    Args:
      x: (B, H, W, C). w1: (C, C/r). w2: (C/r, C) — the Linear-flavor SE
      weights (bias-free, as in the reference).
    """
    b, h, wd, c = x.shape
    # keep blocks small: pallas double-buffers in+out blocks and the kernel
    # materializes an f32 copy, so ~8x the block size must fit scoped VMEM
    bh = block_h or max(1, min(h, (2 ** 19) // max(1, wd * c * 2)))
    while h % bh:
        bh -= 1

    sums = pl.pallas_call(
        _sum_kernel,
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, wd, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, c), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        interpret=interpret,
    )(x)

    pooled = sums / (h * wd)
    gate = jax.nn.sigmoid(
        jnp.maximum(pooled @ w1.astype(jnp.float32), 0.0)
        @ w2.astype(jnp.float32)
    )

    return pl.pallas_call(
        _scale_kernel,
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, wd, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wd, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, gate)
