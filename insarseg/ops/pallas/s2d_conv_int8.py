"""Block-sparse int8 Pallas kernel for the H-space-to-depth 3x3 convs.

The s2d transform (insarseg/models/unet_s2d.py) turns a level-1 conv3x3
C->C into a conv3x3 2C->2C over (H/2, W) whose kernel is half structural
zeros (K2[alpha, v, a*C+c, d*C+o] = W[u+1, v, c, o] with u = 2*alpha+a-d,
zero when |u| > 1) — XLA's conv emitter cannot skip them, so the int8
engine pays 2x the minimal MACs at level 1 (BASELINE.md "int8 s2d path":
~27 ms of the 103.7 ms step).

This kernel evaluates the same conv as six 128-contraction matmuls per
output row — 12C^2 MACs per original pixel instead of the dense 18C^2
(1.33x of the 9C^2 minimum; the remaining 3C^2 are the two (64,64)-zero
corners of the packed W_tb blocks, which ride inside full-lane matmuls):

- out[rh] needs original rows 2rh-1..2rh+2 = s2d rows rh-1 (parity-1
  half), rh (both), rh+1 (parity-0 half);
- the row-rh contribution is dense: 3 w-taps of x2[rh] @ W_mid[v]
  (128x128 each);
- the rh-1/rh+1 halves pack into one z = [x2[rh-1][:, C:], x2[rh+1][:, :C]]
  lane-concat and 3 w-taps of z @ W_tb[v], where W_tb[v] is the block
  matrix [[K2[0,v,C:,:C], 0], [0, K2[2,v,:C,C:]]];
- the w-shifts are applied to the int32 tap products (zero-pad concat on
  the sublane axis — the conv's same-padding), then the dequant/affine/
  ReLU/requant epilogue runs in-kernel and the block writes s8 (or bf16)
  straight back to HBM.

Grid: (B, RH/RHB); each cell streams an (RHB, W, 128) row-block plus two
single-row halo blocks (separate BlockSpecs of the same operand), so the
input is read ~(RHB+2)/RHB times instead of the 3x a row-per-cell grid
would pay. Multi-source form (``xs`` a list) evaluates a conv over a
channel-concat without materializing the concat (the decoder's skip||up
cat). VMEM at W=512, RHB=8: ~1.4 MB double-buffered.

No reference equivalent (serving-path optimization); consumed by
insarseg/models/unet_int8.py when ``l1_kernel='pallas'``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_sparse_weights(q: np.ndarray,
                        sources: Sequence[Tuple[int, int]]) -> Tuple:
    """Split an s2d-quantized (3, 3, Cin, 2C) int8 kernel into per-source
    (W_mid, W_tb) stacks for the kernel.

    ``sources``: [(lo, hi)] channel ranges of the s2d inputs (each an
    identity-parity-layout group of 2C = hi-lo = 128 channels). Asserts
    the structural zeros really are zero (guards against being handed a
    non-s2d kernel).
    """
    q = np.asarray(q)
    assert q.shape[0] == 3 and q.dtype == np.int8, (q.shape, q.dtype)
    cout2 = q.shape[-1]
    c = cout2 // 2
    wmid, wtb = [], []
    for lo, hi in sources:
        assert hi - lo == 2 * c, "each source must be a 2C channel group"
        assert not q[0, :, lo : lo + c, :].any(), "alpha=-1 parity-0 not zero"
        assert not q[2, :, lo + c : hi, :].any(), "alpha=+1 parity-1 not zero"
        assert not q[0, :, lo + c : hi, c:].any(), "alpha=-1 d=1 not zero"
        assert not q[2, :, lo : lo + c, :c].any(), "alpha=+1 d=0 not zero"
        wmid.append(q[1, :, lo:hi, :])  # (3, 2C, 2C)
        tb = np.zeros((3, 2 * c, 2 * c), np.int8)
        tb[:, :c, :c] = q[0, :, lo + c : hi, :c]
        tb[:, c:, c:] = q[2, :, lo : lo + c, c:]
        wtb.append(tb)
    return (jnp.asarray(np.stack(wmid)), jnp.asarray(np.stack(wtb)))


def _shift_w(m: jnp.ndarray, v: int) -> jnp.ndarray:
    """Place tap product m_v at out[w] = m_v[w + v - 1] with zero padding
    (the conv's same-padding along W). m: (W, C) int32."""
    w = m.shape[0]
    zero = jnp.zeros((1, m.shape[1]), m.dtype)
    if v == 0:  # out[w] = m[w-1]
        return jnp.concatenate([zero, m[: w - 1]], axis=0)
    if v == 2:  # out[w] = m[w+1]
        return jnp.concatenate([m[1:], zero], axis=0)
    return m


def _make_kernel(n_src: int, rhb: int, relu: bool, out_scale: Optional[float]):
    def kernel(*refs):
        fulls = refs[:n_src]
        tops = refs[n_src : 2 * n_src]
        bots = refs[2 * n_src : 3 * n_src]
        wmid_ref, wtb_ref, mult_ref, off_ref, out_ref = refs[3 * n_src :]

        nblocks = pl.num_programs(1)
        first = pl.program_id(1) == 0
        last = pl.program_id(1) == nblocks - 1
        c = out_ref.shape[-1] // 2

        for r in range(rhb):
            acc = None
            for s in range(n_src):
                xm = fulls[s][0, r]  # (W, 2C) s8
                if r == 0:
                    xt = tops[s][0, 0]
                    xt = jnp.where(first, jnp.zeros_like(xt), xt)
                else:
                    xt = fulls[s][0, r - 1]
                if r == rhb - 1:
                    xb = bots[s][0, 0]
                    xb = jnp.where(last, jnp.zeros_like(xb), xb)
                else:
                    xb = fulls[s][0, r + 1]
                z = jnp.concatenate([xt[:, c:], xb[:, :c]], axis=1)
                for v in range(3):
                    pm = lax.dot_general(
                        xm, wmid_ref[s, v], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    pz = lax.dot_general(
                        z, wtb_ref[s, v], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    t = _shift_w(pm + pz, v)
                    acc = t if acc is None else acc + t
            y = acc.astype(jnp.float32) * mult_ref[0] + off_ref[0]
            if relu:
                y = jnp.maximum(y, 0.0)
            if out_scale is None:
                out_ref[0, r] = y.astype(out_ref.dtype)
            else:
                q = jnp.clip(jnp.rint(y * (1.0 / out_scale)), -127, 127)
                out_ref[0, r] = q.astype(jnp.int8)

    return kernel


def s2d_conv3x3_i8(
    xs: List[jnp.ndarray],
    wmid: jnp.ndarray,
    wtb: jnp.ndarray,
    mult: jnp.ndarray,
    off: jnp.ndarray,
    out_scale: Optional[float],
    relu: bool = True,
    rhb: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Block-sparse s2d int8 conv3x3.

    xs: list of (B, RH, W, 2C) int8 sources (a conv over their channel
    concat); wmid/wtb: (S, 3, 2C, 2C) int8 from :func:`pack_sparse_weights`;
    mult/off: (2C,) f32 epilogue; out_scale None -> bf16 out, else s8 codes.
    ``interpret`` defaults to True off-TPU (CPU test backend).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_src = len(xs)
    b, rh, w, c2 = xs[0].shape
    while rh % rhb:
        rhb //= 2
    nrb = rh // rhb

    full_spec = pl.BlockSpec((1, rhb, w, c2), lambda bi, ri: (bi, ri, 0, 0))
    top_spec = pl.BlockSpec(
        (1, 1, w, c2),
        lambda bi, ri: (bi, jnp.maximum(ri * rhb - 1, 0), 0, 0))
    bot_spec = pl.BlockSpec(
        (1, 1, w, c2),
        lambda bi, ri: (bi, jnp.minimum((ri + 1) * rhb, rh - 1), 0, 0))
    w_spec = pl.BlockSpec(wmid.shape, lambda bi, ri: (0, 0, 0, 0))
    v_spec = pl.BlockSpec((1, c2), lambda bi, ri: (0, 0))

    out_dtype = jnp.int8 if out_scale is not None else jnp.bfloat16
    return pl.pallas_call(
        _make_kernel(n_src, rhb, relu, out_scale),
        grid=(b, nrb),
        in_specs=[full_spec] * n_src + [top_spec] * n_src
        + [bot_spec] * n_src + [w_spec, w_spec, v_spec, v_spec],
        out_specs=pl.BlockSpec((1, rhb, w, c2), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rh, w, c2), out_dtype),
        interpret=interpret,
    )(*xs, *xs, *xs, wmid, wtb,
      jnp.asarray(mult, jnp.float32).reshape(1, -1),
      jnp.asarray(off, jnp.float32).reshape(1, -1))
