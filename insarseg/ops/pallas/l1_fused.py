"""Fused level-1 Pallas kernels for the int8 s2d serving graph.

The single-conv block-sparse kernel (s2d_conv_int8.py) wins per-op but
loses end-to-end: every tensor crossing the XLA<->pallas boundary pays a
batch-minor<->row-major relayout, and those relayouts (~25 ms/iter at
512^2 b64 — BASELINE.md trace tables) swamp the ~6 ms conv win. These
kernels therefore keep the whole level-1 stage inside Pallas so only
layout-cheap rim tensors cross:

- :func:`l1_encoder_i8` — one kernel for the block-sparse inc.c2, the SE
  squeeze partial sums, and the s2d maxpool exit. Rim tensors: the t1
  codes from XLA's inc.c1 (full 128-lane s8 — a cheap relayout; inc.c1
  itself stays in XLA where its 2-channel input lives in an XLA-chosen
  layout that avoids the 64x lane-padding a pallas operand would pay),
  the (RH,W/2,64) pooled L2 feed, and the (B,128) pool sums.
- :func:`l1_decoder_i8` — one kernel for the deferred SE gating of the
  skip codes (x1s = requant(yq * gate), applied per loaded row so the
  full-res gated tensor never materializes), the dual-source block-sparse
  conv4.c1 (skip || up without the concat), conv4.c2, and its SE partial
  sums. Rim tensors: the encoder's yq codes (already row-major), the
  decoder requant zq, the (B,128) gate vector, the pre-SE output codes.

Both kernels recompute their one-row conv1 halo per row-block instead of
exchanging it (RHB+2 of RHB rows -> ~25% redundant c1 FLOPs on a cheap
op). The SE gate deferral is bit-exact: requant and max commute with a
positive per-channel gate (clip∘rint is monotone), the same argument as
the bf16 deferred-SE graph (insarseg/models/unet_serve.py).

Consumed by insarseg/models/unet_int8.py with ``l1_kernel='fused'``.
No reference equivalent (serving-path optimization).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from insarseg.ops.pallas.s2d_conv_int8 import _shift_w, pack_sparse_weights


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------

def pack_l1_encoder(inc_blk: Dict) -> Dict:
    """Engine 'inc' block (unet_int8.pack_unet_int8 output, s2d graph) ->
    encoder-kernel weight set. Requires the SE variant (pre-SE requant)."""
    assert "fc1" in inc_blk, "fused L1 kernels support the SE variant"
    c2 = np.asarray(inc_blk["c2"]["q"]).shape[-1]
    wmid, wtb = pack_sparse_weights(np.asarray(inc_blk["c2"]["q"]), [(0, c2)])
    return {
        "wmid": wmid, "wtb": wtb,
        "mult2": jnp.asarray(inc_blk["c2"]["mult"], jnp.float32),
        "off2": jnp.asarray(inc_blk["c2"]["off"], jnp.float32),
        "pre_s": float(inc_blk["c2"]["out_s"]),
    }


def pack_l1_decoder(c4_blk: Dict) -> Dict:
    """Engine 'conv4' block -> decoder-kernel weight set (dual-source c1)."""
    assert "fc1" in c4_blk, "fused L1 kernels support the SE variant"
    q1 = np.asarray(c4_blk["c1"]["q"])  # (3, 3, 2*c2, c2)
    c2 = q1.shape[-1]
    wmid1, wtb1 = pack_sparse_weights(q1, [(0, c2), (c2, 2 * c2)])
    wmid2, wtb2 = pack_sparse_weights(np.asarray(c4_blk["c2"]["q"]), [(0, c2)])
    return {
        "wmid1": wmid1, "wtb1": wtb1,
        "mult1": jnp.asarray(c4_blk["c1"]["mult"], jnp.float32),
        "off1": jnp.asarray(c4_blk["c1"]["off"], jnp.float32),
        "t1_s": float(c4_blk["c1"]["out_s"]),
        "wmid2": wmid2, "wtb2": wtb2,
        "mult2": jnp.asarray(c4_blk["c2"]["mult"], jnp.float32),
        "off2": jnp.asarray(c4_blk["c2"]["off"], jnp.float32),
        "pre_s": float(c4_blk["c2"]["out_s"]),
    }


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _requant_i8(y: jnp.ndarray, s: float) -> jnp.ndarray:
    return jnp.clip(jnp.rint(y * (1.0 / s)), -127, 127).astype(jnp.int8)


def _dot_i8(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def _sparse_row(mid, top, bot, wmid_ref, wtb_ref, s: int, c: int):
    """One output row of the block-sparse s2d conv: 6 matmuls + w-shifts."""
    z = jnp.concatenate([top[:, c:], bot[:, :c]], axis=1)
    acc = None
    for v in range(3):
        t = _shift_w(_dot_i8(mid, wmid_ref[s, v]) + _dot_i8(z, wtb_ref[s, v]),
                     v)
        acc = t if acc is None else acc + t
    return acc


def _make_encoder_kernel(rhb: int, pre_s: float):
    def kernel(t1_ref, top_ref, bot_ref, wmid_ref, wtb_ref,
               m2_ref, o2_ref, yq_ref, mp_ref, pool_ref):
        first = pl.program_id(1) == 0
        last = pl.program_id(1) == pl.num_programs(1) - 1
        c2 = yq_ref.shape[-1]
        c = c2 // 2

        # sparse conv2 + epilogue + pool partials + maxpool exit
        # (partials broadcast over all 8 sublanes of the (B,8,2C) output —
        # Mosaic needs >=8-row blocks; the caller reads row 0)
        part = jnp.zeros((8, c2), jnp.float32)
        for r in range(rhb):
            mid = t1_ref[0, r]
            if r == 0:
                top = top_ref[0, 0]
                top = jnp.where(first, jnp.zeros_like(top), top)
            else:
                top = t1_ref[0, r - 1]
            if r == rhb - 1:
                bot = bot_ref[0, 0]
                bot = jnp.where(last, jnp.zeros_like(bot), bot)
            else:
                bot = t1_ref[0, r + 1]
            acc = _sparse_row(mid, top, bot, wmid_ref, wtb_ref, 0, c)
            y = jnp.maximum(acc.astype(jnp.float32) * m2_ref[0] + o2_ref[0],
                            0.0)
            yq = _requant_i8(y, pre_s)
            yq_ref[0, r] = yq
            part = part + jnp.sum(yq.astype(jnp.float32), axis=0,
                                  keepdims=True)
            # maxpool exit on the pre-requant f32 (requant is monotone, so
            # requant(max) == max(requant) bit-for-bit); int8 reshapes and
            # reductions are unimplemented on Mosaic, f32 ones are fine
            a = jnp.maximum(y[:, :c], y[:, c:])       # parity (H-pair) max
            ar = a.reshape(a.shape[0] // 2, 2, a.shape[1])
            mp_ref[0, r] = _requant_i8(jnp.max(ar, axis=1), pre_s)

        @pl.when(first)
        def _():
            pool_ref[...] = jnp.zeros_like(pool_ref)

        pool_ref[...] += part[None]

    return kernel


def l1_encoder_i8(
    t1: jnp.ndarray,
    enc: Dict,
    rhb: int = 8,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused inc.c2 + SE pool partials + s2d maxpool exit.

    t1: (B, RH, W, 2C) s8 codes from XLA's inc.c1. Returns
    (yq (B,RH,W,2C) s8 pre-SE codes, mp2 (B,RH,W/2,C) s8 pooled pre-SE
    codes, pools (B,2C) f32 channel sums of yq)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, rh, w, c2 = t1.shape
    while rh % rhb:
        rhb //= 2

    full = pl.BlockSpec((1, rhb, w, c2), lambda bi, ri: (bi, ri, 0, 0))
    top = pl.BlockSpec((1, 1, w, c2),
                       lambda bi, ri: (bi, jnp.maximum(ri * rhb - 1, 0), 0, 0))
    bot = pl.BlockSpec((1, 1, w, c2),
                       lambda bi, ri: (bi, jnp.minimum((ri + 1) * rhb, rh - 1),
                                       0, 0))
    wsp = lambda a: pl.BlockSpec(a.shape, lambda bi, ri: (0,) * a.ndim)
    vec = pl.BlockSpec((1, c2), lambda bi, ri: (0, 0))

    yq, mp2, pools8 = pl.pallas_call(
        _make_encoder_kernel(rhb, enc["pre_s"]),
        grid=(b, rh // rhb),
        in_specs=[full, top, bot, wsp(enc["wmid"]), wsp(enc["wtb"]),
                  vec, vec],
        out_specs=[
            pl.BlockSpec((1, rhb, w, c2), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, rhb, w // 2, c2 // 2),
                         lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, 8, c2), lambda bi, ri: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rh, w, c2), jnp.int8),
            jax.ShapeDtypeStruct((b, rh, w // 2, c2 // 2), jnp.int8),
            jax.ShapeDtypeStruct((b, 8, c2), jnp.float32),
        ],
        interpret=interpret,
    )(t1, t1, t1, enc["wmid"], enc["wtb"],
      enc["mult2"].reshape(1, -1), enc["off2"].reshape(1, -1))
    return yq, mp2, pools8[:, 0]


def _make_decoder_kernel(rhb: int, t1_s: float, pre_s: float):
    def kernel(yq_ref, yt_ref, yb_ref, zq_ref, zt_ref, zb_ref, gate_ref,
               wmid1_ref, wtb1_ref, m1_ref, o1_ref,
               wmid2_ref, wtb2_ref, m2_ref, o2_ref,
               out_ref, pool_ref, x1_scr, z_scr, t1_scr):
        first = pl.program_id(1) == 0
        last = pl.program_id(1) == pl.num_programs(1) - 1
        c2 = out_ref.shape[-1]
        c = c2 // 2
        gate = gate_ref[0, 0]

        # stage 0: gate skip rows (x1s = requant(yq * gate)) and stage the
        # up rows; scratch rows j = -2..RHB+1 at index j+2
        for j in range(-2, rhb + 2):
            if j < 0:
                yrow, zrow = yt_ref[0, j + 2], zt_ref[0, j + 2]
            elif j >= rhb:
                yrow, zrow = yb_ref[0, j - rhb], zb_ref[0, j - rhb]
            else:
                yrow, zrow = yq_ref[0, j], zq_ref[0, j]
            x1 = _requant_i8(yrow.astype(jnp.float32) * gate, 1.0)
            if j < 0:
                m = first
            elif j >= rhb:
                m = last
            else:
                m = None
            if m is not None:
                x1 = jnp.where(m, jnp.zeros_like(x1), x1)
                zrow = jnp.where(m, jnp.zeros_like(zrow), zrow)
            x1_scr[j + 2] = x1
            z_scr[j + 2] = zrow

        # stage 1: dual-source sparse conv1 rows -1..RHB -> t1 scratch
        for j in range(-1, rhb + 1):
            i = j + 2
            acc = _sparse_row(x1_scr[i], x1_scr[i - 1], x1_scr[i + 1],
                              wmid1_ref, wtb1_ref, 0, c)
            acc = acc + _sparse_row(z_scr[i], z_scr[i - 1], z_scr[i + 1],
                                    wmid1_ref, wtb1_ref, 1, c)
            y = jnp.maximum(acc.astype(jnp.float32) * m1_ref[0] + o1_ref[0],
                            0.0)
            q = _requant_i8(y, t1_s)
            if j == -1:
                q = jnp.where(first, jnp.zeros_like(q), q)
            if j == rhb:
                q = jnp.where(last, jnp.zeros_like(q), q)
            t1_scr[j + 1] = q

        # stage 2: sparse conv2 + pool partials (sublane-broadcast, see
        # the encoder kernel)
        part = jnp.zeros((8, c2), jnp.float32)
        for r in range(rhb):
            acc = _sparse_row(t1_scr[r + 1], t1_scr[r], t1_scr[r + 2],
                              wmid2_ref, wtb2_ref, 0, c)
            y = jnp.maximum(acc.astype(jnp.float32) * m2_ref[0] + o2_ref[0],
                            0.0)
            yq = _requant_i8(y, pre_s)
            out_ref[0, r] = yq
            part = part + jnp.sum(yq.astype(jnp.float32), axis=0,
                                  keepdims=True)

        @pl.when(first)
        def _():
            pool_ref[...] = jnp.zeros_like(pool_ref)

        pool_ref[...] += part[None]

    return kernel


def l1_decoder_i8(
    yq: jnp.ndarray,
    zq: jnp.ndarray,
    gate: jnp.ndarray,
    dec: Dict,
    rhb: int = 8,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused deferred-gate + conv4.c1 (dual) + conv4.c2 + SE partials.

    yq: encoder pre-SE codes (B,RH,W,2C) s8; zq: decoder up-path codes at
    the concat scale; gate: (B,2C) f32 = sigmoid-gate * pre_s / cat_s
    (x1s = requant(yq*gate) is applied per loaded row in-kernel). Returns
    (pre-SE conv4 codes (B,RH,W,2C) s8, pools (B,2C) f32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, rh, w, c2 = yq.shape
    while rh % rhb:
        rhb //= 2
    assert rhb >= 2, "decoder kernel needs row blocks of >=2 rows"

    full = pl.BlockSpec((1, rhb, w, c2), lambda bi, ri: (bi, ri, 0, 0))
    top2 = pl.BlockSpec(
        (1, 2, w, c2),
        lambda bi, ri: (bi, jnp.maximum(ri * (rhb // 2) - 1, 0), 0, 0))
    bot2 = pl.BlockSpec(
        (1, 2, w, c2),
        lambda bi, ri: (bi, jnp.minimum((ri + 1) * (rhb // 2),
                                        rh // 2 - 1), 0, 0))
    wsp = lambda a: pl.BlockSpec(a.shape, lambda bi, ri: (0,) * a.ndim)
    vecb = pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0))
    vec = pl.BlockSpec((1, c2), lambda bi, ri: (0, 0))

    out, pools8 = pl.pallas_call(
        _make_decoder_kernel(rhb, dec["t1_s"], dec["pre_s"]),
        grid=(b, rh // rhb),
        in_specs=[full, top2, bot2, full, top2, bot2, vecb,
                  wsp(dec["wmid1"]), wsp(dec["wtb1"]), vec, vec,
                  wsp(dec["wmid2"]), wsp(dec["wtb2"]), vec, vec],
        out_specs=[
            pl.BlockSpec((1, rhb, w, c2), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, 8, c2), lambda bi, ri: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rh, w, c2), jnp.int8),
            jax.ShapeDtypeStruct((b, 8, c2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rhb + 4, w, c2), jnp.int8),
            pltpu.VMEM((rhb + 4, w, c2), jnp.int8),
            pltpu.VMEM((rhb + 2, w, c2), jnp.int8),
        ],
        interpret=interpret,
    )(yq, yq, yq, zq, zq, zq,
      jnp.asarray(gate, jnp.float32)[:, None, :],
      dec["wmid1"], dec["wtb1"],
      dec["mult1"].reshape(1, -1), dec["off1"].reshape(1, -1),
      dec["wmid2"], dec["wtb2"],
      dec["mult2"].reshape(1, -1), dec["off2"].reshape(1, -1))
    return out, pools8[:, 0]
