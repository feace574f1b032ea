"""Exact-parity UNet serving graph with deferred SE gates (standard layout).

Same math as ``UNet.apply(train=False)`` — BatchNorm folded into conv
epilogues and the SE excite multiplies moved to where their results are
*consumed* — restructurings XLA cannot do itself but that change nothing
numerically:

- ``maxpool2(x * g) == maxpool2(x) * g`` bit-for-bit for the per-channel
  sigmoid gate ``g > 0`` (scaling by a positive scalar commutes with max,
  and rounding is monotone), so the encoder applies the gate to the 4x
  smaller pooled tensor instead of the full-resolution one;
- skip tensors are gated at the decoder concat, the bottom at up1's input,
  and the last block at the 1x1 head's input — all positions where XLA
  absorbs a (B,1,1,C) broadcast-multiply into the consuming conv/dot's
  input fusion (verified in the compiled HLO).

Motivation (TPU v5e trace, b64 512^2 bf16, BASELINE.md "Speed of light"):
the standard graph spends 18.4 ms/iter in standalone SE broadcast-multiply
fusions — pure HBM round-trips on tensors that are re-read by a fusible
consumer anyway. Reference graph being served:
/root/reference/Unet-ChannalAttention.py:100-163.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from insarseg.models.unet_s2d import _conv_affine, _conv_transpose_k2s2, _fold_dc
from insarseg.ops.layers import max_pool_2d


def pack_unet_serve(variables: Dict[str, Any]) -> Dict[str, Any]:
    """UNet {'params','batch_stats'} -> BN-folded serving tree (standard
    layout). Supports all three variants: plain, SE (gates deferred), and
    SA (the per-pixel CBAM-DC gates stay in place — they don't commute
    with pooling — but their DoubleConv BNs fold like everything else)."""
    p, s = variables["params"], variables["batch_stats"]
    packed: Dict[str, Any] = {"inc": _fold_dc(p["inc"], s["inc"])}
    for i in range(1, 5):
        packed[f"down{i}"] = _fold_dc(p[f"down{i}"], s[f"down{i}"])
    for i in range(1, 5):
        packed[f"up{i}"] = {
            "k": jnp.asarray(p[f"up{i}"]["kernel"]),
            "bias": jnp.asarray(p[f"up{i}"]["bias"])
            if "bias" in p[f"up{i}"] else None,
        }
        packed[f"conv{i}"] = _fold_dc(p[f"conv{i}"], s[f"conv{i}"])
        if f"sa{i}" in p:
            packed[f"sa{i}"] = _fold_dc(p[f"sa{i}"]["compress_and_map"],
                                        s[f"sa{i}"]["compress_and_map"])
    packed["outc"] = {
        "k": jnp.asarray(p["outc"]["kernel"]),
        "bias": jnp.asarray(p["outc"]["bias"])
        if "bias" in p["outc"] else None,
    }
    return packed


def _dc_gate(pk: Dict, x: jnp.ndarray):
    """DoubleConv body; returns (pre-gate output, gate-or-None)."""
    x = _conv_affine(x, pk["k1"], pk["s1"], pk["b1"])
    x = _conv_affine(x, pk["k2"], pk["s2"], pk["b2"])
    if "fc1" not in pk:
        return x, None
    pooled = jnp.mean(x, axis=(1, 2))
    g = jnp.maximum(pooled @ pk["fc1"].astype(pooled.dtype), 0)
    g = jax.nn.sigmoid((g @ pk["fc2"].astype(g.dtype)).astype(jnp.float32))
    return x, g.astype(x.dtype)[:, None, None, :]


def _gated(x: jnp.ndarray, g) -> jnp.ndarray:
    return x if g is None else x * g


def _sa_gate(pk: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Folded SpatialAttentionDC: channel mean/max -> DoubleConv(2->1)
    (BN-folded) -> sigmoid -> per-pixel rescale (ops/blocks.py:133-149)."""
    m = jnp.concatenate([jnp.mean(x, axis=-1, keepdims=True),
                         jnp.max(x, axis=-1, keepdims=True)], axis=-1)
    m = _conv_affine(m, pk["k1"], pk["s1"], pk["b1"])
    m = _conv_affine(m, pk["k2"], pk["s2"], pk["b2"])
    return x * jax.nn.sigmoid(m.astype(jnp.float32)).astype(x.dtype)


def unet_serve_apply(packed: Dict[str, Any], x: jnp.ndarray,
                     argmax: bool = False) -> jnp.ndarray:
    """Eval-mode UNet forward, standard layout, deferred SE gates.

    x: (B, H, W, C_in), H and W divisible by 16. Returns logits
    (B, H, W, nc) or the argmax class map (B, H, W) int32."""
    feats = {}
    y, g = _dc_gate(packed["inc"], x)
    feats["l1"] = (y, g)
    for i in range(1, 5):
        y, g_next = _dc_gate(packed[f"down{i}"], _gated(max_pool_2d(y, 2), g))
        feats[f"l{i + 1}"] = (y, g_next)
        g = g_next

    for i, skip in ((1, "l4"), (2, "l3"), (3, "l2"), (4, "l1")):
        # each block's deferred gate lands on the (small) transposed-conv
        # input — the multiply fuses into the ConvT's input fusion, same as
        # the bottom's gate into up1
        z = _conv_transpose_k2s2(_gated(y, g), packed[f"up{i}"]["k"],
                                 packed[f"up{i}"]["bias"])
        sk, gsk = feats[skip]
        # gate AFTER the concat (pad with ones over the z half): the
        # multiply's consumer is then the conv itself, which XLA fuses;
        # gating before the concat materializes a full-resolution multiply
        # (measured 18.4 ms/iter at b64 512^2).
        cat = jnp.concatenate([sk, z], axis=-1)
        if gsk is not None:
            cat = cat * jnp.concatenate(
                [gsk, jnp.ones_like(gsk)], axis=-1)
        if f"sa{i}" in packed:  # SA variant: gate after the concat
            cat = _sa_gate(packed[f"sa{i}"], cat)
        y, g = _dc_gate(packed[f"conv{i}"], cat)

    y = _gated(y, g)  # fuses into the 1x1-conv head's input fusion
    logits = lax.conv_general_dilated(
        y, packed["outc"]["k"].astype(y.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if packed["outc"]["bias"] is not None:
        logits = logits + packed["outc"]["bias"].astype(logits.dtype)
    if argmax:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return logits


def make_serve_predict_fn(model, variables, argmax: bool = False,
                          input_dtype: Optional[Any] = None, mesh=None):
    """Pack once, return a jitted ``predict(images)`` on the serving graph.

    With ``mesh`` the batch shards over the mesh's ``data`` axis and the
    packed weights replicate (8-way == 1-way, tests/test_engines_mesh.py).
    """
    del model  # packing is tree-driven
    from insarseg.engines import check_hw, jit_engine, mesh_replicate_packed

    packed = mesh_replicate_packed(pack_unet_serve(variables), mesh)

    def predict(images):
        check_hw(images.shape, 16, 16, "serve", "unet")
        if input_dtype is not None:
            images = images.astype(input_dtype)
        return unet_serve_apply(packed, images, argmax=argmax)

    return jit_engine(predict, mesh)
