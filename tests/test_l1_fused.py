"""Fused L1 kernels (insarseg/ops/pallas/l1_fused.py) vs the reference
int8 op composition — interpret mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from insarseg.models.unet_s2d import s2d_conv3x3_kernel
from insarseg.ops.pallas.l1_fused import (
    l1_decoder_i8,
    l1_encoder_i8,
    pack_l1_decoder,
    pack_l1_encoder,
)

C = 64
B, RH, W = 2, 16, 32


def _conv_i8_ref(xq, q, mult, off, out_s):
    acc = lax.conv_general_dilated(
        xq, jnp.asarray(q), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * mult + off, 0.0)
    return jnp.clip(jnp.rint(y / out_s), -127, 127).astype(jnp.int8)


def _s2d_q(rng, cin_orig):
    w = rng.integers(-20, 21, (3, 3, cin_orig, C)).astype(np.float32)
    j = np.arange(2 * cin_orig)
    return s2d_conv3x3_kernel(w, j // cin_orig, j % cin_orig).astype(np.int8)


def _blk(rng, q1, q2, t1_s, pre_s):
    return {
        "c1": {"q": jnp.asarray(q1),
               "mult": jnp.asarray(rng.uniform(1e-4, 2e-4, 2 * C),
                                   jnp.float32),
               "off": jnp.asarray(rng.uniform(0, 0.02, 2 * C), jnp.float32),
               "out_s": t1_s},
        "c2": {"q": jnp.asarray(q2),
               "mult": jnp.asarray(rng.uniform(1e-4, 2e-4, 2 * C),
                                   jnp.float32),
               "off": jnp.asarray(rng.uniform(0, 0.02, 2 * C), jnp.float32),
               "out_s": pre_s},
        "fc1": jnp.zeros((1, 1)), "fc2": jnp.zeros((1, 1)),  # SE presence
    }


def test_encoder_kernel_matches_composition():
    rng = np.random.default_rng(0)
    q1 = _s2d_q(rng, 1)  # (3,3,2,128)
    q2 = _s2d_q(rng, C)  # (3,3,128,128)
    blk = _blk(rng, q1, q2, t1_s=0.9, pre_s=1.1)
    enc = pack_l1_encoder(blk)

    xq2 = jnp.asarray(rng.integers(-60, 61, (B, RH, W, 2)), jnp.int8)
    t1_ref = _conv_i8_ref(xq2, q1, blk["c1"]["mult"], blk["c1"]["off"], 0.9)
    yq_ref = _conv_i8_ref(t1_ref, q2, blk["c2"]["mult"], blk["c2"]["off"], 1.1)
    a = jnp.maximum(yq_ref[..., :C], yq_ref[..., C:])
    mp_ref = jnp.maximum(a[:, :, 0::2], a[:, :, 1::2])
    pools_ref = jnp.sum(yq_ref.astype(jnp.float32), axis=(1, 2))

    yq, mp2, pools = l1_encoder_i8(t1_ref, enc, interpret=True)
    assert np.abs(np.asarray(yq, np.int32)
                  - np.asarray(yq_ref, np.int32)).max() <= 1
    agree = (np.asarray(yq) == np.asarray(yq_ref)).mean()
    assert agree > 0.999, agree
    assert np.abs(np.asarray(mp2, np.int32)
                  - np.asarray(mp_ref, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(pools), np.asarray(pools_ref),
                               rtol=1e-3, atol=2.0)


def test_decoder_kernel_matches_composition():
    rng = np.random.default_rng(1)
    q1 = np.concatenate([_s2d_q(rng, C), _s2d_q(rng, C)], axis=2)  # 256-in
    q2 = _s2d_q(rng, C)
    blk = _blk(rng, q1, q2, t1_s=0.8, pre_s=1.3)
    dec = pack_l1_decoder(blk)

    yq = jnp.asarray(rng.integers(-90, 91, (B, RH, W, 2 * C)), jnp.int8)
    zq = jnp.asarray(rng.integers(-90, 91, (B, RH, W, 2 * C)), jnp.int8)
    gate = jnp.asarray(rng.uniform(0.2, 1.0, (B, 2 * C)), jnp.float32)

    x1s_ref = jnp.clip(jnp.rint(yq.astype(jnp.float32)
                                * gate[:, None, None, :]),
                       -127, 127).astype(jnp.int8)
    cat = jnp.concatenate([x1s_ref, zq], axis=-1)
    t1_ref = _conv_i8_ref(cat, q1, blk["c1"]["mult"], blk["c1"]["off"], 0.8)
    out_ref = _conv_i8_ref(t1_ref, q2, blk["c2"]["mult"], blk["c2"]["off"],
                           1.3)
    pools_ref = jnp.sum(out_ref.astype(jnp.float32), axis=(1, 2))

    out, pools = l1_decoder_i8(yq, zq, gate, dec, interpret=True)
    assert np.abs(np.asarray(out, np.int32)
                  - np.asarray(out_ref, np.int32)).max() <= 1
    agree = (np.asarray(out) == np.asarray(out_ref)).mean()
    assert agree > 0.995, agree
    np.testing.assert_allclose(np.asarray(pools), np.asarray(pools_ref),
                               rtol=1e-3, atol=4.0)
