"""Block-sparse s2d int8 Pallas kernel (insarseg/ops/pallas/s2d_conv_int8.py)
vs the dense XLA int8 conv it replaces — interpret mode on the CPU backend."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from insarseg.models.unet_s2d import s2d_conv3x3_kernel
from insarseg.ops.pallas.s2d_conv_int8 import (
    pack_sparse_weights,
    s2d_conv3x3_i8,
)

C = 64  # original channel count; s2d doubles it


def _mk_q(rng, cin_groups):
    """Random int8 dense kernels -> s2d-transformed int8 kernel with the
    structural zeros, one (3,3,C,C) original kernel per source group."""
    qs = []
    for _ in range(cin_groups):
        w = rng.integers(-127, 128, (3, 3, C, C)).astype(np.float32)
        j = np.arange(2 * C)
        qs.append(s2d_conv3x3_kernel(w, j // C, j % C))
    return np.concatenate(qs, axis=2).astype(np.int8)  # (3,3,2C*groups,2C)


def _dense_ref(xcat, q, mult, off, out_s, relu=True):
    acc = lax.conv_general_dilated(
        xcat, jnp.asarray(q), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * mult + off
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_s is None:
        return y.astype(jnp.bfloat16)
    return jnp.clip(jnp.rint(y / out_s), -127, 127).astype(jnp.int8)


@pytest.mark.parametrize("n_src,quant_out", [(1, True), (2, True), (1, False)])
def test_sparse_kernel_matches_dense(n_src, quant_out):
    rng = np.random.default_rng(0)
    q = _mk_q(rng, n_src)
    wmid, wtb = pack_sparse_weights(q, [(128 * s, 128 * (s + 1))
                                        for s in range(n_src)])
    xs = [jnp.asarray(rng.integers(-127, 128, (2, 16, 32, 2 * C)), jnp.int8)
          for _ in range(n_src)]
    mult = jnp.asarray(rng.uniform(1e-4, 3e-4, 2 * C), jnp.float32)
    off = jnp.asarray(rng.uniform(-0.05, 0.05, 2 * C), jnp.float32)

    # pick the requant scale from the actual output range so the check
    # isn't dominated by saturation
    yf = np.asarray(_dense_ref(jnp.concatenate(xs, -1), q, mult, off, None),
                    np.float32)
    out_s = float(np.abs(yf).max()) / 127.0 if quant_out else None

    want = _dense_ref(jnp.concatenate(xs, -1), q, mult, off, out_s)
    got = s2d_conv3x3_i8(xs, wmid, wtb, mult, off, out_s, interpret=True)
    assert got.shape == want.shape and got.dtype == want.dtype
    if out_s is None:
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.02, atol=1e-2)
    else:
        g = np.asarray(got, np.int32)
        w = np.asarray(want, np.int32)
        # requant uses y*(1/s) in-kernel vs y/s in XLA: allow rare 1-code ties
        assert np.abs(g - w).max() <= 1
        assert (g == w).mean() > 0.999


def test_pack_rejects_non_s2d_kernel():
    rng = np.random.default_rng(1)
    q = rng.integers(-5, 6, (3, 3, 128, 128)).astype(np.int8)
    with pytest.raises(AssertionError):
        pack_sparse_weights(q, [(0, 128)])


def test_sparse_kernel_rhb_not_dividing():
    """RH=4 forces the rhb fallback (8 -> 4)."""
    rng = np.random.default_rng(2)
    q = _mk_q(rng, 1)
    wmid, wtb = pack_sparse_weights(q, [(0, 128)])
    x = jnp.asarray(rng.integers(-127, 128, (1, 4, 16, 2 * C)), jnp.int8)
    mult = jnp.full((2 * C,), 2e-4, jnp.float32)
    off = jnp.zeros((2 * C,), jnp.float32)
    want = _dense_ref(x, q, mult, off, 0.5)
    got = s2d_conv3x3_i8([x], wmid, wtb, mult, off, 0.5, interpret=True)
    g, w = np.asarray(got, np.int32), np.asarray(want, np.int32)
    assert np.abs(g - w).max() <= 1 and (g == w).mean() > 0.999
