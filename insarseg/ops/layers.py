"""Primitive layers with PyTorch-compatible numerics, NHWC layout.

These are deliberately *not* thin re-exports of ``flax.linen`` layers: the
reference models (see ``/root/reference/Unet.py:40-110`` et al.) were trained
from scratch under PyTorch's default initializers and BatchNorm semantics, so
to reproduce the published mIoU table and to pass <=1e-4 logit parity we own
the exact numerics here:

- Conv/ConvTranspose/Dense use torch's default ``kaiming_uniform_(a=sqrt(5))``
  init (weight and bias both ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))).
- BatchNorm matches ``nn.BatchNorm2d``: eps=1e-5, momentum=0.1 with
  ``new = (1-m)*old + m*batch`` running updates, *unbiased* variance in the
  running estimate, *biased* variance for normalization. Statistics are always
  accumulated in float32 regardless of the compute dtype.
- Everything is NHWC (TPU-native). Converters in ``insarseg.compat.torch_io``
  handle the NCHW/OIHW transposition.

Under ``jit`` + ``jax.sharding`` with the batch axis sharded over the mesh,
the batch statistics in :class:`BatchNorm2d` are computed over the *global*
batch (XLA GSPMD inserts the cross-chip reductions), i.e. data-parallel
training gets synchronized BatchNorm for free — the design called for in
SURVEY.md §2.4.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def torch_uniform_init(bound: float):
    """U(-bound, bound) initializer (torch's kaiming_uniform_(a=sqrt(5)) reduces
    to bound = 1/sqrt(fan_in) for both weights and biases)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _promote(x: jnp.ndarray, dtype: Optional[Dtype]) -> jnp.ndarray:
    return x if dtype is None else x.astype(dtype)


def _compute_dtype(x: jnp.ndarray, dtype: Optional[Dtype]) -> Dtype:
    """Layer compute dtype: explicit ``dtype`` wins; otherwise follow the
    input's dtype (so feeding bf16 activations runs the whole layer in bf16
    with f32 params cast on the fly)."""
    return dtype if dtype is not None else x.dtype


class Conv2d(nn.Module):
    """2-D convolution, torch-compatible (``nn.Conv2d``), NHWC in/out.

    ``padding`` is a torch-style integer (symmetric); kernel is stored HWIO.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Any] = None  # default: torch kaiming_uniform(a=sqrt(5))
    # Set by blocks whose conv output feeds a *train-mode* BatchNorm directly
    # (DoubleConv): BN subtracts the per-channel batch mean and its variance
    # uses E[x^2]-E[x]^2, so a per-channel constant shift cancels EXACTLY and
    # d(loss)/d(bias) == 0 in exact arithmetic (torch computes it numerically
    # and gets ~1e-8-scale summation noise; tests/test_layers.py asserts the
    # analytic zero against autodiff). stop_gradient-ing the bias removes the
    # full-activation-tensor grad reductions — 24.9 of 215.7 ms/iter on the
    # exact bf16 b16 512^2 train step, 7.3 of 67.5 ms on the fast cell
    # (BASELINE.md "Round 5: train-step speed of light").
    stop_bias_grad: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        dh, dw = _pair(self.dilation)
        cin = x.shape[-1]
        assert cin % self.groups == 0
        fan_in = (cin // self.groups) * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_uniform_init(bound),
            (kh, kw, cin // self.groups, self.features),
            self.param_dtype,
        )
        cdt = _compute_dtype(x, self.dtype)
        x = _promote(x, cdt)
        kernel = _promote(kernel, cdt)
        y = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_uniform_init(bound), (self.features,), self.param_dtype
            )
            if self.stop_bias_grad:
                bias = lax.stop_gradient(bias)
            y = y + _promote(bias, cdt)
        return y


class ConvTranspose2d(nn.Module):
    """Transposed 2-D convolution matching ``nn.ConvTranspose2d``.

    Implemented as a regular convolution over an lhs-dilated input with the
    spatially-flipped kernel — the form XLA lowers best on TPU (it becomes a
    strided MXU conv, no scatter). Kernel stored (kh, kw, cin, cout); the torch
    weight (cin, cout, kh, kw) maps via ``permute(2, 3, 0, 1)``.

    Parity target: the decoder ``ConvTranspose2d(k=2, s=2)`` ops at
    ``/root/reference/Unet.py:68-77``.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        cin = x.shape[-1]
        # torch _ConvTransposeNd: fan_in = weight.shape[1] * kh * kw = cout*kh*kw
        fan_in = self.features * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            torch_uniform_init(bound),
            (kh, kw, cin, self.features),
            self.param_dtype,
        )
        cdt = _compute_dtype(x, self.dtype)
        x = _promote(x, cdt)
        k = _promote(kernel, cdt)
        # conv over the lhs-dilated input with the spatially-flipped kernel,
        # pad = k - 1 - p. XLA:TPU's conv emitter handles lhs_dilation
        # without materializing zeros; a matmul+pixel-shuffle variant for the
        # non-overlapping k=2 s=2 case was measured SLOWER (245 vs 289
        # tiles/s full-model) because the shuffle transpose is a real HBM
        # pass — keep the single lowering.
        kf = jnp.flip(k, axis=(0, 1))
        y = lax.conv_general_dilated(
            x,
            kf,
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_uniform_init(bound), (self.features,), self.param_dtype
            )
            y = y + _promote(bias, cdt)
        return y


class BatchNorm2d(nn.Module):
    """BatchNorm over NHWC with exact ``nn.BatchNorm2d`` semantics.

    Running stats live in the ``batch_stats`` collection (float32). During
    training the normalization uses the biased batch variance while the
    running-variance update uses the unbiased estimate (n/(n-1)), matching
    torch. Under a sharded batch the means are global means (sync-BN).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    use_running_average: Optional[bool] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, use_running_average: Optional[bool] = None
    ) -> jnp.ndarray:
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        # Statistics accumulate in at least float32 (bf16 inputs promote);
        # float64 inputs keep float64 so the whole layer is exact in x64
        # debugging/parity runs.
        acc = jnp.promote_types(x.dtype, jnp.float32)
        if ura:
            mean, var = ra_mean.value.astype(acc), ra_var.value.astype(acc)
        else:
            xf = x.astype(acc)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                sdt = ra_mean.value.dtype  # keep the stats tree's dtype
                ra_mean.value = ((1.0 - m) * ra_mean.value + m * mean).astype(sdt)
                ra_var.value = ((1.0 - m) * ra_var.value + m * unbiased).astype(sdt)

        dtype = self.dtype or x.dtype
        inv = lax.rsqrt(var + self.eps) * scale.astype(acc)
        y = (x.astype(acc) - mean) * inv + bias.astype(acc)
        return y.astype(dtype)


class Dense(nn.Module):
    """Linear layer with torch ``nn.Linear`` default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        # Stored (in, out); torch stores (out, in) — converter transposes.
        kernel = self.param(
            "kernel",
            torch_uniform_init(bound),
            (fan_in, self.features),
            self.param_dtype,
        )
        cdt = _compute_dtype(x, self.dtype)
        x = _promote(x, cdt)
        y = x @ _promote(kernel, cdt)
        if self.use_bias:
            bias = self.param(
                "bias", torch_uniform_init(bound), (self.features,), self.param_dtype
            )
            y = y + _promote(bias, cdt)
        return y


def max_pool_2d(
    x: jnp.ndarray,
    window: Union[int, Tuple[int, int]],
    stride: Optional[Union[int, Tuple[int, int]]] = None,
    padding: Union[int, Tuple[int, int]] = 0,
) -> jnp.ndarray:
    """Max pooling matching ``nn.MaxPool2d`` (floor mode, -inf padding)."""
    wh, ww = _pair(window)
    sh, sw = _pair(stride if stride is not None else window)
    ph, pw = _pair(padding)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, wh, ww, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def adaptive_avg_pool_2d(x: jnp.ndarray, output_size: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    """``nn.AdaptiveAvgPool2d`` over NHWC: output bin (i, j) averages input
    rows [floor(i*H/O), ceil((i+1)*H/O)) — torch's variable-window rule.

    Static output size; implemented with an integral image (two cumsums +
    O(O^2) gathers), which XLA fuses into a handful of VPU ops.
    """
    oh, ow = _pair(output_size)
    _, h, w, _ = x.shape
    if (h, w) == (oh, ow):
        return x
    if oh == 1 and ow == 1:
        return global_avg_pool(x)
    xf = x.astype(jnp.float32)
    # integral image with a leading zero row/col
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(xf, axis=1), axis=2), ((0, 0), (1, 0), (1, 0), (0, 0)))

    def edges(n, o):
        starts = [int(math.floor(i * n / o)) for i in range(o)]
        ends = [int(math.ceil((i + 1) * n / o)) for i in range(o)]
        return starts, ends

    hs, he = edges(h, oh)
    ws, we = edges(w, ow)
    rows = []
    for i in range(oh):
        cols = []
        for j in range(ow):
            s = (
                ii[:, he[i], we[j]]
                - ii[:, hs[i], we[j]]
                - ii[:, he[i], ws[j]]
                + ii[:, hs[i], ws[j]]
            )
            cols.append(s / ((he[i] - hs[i]) * (we[j] - ws[j])))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1).astype(x.dtype)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) over NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def global_max_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveMaxPool2d(1) over NHWC."""
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)
