"""Probe: which conv formulations does XLA:TPU actually run fast?

Round-1 finding (ROADMAP.md): the level-1 convs (C=64 at 512^2) dominate the
U-Net-CA flagship — isolated L1 time implies ~26 TFLOP/s effective, i.e. ~13%
of v5e bf16 peak, far below both the MXU roofline and the HBM roofline. This
script measures the candidate reformulations of the same math so the serving
path can be rebuilt on whichever shape the conv emitter likes:

  a) conv3x3 64->64 @ 512^2        — the as-written hot op (baseline)
  b) conv3x3 128->128 @ 512^2      — L1 zero-padded to full MXU lanes (4x FLOPs)
  c) conv3x3 256->256 @ 256^2      — space-to-depth domain, 3x3 (4x FLOPs)
  d) conv2x2 256->256 @ 256^2      — space-to-depth domain, 2x2 (16/9 x FLOPs)
  e) conv1x1 256->256 @ 256^2      — the ConvT(k2,s2) s2d form (pure matmul)
  f) conv3x3 64->64 @ 512^2 int8   — quantized emitter check
  g) flagship predict, single dispatch vs K-chained (lax.fori_loop) — how much
     of the measured step is the ~30 ms axon dispatch overhead.

Each measurement chains ITERS executions inside one program (carry loop), so
dispatch is paid once; sync via scalar fetch (axon block_until_ready no-op).
Appends one JSON line per result to benchmarks/probe_results.jsonl.
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

OUT = "/root/repo/benchmarks/probe_results.jsonl"


def log(rec):
    rec = dict(rec)
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def sync(x) -> float:
    return float(jnp.ravel(x)[0])


def conv(x, w, stride=1):
    kh = w.shape[0]
    p = (kh - 1) // 2
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timed_chain(fn, x, iters, reps=3):
    """fn must map x -> same-shape x. Chains `iters` applications in one
    program; returns best-of-reps seconds per application."""

    @jax.jit
    def chained(x):
        return lax.fori_loop(0, iters, lambda i, y: fn(y), x)

    sync(chained(x))  # compile + warmup
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(chained(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def probe_conv(name, b, hw, cin, cout, k, dtype=jnp.bfloat16, iters=20):
    assert cin == cout
    h, w_ = (hw, hw) if isinstance(hw, int) else hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w_, cin)), dtype=dtype)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, dtype=dtype)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-16, 16, (b, h, w_, cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-4, 4, (k, k, cin, cout)), jnp.int8)

        def f(y):
            out = lax.conv_general_dilated(
                y, w, window_strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            # clip back to int8 so the loop carries a same-type tensor
            return jnp.clip(out >> 6, -127, 127).astype(jnp.int8)
    else:
        def f(y):
            return conv(y, w)

    try:
        dt = timed_chain(f, x, iters)
    except Exception as e:
        log({"probe": name, "error": f"{type(e).__name__}: {e}"[:300]})
        return
    flops = 2 * b * h * w_ * k * k * cin * cout
    log({
        "probe": name, "ms": round(dt * 1e3, 3),
        "tflops": round(flops / dt / 1e12, 1),
        "shape": f"b{b} {h}x{w_} {cin}->{cout} k{k} {jnp.dtype(dtype).name}",
    })


def probe_flagship():
    from insarseg.models.unet import UNet
    from insarseg.parallel import make_predict_fn

    tile, b = 512, 64
    model = UNet(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1)))
    predict = make_predict_fn(model, argmax=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((b, tile, tile, 1)), jnp.bfloat16)

    # single-dispatch
    sync(predict(variables, images))
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        out = predict(variables, images)
    sync(out)
    per = (time.perf_counter() - t0) / reps
    log({"probe": "flagship_b64_dispatch", "ms": round(per * 1e3, 2),
         "tiles_per_s": round(b / per, 1)})

    # K-chained inside one program: scan over K distinct microbatches
    K = 6

    @jax.jit
    def chained(variables, stack):
        def step(carry, xb):
            logits = model.apply(variables, xb, train=False)
            return carry, jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        _, outs = lax.scan(step, 0, stack)
        return outs

    stack = jnp.asarray(
        rng.standard_normal((K, b, tile, tile, 1)), jnp.bfloat16)
    sync(chained(variables, stack))
    t0 = time.perf_counter()
    out = chained(variables, stack)
    sync(out)
    per = (time.perf_counter() - t0) / K
    log({"probe": "flagship_b64_scan6", "ms": round(per * 1e3, 2),
         "tiles_per_s": round(b / per, 1)})

    # cost/memory analysis of the single-dispatch program
    try:
        lowered = jax.jit(
            lambda v, im: model.apply(v, im, train=False)
        ).lower(variables, images)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ma = comp.memory_analysis()
        log({"probe": "flagship_cost_analysis",
             "flops": ca.get("flops"),
             "bytes": ca.get("bytes accessed"),
             "hbm_peak": getattr(ma, "peak_memory_in_bytes", None),
             "argument_size": getattr(ma, "argument_size_in_bytes", None),
             "output_size": getattr(ma, "output_size_in_bytes", None),
             "temp_size": getattr(ma, "temp_size_in_bytes", None)})
    except Exception as e:
        log({"probe": "flagship_cost_analysis",
             "error": f"{type(e).__name__}: {e}"[:300]})


def main():
    log({"probe": "start", "devices": str(jax.devices())})
    probe_conv("conv3x3_c64_512", 16, 512, 64, 64, 3)
    probe_conv("conv3x3_c128_512", 16, 512, 128, 128, 3)
    probe_conv("conv3x3_c256_256", 16, 256, 256, 256, 3)
    probe_conv("conv2x2_c256_256", 16, 256, 256, 256, 2)
    probe_conv("conv1x1_c256_256", 16, 256, 256, 256, 1)
    probe_conv("conv1x1_c512_256", 16, 256, 512, 512, 1)
    probe_conv("conv3x3_c64_512_int8", 16, 512, 64, 64, 3, dtype=jnp.int8)
    probe_conv("conv3x3_c256_256_int8", 16, 256, 256, 256, 3, dtype=jnp.int8)
    # lower-level shapes for completeness (L2/L3 as-written)
    probe_conv("conv3x3_c128_256x512", 16, (256, 512), 128, 128, 3)
    probe_conv("conv3x3_c128_256", 16, 256, 128, 128, 3)
    probe_conv("conv3x3_c256_128", 16, 128, 256, 256, 3)
    probe_flagship()
    log({"probe": "done"})


if __name__ == "__main__":
    sys.exit(main())
