"""Whole-engine measurement of the int8 tail optimizations.

BASELINE.md round-2 trace: the int8 s2d engine spends 16 ms/iter (b64)
outside the convs — 6.2 ms SE excite+requant, 5.3 ms maxpool exits, 4.5 ms
bf16 head+argmax — against an ~735 tiles/s XLA-level conv ceiling. Round 3
adds three independently-toggleable attacks (insarseg/models/unet_int8.py):

- ``defer_gates``: encoder SE excites move into their consumers — the
  pooled path gates AFTER the 4x-smaller maxpool (max commutes with the
  positive per-(B,C) monotone requant — bit-identical, tested) and the
  skip path gates directly feeding the decoder's split conv (dual-conv
  replaces the concat so the broadcast-multiply can ride the conv's input
  fusion).
- ``mp_kernel='slice'``: maxpools as strided-slice maxima instead of
  reduce_window (whose TPU emitters run ~2x off the BW roofline).
- ``head_int8``: conv4 exits int8 at a calibrated head scale (0.25x the
  bf16-exit HBM traffic) and the 1x1 head runs int8 with a dequant
  epilogue (argmax-agreement bounded in tests).

Isolated-op probes mislead on this tunnel (CLAUDE.md) — this script
measures the WHOLE ENGINE per configuration. One JSON line per config.

Usage:
  cd /tmp && PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/int8_tail_sweep.py [b64,b128]
"""

from __future__ import annotations

import itertools
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(x) -> float:
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def measure(predict, images, iters=10) -> float:
    out = predict(images)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(images)
    _sync(out)
    return time.perf_counter() - t0


def main() -> None:
    from insarseg.models.unet import UNet
    from insarseg.models.unet_int8 import make_int8_predict_fn

    batches = tuple(int(b[1:]) for b in
                    (sys.argv[1].split(",") if len(sys.argv) > 1
                     else ("b64", "b128")))
    tile = 512
    model = UNet(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1)))
    rng = np.random.default_rng(0)
    calib = [rng.standard_normal((2, tile, tile, 1)).astype(np.float32)]
    imgs = {b: jnp.asarray(rng.standard_normal((b, tile, tile, 1))
                           .astype(np.float32)) for b in batches}

    configs = [
        {},  # round-2 baseline
        {"mp_kernel": "slice"},
        {"defer_gates": True},
        {"head_int8": True},
        {"defer_gates": True, "mp_kernel": "slice"},
        {"defer_gates": True, "mp_kernel": "slice", "head_int8": True},
    ]
    results = []
    for cfg in configs:
        predict = make_int8_predict_fn(variables, calib, argmax=True, **cfg)
        row = {"engine": "unet-ca-int8", "config": cfg}
        for b in batches:
            dt = measure(predict, imgs[b])
            row[f"tiles_per_s_b{b}"] = round(10 * b / dt, 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    # the fast variant rides the standard-layout graph: same tail options
    from insarseg.models.unet_stem import (
        UNetFastS2D,
        make_fast_int8_predict_fn,
    )

    fmodel = UNetFastS2D(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    fvars = fmodel.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1)))
    for cfg in (dict(), dict(defer_gates=True, mp_kernel="slice",
                             head_int8=True)):
        predict = make_fast_int8_predict_fn(fmodel, fvars, calib,
                                            argmax=True, **cfg)
        row = {"engine": "unet-fast-int8", "config": cfg}
        for b in batches:
            dt = measure(predict, imgs[b])
            row[f"tiles_per_s_b{b}"] = round(10 * b / dt, 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    best = max(results,
               key=lambda r: max(v for k, v in r.items()
                                 if isinstance(v, (int, float))))
    print(json.dumps({"summary": "int8_tail_sweep", "best": best}),
          flush=True)


if __name__ == "__main__":
    main()
