"""Inference throughput sweep over every model family and engine.

Measures inference tiles/sec/chip for each (model, attention) cell at the
given tile size under every supported engine (module = parity bf16 graph,
serve = BN-folded exact graph, int8 = PTQ) — one JSON line per
(cell, engine).

Usage: python benchmarks/model_sweep.py [tile_px] [batch] [cells...]
Default cells: one per architecture family at the reference's attention
variants of interest.
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

DEFAULT_CELLS = [
    ("unet", "none"),
    ("unet", "channel"),
    ("unet", "spatial"),
    ("deeplabv3", "channel"),
    ("fcn", "channel"),
    ("pspnet", "none"),
]


def sync(x) -> float:
    return float(jnp.ravel(x)[0])


def main() -> None:
    from insarseg.models.registry import build

    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cells = DEFAULT_CELLS
    if len(sys.argv) > 3:
        cells = [tuple(c.split(":")) for c in sys.argv[3:]]

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, tile, tile, 1)).astype(np.float32)
    ).astype(jnp.bfloat16)

    from insarseg.engines import make_engine, supported

    calib = [np.asarray(x[: min(8, batch)], np.float32)]
    for model_name, attention in cells:
        model = build(model_name, attention, dtype=jnp.bfloat16)
        variables = model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1)))
        for engine in ("module", "serve", "int8"):
            tag = (f"{model_name}-{attention}_{tile}px_b{batch}_"
                   f"{'int8' if engine == 'int8' else 'bf16'}_{engine}")
            if not supported(model_name, attention, engine):
                continue
            try:
                predict = make_engine(
                    model_name, attention, model, variables, engine,
                    calib_batches=calib if engine == "int8" else None,
                    argmax=True,
                    input_dtype=jnp.bfloat16 if engine == "serve" else None)
                sync(predict(x))
                iters = 10
                t0 = time.perf_counter()
                for _ in range(iters):
                    y = predict(x)
                sync(y)
                dt = (time.perf_counter() - t0) / iters
                print(json.dumps({
                    "metric": tag,
                    "value": round(batch / dt, 2),
                    "unit": "tiles/sec/chip",
                    "step_ms": round(dt * 1e3, 2),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"metric": tag, "error": type(e).__name__}),
                      flush=True)


if __name__ == "__main__":
    main()
