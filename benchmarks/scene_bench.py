"""Full-scene sliding-window inference benchmark (BASELINE.json configs[5]).

1024^2/2048^2 interferogram scenes -> 512^2 tile grid (overlap 64) ->
batched U-Net-CA forward -> Hann overlap-stitch, all under jit on the chip.
The 4th arg picks the tile engine: 'module' (parity bf16 graph), 'serve'
(BN-folded deferred-SE exact graph) or 'int8' (PTQ, self-calibrated on
the scene) — insarseg/engines.py.

Two modes:

- ``nscenes=1`` (default): the original single-scene path
  (``sliding_window_inference``) — one 9-tile dispatch per 1024^2 scene.
  Measured round 2: dispatch- and batch-bound (a 9-tile batch leaves the
  chip underfilled and the ~30 ms axon dispatch overhead un-amortized).
- ``nscenes=S``: the batched multi-scene path
  (``sliding_window_inference_batched``): S scenes share one tile plan,
  their S*N tiles flatten into one stream of fixed-shape forward chunks
  (``batch`` tiles per chunk — fill the chip: >=64 at 512^2), and the
  overlap-add stitch vmaps over scenes. This is the round-4 saturation
  measurement (round-3 verdict #2: the scene path ran ~3x below the raw
  engine tile rate because nobody had measured the batched configuration).

Usage:
  python benchmarks/scene_bench.py [scene_px] [tile] [overlap] [engine]
                                   [nscenes] [batch] [model]
``model`` (default 'unet') also accepts 'unet-fast' — the validated
retrain-to-use fast cell (README "fast-variant accuracy"), which is the
fastest scene-serving configuration.
Prints one JSON line with scenes/sec, the actual tile rate through the
scene pipeline (tiles_per_sec), and 512^2-equivalent tiles/sec/chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def sync(x) -> float:
    # index a scalar BEFORE any cast/ravel: a whole-array fetch of the
    # narrow-lane (C=2) logits output relayouts with 64x lane padding
    # (32 GB for a (64,1024,1024,2) f32 output — OOM, measured)
    return float(x[(0,) * x.ndim].astype(jnp.float32))


def main() -> None:
    from insarseg.data.stitch import (
        plan_tiles,
        sliding_window_inference,
        sliding_window_inference_batched,
    )
    from insarseg.models.registry import build
    from insarseg.utils.retry import retry_transient

    scene_px = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    overlap = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    engine = sys.argv[4] if len(sys.argv) > 4 else "module"
    nscenes = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    n_tiles = len(plan_tiles(scene_px, scene_px, tile, overlap))
    # chunk size for the flattened tile stream: b128 is the measured
    # sweet spot for every engine (int8 613 t/s vs 508 at b72, serve 411
    # vs 318 at b64 -- int8_batch_sweep.py / BASELINE.md "Round 4")
    batch = int(sys.argv[6]) if len(sys.argv) > 6 else \
        min(nscenes * n_tiles, 128)
    model_name = sys.argv[7] if len(sys.argv) > 7 else "unet"

    model = build(model_name, "channel", dtype=jnp.bfloat16)
    variables = retry_transient(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1))),
        what="model.init", retries=2)
    rng = np.random.default_rng(0)
    scenes = jnp.asarray(
        rng.standard_normal((nscenes, scene_px, scene_px, 1))
        .astype(np.float32)
    ).astype(jnp.bfloat16)

    if engine == "module":
        predict_tile = lambda t: model.apply(variables, t, train=False)  # noqa: E731
    else:
        from insarseg.data.stitch import extract_tiles
        from insarseg.engines import make_engine

        calib = None
        if engine == "int8":
            pos = plan_tiles(scene_px, scene_px, tile, overlap)[:4]
            calib = [np.asarray(extract_tiles(
                scenes[0].astype(jnp.float32), pos, tile))]
        predict_tile = retry_transient(
            lambda: make_engine(model_name, "channel", model, variables,
                                engine, calib_batches=calib,
                                input_dtype=jnp.bfloat16
                                if engine == "serve" else None),
            what="engine build", retries=2)

    if nscenes == 1:
        @jax.jit
        def infer(scenes):
            return sliding_window_inference(
                predict_tile, scenes[0], tile=tile, overlap=overlap)[None]
    else:
        @jax.jit
        def infer(scenes):
            return sliding_window_inference_batched(
                predict_tile, scenes, tile=tile, overlap=overlap,
                batch_size=batch)

    retry_transient(lambda: sync(infer(scenes)), what="warmup", retries=2,
                    sleep_s=30.0)  # compile + warmup
    iters = max(int(round(40 / nscenes)), 3)

    def run():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(scenes)
        sync(out)
        return (time.perf_counter() - t0) / iters

    dt = retry_transient(run, what="measure", retries=1, sleep_s=30.0)

    eq_tiles = (scene_px / 512) ** 2 * nscenes
    print(json.dumps({
        "metric": f"scene_{scene_px}px_tile{tile}_ov{overlap}_{engine}"
                  f"_s{nscenes}_b{batch}"
                  + ("" if model_name == "unet" else f"_{model_name}"),
        "value": round(nscenes / dt, 3),
        "unit": "scenes/sec/chip",
        "tiles_per_scene": n_tiles,
        "tiles_per_sec": round(n_tiles * nscenes / dt, 1),
        "eq_512_tiles_per_sec": round(eq_tiles / dt, 1),
        "batch_ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
