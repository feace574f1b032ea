"""Full-scene sliding-window inference benchmark (BASELINE.json configs[5]).

1024^2 interferogram scene -> 512^2 tile grid (overlap 64) -> batched
U-Net-CA forward -> Hann overlap-stitch, all under jit on the chip. The
4th arg picks the tile engine: 'module' (parity bf16 graph), 'serve'
(BN-folded deferred-SE exact graph) or 'int8' (PTQ, self-calibrated on
the scene) — insarseg/engines.py.

Usage: python benchmarks/scene_bench.py [scene_px] [tile] [overlap] [engine]
Prints one JSON line with scenes/sec and 512^2-equivalent tiles/sec/chip.
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
    return float(jnp.ravel(x)[0])


def main() -> None:
    from insarseg.data.stitch import plan_tiles, sliding_window_inference
    from insarseg.models.unet import UNet

    scene_px = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    overlap = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    engine = sys.argv[4] if len(sys.argv) > 4 else "module"

    model = UNet(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1)))
    rng = np.random.default_rng(0)
    scene = jnp.asarray(
        rng.standard_normal((scene_px, scene_px, 1)).astype(np.float32)
    ).astype(jnp.bfloat16)

    if engine == "module":
        predict_tile = lambda t: model.apply(variables, t, train=False)  # noqa: E731
    else:
        from insarseg.data.stitch import extract_tiles
        from insarseg.engines import make_engine

        calib = None
        if engine == "int8":
            pos = plan_tiles(scene_px, scene_px, tile, overlap)[:4]
            calib = [np.asarray(extract_tiles(scene.astype(jnp.float32),
                                              pos, tile))]
        predict_tile = make_engine("unet", "channel", model, variables,
                                   engine, calib_batches=calib,
                                   input_dtype=jnp.bfloat16
                                   if engine == "serve" else None)

    @jax.jit
    def infer(scene):
        return sliding_window_inference(
            predict_tile, scene, tile=tile, overlap=overlap,
        )

    sync(infer(scene))  # compile + warmup
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(scene)
    sync(out)
    dt = (time.perf_counter() - t0) / iters

    n_tiles = len(plan_tiles(scene_px, scene_px, tile, overlap))
    eq_tiles = (scene_px / 512) ** 2
    print(json.dumps({
        "metric": f"scene_{scene_px}px_tile{tile}_ov{overlap}_{engine}",
        "value": round(1.0 / dt, 3),
        "unit": "scenes/sec/chip",
        "tiles_per_scene": n_tiles,
        "eq_512_tiles_per_sec": round(eq_tiles / dt, 1),
        "scene_ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
