"""Attribute the batched-scene-path vs raw-engine throughput gap.

Round-4 measurement (`scene_bench.py`, BASELINE.md "Round 4"): the batched
1024^2 int8 scene pipeline runs 466.6 tiles/s/chip vs `bench.py`'s 603 —
a ~23% gap. But the two numbers are not like-for-like: bench's engines
emit argmax (one int32 plane per tile) while the scene path must keep the
full 2-channel logits for Hann-weighted overlap-add stitching.

This probe measures, in ONE chip process at the scene path's own chunk
size (b72, 512^2):

  1. raw int8 engine, argmax output      (bench.py's configuration)
  2. raw int8 engine, full-logits output (what stitching actually consumes)
  3. the batched 8-scene 1024^2 pipeline (the round-4 scene number)

(2)-(1) is the cost of keeping logits (the bf16 head's output can no
longer fuse into an argmax exit and 2x the bytes leave the last fusion);
(3)-(2) is the true stitch overhead (tile extract + Hann multiply +
vmapped overlap-add scan). Prints one JSON line.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/scene_gap_probe.py
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def sync(x) -> float:
    # index a scalar BEFORE any cast/ravel: a whole-array fetch of a
    # narrow-lane (C=2) logits tensor relayouts with 64x lane padding
    # (16 GB for (128,512,512,2) f32 — compile-time OOM, measured)
    return float(x[(0,) * x.ndim].astype(jnp.float32))


def measure(fn, arg, iters: int) -> float:
    from insarseg.utils.retry import retry_transient

    retry_transient(lambda: sync(fn(arg)), what="warmup", retries=2,
                    sleep_s=30.0)

    def run():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        sync(out)
        return (time.perf_counter() - t0) / iters

    return retry_transient(run, what="measure", retries=1, sleep_s=30.0)


def main() -> None:
    from insarseg.data.stitch import (
        extract_tiles,
        plan_tiles,
        sliding_window_inference_batched,
    )
    from insarseg.engines import make_engine
    from insarseg.models.unet import UNet
    from insarseg.utils.retry import retry_transient

    tile, overlap, batch, nscenes, scene_px = 512, 64, 72, 8, 1024

    model = UNet(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    variables = retry_transient(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1))),
        what="model.init", retries=2)
    rng = np.random.default_rng(0)
    scenes = jnp.asarray(
        rng.standard_normal((nscenes, scene_px, scene_px, 1))
        .astype(np.float32)).astype(jnp.bfloat16)
    pos = plan_tiles(scene_px, scene_px, tile, overlap)
    calib = [np.asarray(extract_tiles(scenes[0].astype(jnp.float32),
                                      pos[:4], tile))]

    def build(argmax):
        return retry_transient(
            lambda: make_engine("unet", "channel", model, variables, "int8",
                                calib_batches=calib, argmax=argmax),
            what="engine build", retries=2)

    eng_logits = build(False)
    eng_argmax = build(True)

    tiles72 = jax.vmap(lambda sc: extract_tiles(sc, pos, tile))(scenes)
    tiles72 = np.asarray(
        tiles72.reshape((-1,) + tiles72.shape[2:])[:batch], np.float32)
    tiles72 = jnp.asarray(tiles72).astype(jnp.bfloat16)

    dt_argmax = measure(jax.jit(eng_argmax), tiles72, iters=25)
    dt_logits = measure(jax.jit(eng_logits), tiles72, iters=25)

    @jax.jit
    def scene_infer(sc):
        return sliding_window_inference_batched(
            eng_logits, sc, tile=tile, overlap=overlap, batch_size=batch)

    dt_scene = measure(scene_infer, scenes, iters=8)

    n = len(pos)
    r_argmax = batch / dt_argmax
    r_logits = batch / dt_logits
    r_scene = n * nscenes / dt_scene
    print(json.dumps({
        "metric": "scene_gap_probe_int8_512_b72",
        "raw_argmax_tps": round(r_argmax, 1),
        "raw_logits_tps": round(r_logits, 1),
        "scene_s8_tps": round(r_scene, 1),
        "argmax_ms": round(dt_argmax * 1e3, 2),
        "logits_ms": round(dt_logits * 1e3, 2),
        "scene_ms": round(dt_scene * 1e3, 2),
        "logits_cost_pct": round(100 * (1 - r_logits / r_argmax), 1),
        "stitch_cost_pct": round(100 * (1 - r_scene / r_logits), 1),
        "unit": "tiles/sec/chip",
    }))


if __name__ == "__main__":
    main()
