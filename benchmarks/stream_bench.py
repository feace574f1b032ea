"""Streaming >RAM scene-inference benchmark (round-4 verdict #2).

`insarseg/data/serve.py::stream_scene_inference` is the production path for
interferogram strips larger than host RAM (rolling stitcher, native
normalize/stitch kernels, band pipelining). It was unit-tested but never
measured on the chip; this script drives it on a memmapped uint8 scene
(default 8192^2 — the access PATTERN of the >RAM path: scene and output
both live in files, only a rolling band is resident) and reports
tiles/s/chip plus peak host RSS.

Comparison target: `sliding_window_inference_batched` (scene_bench.py) runs
at ~90% of the raw engine rate at the same tile batch; the stream path adds
a host-side stitch (native tileops.cpp::stitch_accumulate) and a
device->host logits fetch per chunk, both overlapped with the device
forward. Known hazard (CLAUDE.md round 4): fetching a narrow-lane (...,2)
logits chunk relayouts with 64x lane padding — serve.py's
channel_major_fetch (default-on) transposes on device first; pass
``--no-channel-major`` to measure the penalty.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/stream_bench.py \
      [--scene-px 8192] [--tile 512] [--overlap 64] [--engine int8] \
      [--model unet] [--batch 128] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    from insarseg.data.serve import stream_scene_inference
    from insarseg.data.stitch import tile_starts
    from insarseg.models.registry import build
    from insarseg.utils.retry import retry_transient

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene-px", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--engine", default="int8",
                    choices=["module", "serve", "int8"])
    ap.add_argument("--model", default="unet", choices=["unet", "unet-fast"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--n-threads", type=int, default=4)
    ap.add_argument("--channel-major", dest="cmf",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="host path only: transpose logits on device "
                         "before the fetch; --no-channel-major also "
                         "selects the host path (the penalty being probed "
                         "only exists there)")
    ap.add_argument("--device-stitch", dest="dstitch",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="stitch on device (round-5 path); --no-device-"
                         "stitch measures the host rolling stitcher")
    ap.add_argument("--emit", default="logits", choices=["logits", "argmax"],
                    help="argmax: uint8 class rows computed on device — "
                         "8x less device->host traffic than f32 logits "
                         "(the CLI predict --stream configuration)")
    args = ap.parse_args()
    if not args.cmf:
        args.dstitch = False

    px, tile, overlap = args.scene_px, args.tile, args.overlap
    stride = tile - overlap
    n_rows = len(tile_starts(px, tile, stride))
    n_cols = len(tile_starts(px, tile, stride))
    n_tiles = n_rows * n_cols

    # memmapped uint8 scene (written once, reused across runs)
    scene_path = f"/tmp/stream_scene_{px}.u8"
    if not (os.path.exists(scene_path)
            and os.path.getsize(scene_path) == px * px):
        rng = np.random.default_rng(0)
        mm = np.memmap(scene_path, np.uint8, "w+", shape=(px, px))
        for r in range(0, px, 1024):  # bounded-RAM fill
            mm[r : r + 1024] = rng.integers(0, 256, (min(1024, px - r), px),
                                            np.uint8)
        mm.flush()
        del mm
    scene = np.memmap(scene_path, np.uint8, "r", shape=(px, px))
    if args.emit == "argmax":
        out = np.memmap(f"/tmp/stream_out_{px}.u8", np.uint8, "w+",
                        shape=(px, px))
    else:
        out = np.memmap(f"/tmp/stream_out_{px}.f32", np.float32, "w+",
                        shape=(px, px, 2))

    model = build(args.model, "channel", dtype=jnp.bfloat16)
    variables = retry_transient(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1))),
        what="model.init", retries=2)

    if args.engine == "module":
        apply_fn = jax.jit(lambda t: model.apply(variables, t, train=False))
    else:
        from insarseg.engines import make_engine

        calib = None
        if args.engine == "int8":
            band = (np.asarray(scene[:tile, : 4 * tile], np.float32) / 255.0
                    - 0.5) / 0.5
            calib = [np.stack([band[:, i * tile : (i + 1) * tile]
                               for i in range(4)])[..., None]]
        apply_fn = retry_transient(
            lambda: make_engine(args.model, "channel", model, variables,
                                args.engine, calib_batches=calib),
            what="engine build", retries=2)

    kw = dict(tile=tile, overlap=overlap, batch_size=args.batch,
              normalize=(0.5, 0.5), writer=out, n_threads=args.n_threads,
              channel_major_fetch=args.cmf, device_stitch=args.dstitch,
              emit=args.emit)

    rss0 = rss_mb()
    t0 = time.perf_counter()
    retry_transient(
        lambda: stream_scene_inference(apply_fn, scene, (px, px), 2, **kw),
        what="warmup pass", retries=2, sleep_s=30.0)
    warm_s = time.perf_counter() - t0

    def run() -> float:
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            stream_scene_inference(apply_fn, scene, (px, px), 2, **kw)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = retry_transient(run, what="measure", retries=1, sleep_s=30.0)
    eq_tiles = (px / 512) ** 2
    print(json.dumps({
        "metric": f"stream_{px}px_tile{tile}_ov{overlap}_{args.engine}"
                  f"_b{args.batch}"
                  + ("" if args.model == "unet" else f"_{args.model}")
                  + ("" if args.dstitch else "_host")
                  + ("" if args.cmf else "_nocmf")
                  + ("" if args.emit == "logits" else "_argmax"),
        "value": round(n_tiles / dt, 1),
        "unit": "tiles/sec/chip",
        "eq_512_tiles_per_sec": round(eq_tiles / dt, 1),
        "scene_s": round(dt, 3),
        "warmup_s": round(warm_s, 1),
        "n_tiles": n_tiles,
        "peak_rss_mb": round(rss_mb(), 1),
        "rss_before_mb": round(rss0, 1),
    }))


if __name__ == "__main__":
    main()
