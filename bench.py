"""North-star benchmark: U-Net-CA inference throughput on 512^2 tiles.

Target (BASELINE.md): >= 10,000 512^2 tiles/sec on a v5e-8 slice ==
1,250 tiles/sec/chip. This script measures tiles/sec on the attached chip(s)
and reports per-chip throughput; ``vs_baseline`` is the ratio against the
1,250/chip target.

Two serving paths are measured (see BASELINE.md "Speed of light" for the
trace-backed physics):

- **exact bf16** (`insarseg.models.unet_serve`): the parity graph — BN
  folded, SE gates deferred to their fusible consumers, same math to
  <=1e-4. Measured 411 tiles/s/chip (the plain module graph does 371);
  the 1,250 target is *above* bf16 speed of light for this architecture
  (404 TFLOP/s needed vs 197 peak).
- **int8 s2d** (`insarseg.models.unet_int8`): opt-in post-training-
  quantized H-space-to-depth graph; argmax-exact on every input measured
  but not logit-exact. This is the headline `value` (same architecture as
  the reference).

Additionally the **fast variant** (`insarseg.models.unet_stem`,
space-to-depth stem + widened level 1 — an architecture-altering opt-in;
accuracy validated head-to-head within 0.09 pt mIoU of the exact cell,
README.md "fast-variant accuracy") is measured in both precisions and
reported as `fast_*` fields. Measured: bf16 1008, int8 1623 tiles/s/chip
— the int8 fast variant exceeds the 1,250/chip target (1.30x).

Every path is mesh-shardable (round 3): with n chips attached, the batch
shards over a ('data',) mesh and the packed weights replicate, so the
serve/int8/fast engines use the whole slice — not just the module graph.

Synchronization note: on the experimental ``axon`` platform
``block_until_ready`` can return before execution finishes, so timing is
forced through a scalar device->host fetch of the last output (the chip
executes its queue in order, so fetching from the final buffer bounds the
whole timed window).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N,
   "exact_bf16": N, "int8_s2d": N, ...}
"""

from __future__ import annotations

import json
import sys
import time

import jax

# Persistent compile cache: repeat bench runs skip the (minutes-long on the
# axon tunnel) XLA compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BASELINE_TILES_PER_SEC_PER_CHIP = 10_000 / 8  # BASELINE.md north star


def _sync(x) -> float:
    """Force completion of the execution queue: scalar device->host fetch."""
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def _measure(predict, images, iters: int) -> float:
    out = predict(images)
    _sync(out)  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(images)
    _sync(out)
    return time.perf_counter() - t0


def _sweep(predict, make_batch, batches, n_chips: int) -> float:
    from insarseg.utils.retry import is_transient, retry_transient

    import os

    best = 0.0
    for per_chip_batch in batches:
        batch = per_chip_batch * n_chips
        iters = int(os.environ.get("BENCH_ITERS", "10"))
        try:
            # the axon tunnel drops the odd call with a transient backend
            # error — retry the measurement once before giving up on it
            dt = retry_transient(
                lambda: _measure(predict, make_batch(batch), iters),
                what=f"measure(batch={batch})", retries=1, sleep_s=20.0)
        except Exception as e:
            if is_transient(e):  # still down after the retry: skip this
                print(f"batch {batch} transient failure persisted: "
                      f"{type(e).__name__}", file=sys.stderr)
                continue  # the next batch may land after recovery
            # deterministic failure (e.g. OOM at the largest batch)
            print(f"batch {batch} failed: {type(e).__name__}", file=sys.stderr)
            break
        best = max(best, iters * batch / dt)
    return best / n_chips


def main() -> None:
    from insarseg.models.unet import UNet
    from insarseg.models.unet_int8 import make_int8_predict_fn
    from insarseg.models.unet_serve import make_serve_predict_fn
    from insarseg.parallel import make_mesh
    from insarseg.parallel.mesh import batch_sharding
    from insarseg.utils.retry import retry_transient

    import os

    # Backend init is the call that killed the round-3 driver snapshot
    # (transient axon UNAVAILABLE at jax.devices()); retry with backoff and
    # a backend-cache reset between attempts.
    n_chips = retry_transient(
        lambda: len(jax.devices()),
        what="jax.devices()", retries=4, sleep_s=15.0, backoff=1.6,
        reset_backend=True)
    # smoke-test overrides (e.g. the 8-virtual-CPU mesh): the driver runs
    # with defaults on the real chip(s)
    tile = int(os.environ.get("BENCH_TILE", "512"))
    batches = tuple(int(b) for b in
                    os.environ.get("BENCH_BATCHES", "64,128").split(","))

    model = UNet(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    variables = retry_transient(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1))),
        what="model.init", retries=2, sleep_s=20.0)
    rng = np.random.default_rng(0)

    # one ('data',) mesh for every engine when a slice is attached — the
    # packed predicts shard the batch and replicate the weights
    mesh = make_mesh(data=n_chips) if n_chips > 1 else None

    def _place(images):
        if mesh is None:
            return jnp.asarray(images)
        return jax.device_put(images, batch_sharding(mesh, spatial_axis=None))

    def batch_f32(batch):
        return _place(rng.standard_normal((batch, tile, tile, 1))
                      .astype(np.float32))

    def batch_bf16(batch):
        return _place(rng.standard_normal((batch, tile, tile, 1))
                      .astype(jnp.bfloat16))

    # exact bf16 path: the deferred-SE serve graph on every chip
    serve = make_serve_predict_fn(model, variables, argmax=True,
                                  input_dtype=jnp.bfloat16, mesh=mesh)
    # measured sweep (v5e, bf16): serve graph b64 318, b128 411 tiles/s/chip
    # (module graph: 290/371); OOM at b160 single-chip
    exact = _sweep(serve, batch_bf16, batches, n_chips)

    # int8 s2d serving path (mesh-sharded like the rest)
    int8 = fast_bf16 = fast_int8 = 0.0
    try:
        calib = [rng.standard_normal((2, tile, tile, 1)).astype(np.float32)]
        pred_i8 = retry_transient(
            lambda: make_int8_predict_fn(variables, calib, argmax=True,
                                         mesh=mesh),
            what="int8 engine build", retries=2, sleep_s=20.0)
        # measured (v5e): b64 599, b128 602, b192 588 tiles/s
        int8 = _sweep(pred_i8, batch_f32, batches, n_chips)
    except Exception as e:
        print(f"int8 path failed: {type(e).__name__}", file=sys.stderr)

    # opt-in fast variant (architecture-altering; both precisions;
    # accuracy head-to-head in README.md "fast-variant accuracy")
    try:
        from insarseg.models.unet_stem import (
            UNetFastS2D,
            make_fast_int8_predict_fn,
            make_fast_serve_predict_fn,
        )

        fmodel = UNetFastS2D(num_classes=2, use_se=True, dtype=jnp.bfloat16)
        fvars = retry_transient(
            lambda: fmodel.init(jax.random.key(0),
                                jnp.zeros((1, tile, tile, 1))),
            what="fast model.init", retries=2, sleep_s=20.0)
        fserve = make_fast_serve_predict_fn(fmodel, fvars, argmax=True,
                                            mesh=mesh)
        # measured (v5e): bf16 948/1008, int8 1567/1623 at b64/b128
        fast_bf16 = _sweep(fserve, batch_bf16, batches, n_chips)
        fint8 = retry_transient(
            lambda: make_fast_int8_predict_fn(
                fmodel, fvars,
                [rng.standard_normal((2, tile, tile, 1)).astype(np.float32)],
                argmax=True, mesh=mesh),
            what="fast int8 engine build", retries=2, sleep_s=20.0)
        fast_int8 = _sweep(fint8, batch_f32, batches, n_chips)
    except Exception as e:
        print(f"fast variant failed: {type(e).__name__}", file=sys.stderr)

    best = max(exact, int8)
    print(
        json.dumps(
            {
                "metric": "unet_ca_512px_inference",
                "value": round(best, 2),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(best / BASELINE_TILES_PER_SEC_PER_CHIP, 4),
                "n_chips": n_chips,
                "exact_bf16": round(exact, 2),
                "int8_s2d": round(int8, 2),
                "fast_variant_bf16": round(fast_bf16, 2),
                "fast_variant_int8": round(fast_int8, 2),
                "fast_variant_vs_baseline": round(
                    fast_int8 / BASELINE_TILES_PER_SEC_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
