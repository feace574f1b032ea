"""North-star benchmark: U-Net-CA inference throughput on 512^2 tiles.

Target (BASELINE.md): >= 10,000 512^2 tiles/sec on a v5e-8 slice ==
1,250 tiles/sec/chip. This script measures tiles/sec on the attached chip(s)
and reports per-chip throughput; ``vs_baseline`` is the ratio against the
1,250/chip target.

Synchronization note: on the experimental ``axon`` platform
``block_until_ready`` can return before execution finishes, so timing is
forced through a scalar device->host fetch of the last output (the chip
executes its queue in order, so fetching from the final buffer bounds the
whole timed window).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
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
    return float(jnp.ravel(x)[0])


def _measure(predict, variables, images, iters: int) -> float:
    out = predict(variables, images)
    _sync(out)  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(variables, images)
    _sync(out)
    return time.perf_counter() - t0


def main() -> None:
    from insarseg.models.unet import UNet
    from insarseg.parallel import make_mesh, make_predict_fn, replicate, shard_batch

    n_chips = len(jax.devices())
    tile = 512

    model = UNet(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1)))

    mesh = make_mesh(data=n_chips) if n_chips > 1 else None
    predict = make_predict_fn(model, mesh=mesh, argmax=True)
    if mesh is not None:
        variables = replicate(variables, mesh)

    rng = np.random.default_rng(0)
    best = 0.0
    # measured sweep (v5e, bf16 inputs): b32 270, b64 290, b96 325, b128 371
    # tiles/s/chip; OOM at b160 — dispatch overhead on the tunnel keeps
    # rewarding batch until HBM runs out.
    for per_chip_batch in (64, 128):
        batch = per_chip_batch * n_chips
        images = jnp.asarray(
            rng.standard_normal((batch, tile, tile, 1)).astype(np.float32)
        ).astype(jnp.bfloat16)
        if mesh is not None:
            images = shard_batch({"image": images}, mesh)["image"]
        iters = 10
        try:
            dt = _measure(predict, variables, images, iters)
        except Exception as e:  # e.g. OOM at the largest batch
            import sys

            print(f"batch {batch} failed: {type(e).__name__}", file=sys.stderr)
            break
        best = max(best, iters * batch / dt)

    per_chip = best / n_chips
    print(
        json.dumps(
            {
                "metric": "unet_ca_512px_bf16_inference",
                "value": round(per_chip, 2),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_TILES_PER_SEC_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
