"""Raw int8-engine throughput vs batch size (512² U-Net-CA, logits out).

The scene pipeline's chunk size must match the engine's good batches:
`scene_gap_probe.py` found b72 (8 scenes x 9 tiles) runs 508 t/s vs 603
at b64/b128 — a 16% granularity tax. This sweep maps the batch landscape
so the scene configuration can be chosen on data. Prints one JSON line.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_batch_sweep.py \
      [batches...]   (default: 48 64 72 96 128 144)
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
    # index a scalar BEFORE any cast/ravel: a whole-array fetch of a
    # narrow-lane (C=2) logits tensor relayouts with 64x lane padding
    # (16 GB for (128,512,512,2) f32 — compile-time OOM, measured)
    return float(x[(0,) * x.ndim].astype(jnp.float32))


def main() -> None:
    from insarseg.engines import make_engine
    from insarseg.models.unet import UNet
    from insarseg.utils.retry import retry_transient

    batches = [int(a) for a in sys.argv[1:]] or [48, 64, 72, 96, 128, 144]
    tile = 512
    model = UNet(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    variables = retry_transient(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1))),
        what="model.init", retries=2)
    rng = np.random.default_rng(0)
    calib = [rng.standard_normal((8, tile, tile, 1)).astype(np.float32)]
    eng = retry_transient(
        lambda: make_engine("unet", "channel", model, variables, "int8",
                            calib_batches=calib),
        what="engine build", retries=2)
    eng = jax.jit(eng)

    rates = {}
    for b in batches:
        x = jnp.asarray(rng.standard_normal((b, tile, tile, 1))
                        .astype(np.float32)).astype(jnp.bfloat16)
        retry_transient(lambda: sync(eng(x)), what=f"warmup b{b}", retries=2,
                        sleep_s=30.0)
        iters = max(2, int(round(1600 / b)))

        def run():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = eng(x)
            sync(out)
            return (time.perf_counter() - t0) / iters

        dt = retry_transient(run, what=f"measure b{b}", retries=1,
                             sleep_s=30.0)
        rates[str(b)] = round(b / dt, 1)
        print(json.dumps({"batch": b, "tps": rates[str(b)]}), flush=True)

    print(json.dumps({"metric": "int8_batch_sweep_512", "rates": rates,
                      "unit": "tiles/sec/chip"}))


if __name__ == "__main__":
    main()
