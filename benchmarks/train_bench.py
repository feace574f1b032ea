"""Training-step throughput benchmark (any preset, synthetic data).

Usage: python benchmarks/train_bench.py [preset] [batch] [image_size] \
           [remat] [bf16]
(``remat``/``bf16`` are positional opt-in flags after batch+size: per-block
rematerialization and bfloat16 compute — see Config.remat/compute_dtype.)
Prints one JSON line: steady-state step time and tiles/sec/chip for the
jitted train step (fwd + bwd + Adam + sync-BN + metrics in one XLA program).
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


def sync(x) -> float:
    return float(jnp.ravel(x)[0])


def main() -> None:
    from insarseg.config import get_preset
    from insarseg.models.registry import build_model
    from insarseg.train import engine

    preset = sys.argv[1] if len(sys.argv) > 1 else "unet"
    opts = set(sys.argv[4:6])
    cfg = get_preset(
        preset, remat="remat" in opts,
        compute_dtype="bfloat16" if "bf16" in opts else "float32")
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else cfg.batch_size
    size = int(sys.argv[3]) if len(sys.argv) > 3 else cfg.image_size

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 1)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, cfg.num_classes, (batch, size, size)).astype(np.int32))

    model = build_model(cfg)
    state = engine.create_state(model, jax.random.key(0), images, cfg.learning_rate)
    step = engine.make_train_step(model, cfg.num_classes, cfg.ignore_index)

    key = jax.random.key(1)
    state, out = step(state, images, masks, key)
    sync(out["loss"])  # compile + warmup

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, images, masks, key)
    sync(out["loss"])
    dt = (time.perf_counter() - t0) / iters

    n_chips = len(jax.devices())
    print(json.dumps({
        "metric": f"train_step_{preset}_{size}px_b{batch}"
                  + ("_remat" if cfg.remat else "")
                  + ("_bf16" if cfg.compute_dtype == "bfloat16" else ""),
        "value": round(batch / dt / n_chips, 2),
        "unit": "tiles/sec/chip",
        "step_ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
