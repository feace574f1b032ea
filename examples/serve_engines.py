"""Serving-engine tour: one checkpoint, three engines, every family.

Builds a model (fresh init here; pass an Orbax dir to serve a trained
one), then runs the same inputs through the module / serve / int8 engines
(insarseg/engines.py) and prints throughput + agreement. Works on CPU
(int8 L1 kernels interpret-mode) and TPU.

    python examples/serve_engines.py [model] [attention] [tile] [batch]
    python examples/serve_engines.py deeplabv3 channel 256 8
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    from insarseg.engines import make_engine, supported
    from insarseg.models.registry import build

    model_name = sys.argv[1] if len(sys.argv) > 1 else "unet"
    attention = sys.argv[2] if len(sys.argv) > 2 else "channel"
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    model = build(model_name, attention, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, tile, tile, 1)), jnp.float32)
    calib = [np.asarray(x[: min(4, batch)], np.float32)]

    ref = None
    for engine in ("module", "serve", "int8"):
        if not supported(model_name, attention, engine):
            print(f"{engine:>7}: unsupported for ({model_name}, {attention})")
            continue
        predict = make_engine(
            model_name, attention, model, variables, engine,
            calib_batches=calib if engine == "int8" else None)
        y = np.asarray(predict(x), np.float32)  # compile + warmup
        t0 = time.perf_counter()
        y = np.asarray(predict(x), np.float32)
        dt = time.perf_counter() - t0
        line = f"{engine:>7}: {batch / dt:8.1f} tiles/s"
        if ref is None:
            ref = y
        else:
            agree = float((y.argmax(-1) == ref.argmax(-1)).mean())
            line += f"   argmax agreement vs module: {agree:.4f}"
        print(line)

    # engine artifacts: pack + calibrate once, save, serve from the file
    # alone (no variables, no calibration data) — bit-exact round trip
    import tempfile

    from insarseg.engines import engine_from_artifact, pack_engine
    from insarseg.engines_io import load_artifact, save_artifact

    art = pack_engine(model_name, attention, model, variables, "int8",
                      calib_batches=calib)
    # mkstemp (not the race-prone, deprecated mktemp): the fd holds the
    # path; save_artifact rewrites the file in place
    fd, tmp = tempfile.mkstemp(prefix="insarseg_eng_", suffix=".npz")
    os.close(fd)
    path = save_artifact(tmp, art)
    served = engine_from_artifact(load_artifact(path))
    same = bool(np.array_equal(np.asarray(served(x), np.float32), y))
    print(f"artifact: saved {path}, reloaded predict bit-identical: {same}")


if __name__ == "__main__":
    main()
