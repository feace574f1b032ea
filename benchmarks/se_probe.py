"""Probe: SE (squeeze-excite) cost on the flagship shapes.

The trace (benchmarks/probe_results.jsonl + /tmp/flagship_trace) shows the
nine SE global-average-pools cost 84.6 ms of the 218 ms b64 step (39%) and
the rescale broadcasts another ~18 ms — XLA's convert+reduce lowering runs
~6x over the HBM roofline. This probe measures alternative formulations of
the exact same math so the serving graph can use the fastest:

  a) jnp.mean(x, (1, 2))                       (as written)
  b) two-stage mean: axis 2 (W) then axis 1    (smaller live reduction)
  c) matmul reduction: ones(HW) @ reshape      (MXU does the sum)
  d) the round-1 Pallas se_scale kernel        (streamed two-pass)

Full SE = GAP -> MLP -> sigmoid -> rescale; each variant measured as the
full block (output shape == input shape, chained in one program).
Appends JSON lines to benchmarks/probe_results.jsonl.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

OUT = "/root/repo/benchmarks/probe_results.jsonl"


def log(rec):
    rec = dict(rec)
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def sync(x):
    return float(jnp.ravel(x)[0])


def timed_chain(fn, x, iters=12, reps=3):
    @jax.jit
    def chained(x):
        return lax.fori_loop(0, iters, lambda i, y: fn(y), x)

    sync(chained(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(chained(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def mlp_gate(pooled, w1, w2):
    g = jnp.maximum(pooled.astype(jnp.float32) @ w1, 0.0) @ w2
    return jax.nn.sigmoid(g)


def se_a(x, w1, w2):
    pooled = jnp.mean(x, axis=(1, 2))
    g = mlp_gate(pooled, w1, w2)
    return x * g[:, None, None, :].astype(x.dtype)


def se_b(x, w1, w2):
    pooled = jnp.mean(jnp.mean(x.astype(jnp.float32), axis=2), axis=1)
    g = mlp_gate(pooled, w1, w2)
    return x * g[:, None, None, :].astype(x.dtype)


def se_c(x, w1, w2):
    b, h, w, c = x.shape
    ones = jnp.ones((h * w,), jnp.bfloat16)
    pooled = jnp.einsum(
        "bkc,k->bc", x.reshape(b, h * w, c), ones,
        preferred_element_type=jnp.float32) / (h * w)
    g = mlp_gate(pooled, w1, w2)
    return x * g[:, None, None, :].astype(x.dtype)


def se_pallas(x, w1, w2):
    from insarseg.ops.pallas import se_scale
    return se_scale(x, w1, w2)


def main():
    log({"probe": "se_start"})
    b = 64
    shapes = [(512, 64), (256, 128), (128, 256), (64, 512), (32, 1024)]
    rng = np.random.default_rng(0)
    for hw, c in shapes:
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)) * 0.1,
                        jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((c, c // 16)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((c // 16, c)) * 0.1, jnp.float32)
        roofline_ms = 3 * b * hw * hw * c * 2 / 820e9 * 1e3
        for name, fn in (("a_mean", se_a), ("b_2stage", se_b),
                         ("c_matmul", se_c), ("d_pallas", se_pallas)):
            try:
                dt = timed_chain(lambda y, f=fn: f(y, w1, w2), x)
                log({"probe": f"se_{name}", "shape": f"b{b} {hw}^2 c{c}",
                     "ms": round(dt * 1e3, 3),
                     "roofline_ms": round(roofline_ms, 2)})
            except Exception as e:
                log({"probe": f"se_{name}", "shape": f"b{b} {hw}^2 c{c}",
                     "error": f"{type(e).__name__}: {e}"[:200]})
    log({"probe": "se_done"})


if __name__ == "__main__":
    main()
