"""Tracing / profiling utilities (SURVEY.md §5).

The reference's only observability is wall-clock prints around the train loop
(/root/reference/Unet.py:248,319-320) and a step print every 100 iterations
(:278-279). TPU-native replacements:

- :class:`StepTimer` — per-step wall timing with warmup skip and percentile
  summary; correct on the axon tunnel (forces a scalar fetch, because
  ``block_until_ready`` there is unreliable — see bench.py).
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
- :func:`tiles_per_sec` — the north-star counter (512^2-equivalent
  interferogram tiles/sec/chip).
- :func:`enable_nan_debugging` — the debug-config analog of a sanitizer:
  ``jax_debug_nans`` makes any NaN-producing jitted op raise with its
  location (SURVEY.md §5 "race detection / sanitizers" row).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import List, Optional

import jax
import jax.numpy as jnp


def sync(x) -> None:
    """Force completion of queued device work (axon-safe)."""
    jnp.ravel(jnp.asarray(x))[0].item()


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            sync(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return statistics.mean(self._times) if self._times else float("nan")

    @property
    def p50(self) -> float:
        return statistics.median(self._times) if self._times else float("nan")

    def summary(self) -> str:
        if not self._times:
            return "no timed steps"
        return (
            f"steps={len(self._times)} mean={self.mean * 1e3:.2f}ms "
            f"p50={self.p50 * 1e3:.2f}ms "
            f"min={min(self._times) * 1e3:.2f}ms "
            f"max={max(self._times) * 1e3:.2f}ms"
        )


def tiles_per_sec(timer: StepTimer, batch: int, tile_px: int,
                  n_chips: Optional[int] = None, ref_px: int = 512) -> float:
    """512^2-equivalent tiles/sec/chip from a StepTimer (north-star metric)."""
    n_chips = n_chips or len(jax.devices())
    scale = (tile_px / ref_px) ** 2
    return batch * scale / timer.mean / n_chips


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'):`` — emits a profiler trace for TensorBoard
    / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)
