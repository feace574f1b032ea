"""Transient-failure retry for the axon TPU tunnel.

The experimental axon PJRT tunnel occasionally drops a single call — or the
initial backend handshake — with a transient error (``UNAVAILABLE``,
``FAILED_PRECONDITION: TPU backend error``, ``DEADLINE_EXCEEDED``); the chip
recovers by itself within seconds (CLAUDE.md, round-2/3 field notes; the
round-3 driver bench snapshot died on exactly this at backend init).
Driver-facing entry points (``bench.py``, ``__graft_entry__.py``) and long
sweeps therefore route backend init and each measurement through
:func:`retry_transient`. Deterministic failures (bad path, OOM, shape error)
are re-raised immediately — retrying those would only waste minutes-long
remote compiles.

The reference has no analog (single-GPU scripts, no remote backend); this is
TPU-tunnel operational hardening.
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Sequence, TypeVar

T = TypeVar("T")

# Substrings that mark an axon-tunnel transient (same set that
# benchmarks/preset_sweep.py greps from CLI stderr).
TRANSIENT_MARKERS: tuple[str, ...] = (
    "UNAVAILABLE",
    "FAILED_PRECONDITION",
    "TPU backend error",
    "DEADLINE_EXCEEDED",
    "backend setup/compile error",
)


def is_transient(
    exc: BaseException, markers: Sequence[str] = TRANSIENT_MARKERS
) -> bool:
    """True if the exception chain carries one of ``markers`` (defaults to
    the axon-transient set). The chain (``__cause__``/``__context__``) is
    walked so wrapped tunnel errors still match."""
    seen = set()
    while exc is not None and id(exc) not in seen:
        seen.add(id(exc))
        msg = f"{type(exc).__name__}: {exc}"
        if any(m in msg for m in markers):
            return True
        exc = exc.__cause__ or exc.__context__
    return False


def _reset_backends() -> None:
    """Drop jax's cached (possibly failed) backend so the retry re-inits.

    jax caches backend-init results; without this, a failed ``jax.devices()``
    would re-raise the stored error on every retry. Best-effort: the API is
    in ``jax.extend`` and may move.
    """
    try:
        import jax.extend.backend

        jax.extend.backend.clear_backends()
    except Exception as e:  # pragma: no cover - depends on jax internals
        print(f"retry: clear_backends failed ({type(e).__name__})",
              file=sys.stderr)


def retry_transient(
    fn: Callable[[], T],
    *,
    what: str = "call",
    retries: int = 3,
    sleep_s: float = 20.0,
    backoff: float = 1.5,
    reset_backend: bool = False,
    markers: Sequence[str] = TRANSIENT_MARKERS,
    _sleep: Callable[[float], None] | None = None,
) -> T:
    """Run ``fn()``, retrying up to ``retries`` times on transient errors.

    Only exceptions whose chain matches ``markers`` are retried; anything
    else propagates immediately — a custom ``markers`` NARROWS the retry set
    (the default set is not OR'd back in), and is matched against the whole
    ``__cause__``/``__context__`` chain, not just the top-level exception.
    ``reset_backend=True`` additionally clears jax's cached backends between
    attempts (required when the guarded call is the backend init itself).
    ``_sleep`` is injectable for tests (defaults to ``time.sleep``, resolved
    at call time so monkeypatching works).
    """
    if _sleep is None:
        _sleep = time.sleep
    delay = sleep_s
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:
            seen = f"{type(e).__name__}: {e}"
            transient = is_transient(e, markers)
            if attempt >= retries or not transient:
                raise
            print(
                f"transient backend error in {what} "
                f"(attempt {attempt + 1}/{retries + 1}): "
                f"{seen[:300]} — retrying in {delay:.0f}s",
                file=sys.stderr,
            )
            if reset_backend:
                _reset_backends()
            _sleep(delay)
            delay *= backoff
    raise AssertionError("unreachable")  # pragma: no cover
