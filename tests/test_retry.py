"""Retry-path tests for the axon-transient hardening.

The round-3 driver bench snapshot died rc=1 on a transient ``UNAVAILABLE``
at backend init because ``bench.py`` had no retry (round-3 verdict, weak #1).
These tests exercise ``insarseg/utils/retry.py`` and the ``bench.py`` sweep
retry with faked raisers — no device, no sleeping.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import pytest

from insarseg.utils.retry import is_transient, retry_transient


def test_transient_retries_then_succeeds():
    calls, sleeps = [], []

    def fn():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")
        return 42

    out = retry_transient(fn, retries=3, sleep_s=2.0, backoff=2.0,
                          _sleep=sleeps.append)
    assert out == 42
    assert len(calls) == 3
    assert sleeps == [2.0, 4.0]  # backoff applied between attempts


def test_non_transient_raises_immediately():
    calls = []

    def fn():
        calls.append(1)
        raise ValueError("bad shape (8, 3)")

    with pytest.raises(ValueError):
        retry_transient(fn, retries=3, _sleep=lambda s: None)
    assert len(calls) == 1  # no retries burned on a deterministic failure


def test_transient_exhausts_retries():
    calls = []

    def fn():
        calls.append(1)
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    with pytest.raises(RuntimeError, match="FAILED_PRECONDITION"):
        retry_transient(fn, retries=2, _sleep=lambda s: None)
    assert len(calls) == 3


def test_is_transient_walks_cause_chain():
    try:
        try:
            raise RuntimeError("DEADLINE_EXCEEDED waiting for remote compile")
        except RuntimeError as inner:
            raise ValueError("wrapper") from inner
    except ValueError as outer:
        assert is_transient(outer)
    assert not is_transient(ValueError("plain error"))


def test_custom_markers_narrow_and_walk_chain():
    """Regression (round-4 advisor, low): a caller's ``markers`` must be the
    ONLY retry set (defaults not OR'd back in) and must match through the
    exception chain, not just the top-level message."""
    calls = []

    def fn_default_marker():
        calls.append(1)
        raise RuntimeError("UNAVAILABLE: tunnel dropped")

    # narrowed markers: the default-transient UNAVAILABLE must NOT retry
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        retry_transient(fn_default_marker, retries=3,
                        markers=("MY_FLAKY",), _sleep=lambda s: None)
    assert len(calls) == 1

    # custom marker buried in the __cause__ chain must retry
    calls2 = []

    def fn_chained():
        calls2.append(1)
        if len(calls2) < 2:
            try:
                raise OSError("MY_FLAKY disk hiccup")
            except OSError as inner:
                raise RuntimeError("wrapper") from inner
        return "ok"

    out = retry_transient(fn_chained, retries=3, markers=("MY_FLAKY",),
                          _sleep=lambda s: None)
    assert out == "ok" and len(calls2) == 2


def test_bench_sweep_retries_transient_and_breaks_on_oom(monkeypatch):
    """bench._sweep: a transient drop is retried in place; a deterministic
    failure (the OOM pattern at the largest batch) stops the sweep."""
    monkeypatch.setattr(time, "sleep", lambda s: None)
    import bench

    calls = []

    def predict(x):
        calls.append(x.shape[0])
        if len(calls) == 1:  # first call at batch 1: transient drop
            raise RuntimeError("UNAVAILABLE: tunnel dropped the call")
        if x.shape[0] >= 4:  # largest batch: deterministic OOM-style error
            raise ValueError("RESOURCE allocation of 99GB failed")
        return x

    best = bench._sweep(predict, lambda b: jnp.ones((b,)), (1, 2, 4),
                        n_chips=1)
    # batch 1 survived its transient via retry, batch 2 measured, batch 4
    # broke the sweep — throughput is nonzero and batch 4 was tried once
    assert best > 0
    assert calls.count(4) == 1
    assert calls.count(1) >= 2  # the retried attempt actually re-ran
