"""Structured timing, logging, and profiling.

The reference's telemetry is ad-hoc ``time.time()`` + ``print`` spans
around assembly / translate / solve (ref optical_flow.py:831, 1073-1076,
1106-1109, 1149-1157) and an unused module logger (:19-22).  The engine
formalises that:

* :class:`Timer` / :func:`span` — named wall-clock spans with a process-
  wide registry (the reference's printed phases become queryable records);
* :func:`format_elapsed_time` — API-parity helper (ref :1212-1238);
* :func:`profile_trace` — a jax.profiler trace context for per-phase
  device profiling (gradients / matvec / solve / halo).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

logger = logging.getLogger("opticalflow_tpu")

_SPANS: Dict[str, List[float]] = defaultdict(list)


def format_elapsed_time(time_difference: float) -> Tuple[int, int, int]:
    """(minutes, seconds, milliseconds) of a wall-clock difference
    (API parity with ref :1212-1238)."""
    minutes = int(time_difference // 60)
    seconds = int(time_difference % 60)
    milliseconds = int((time_difference - int(time_difference)) * 1000)
    return minutes, seconds, milliseconds


@contextlib.contextmanager
def span(name: str, log: bool = False) -> Iterator[None]:
    """Record a named wall-clock span into the process registry."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        _SPANS[name].append(elapsed)
        if log:
            logger.info("%s: %.3fs", name, elapsed)


def span_statistics() -> Dict[str, Dict[str, float]]:
    """Summary (count/total/mean/min/max) of all recorded spans."""
    out = {}
    for name, values in _SPANS.items():
        out[name] = {
            "count": len(values),
            "total": sum(values),
            "mean": sum(values) / len(values),
            "min": min(values),
            "max": max(values),
        }
    return out


def reset_spans() -> None:
    _SPANS.clear()


def record_span(name: str, seconds: float) -> None:
    """Record an externally measured duration into the span registry
    (used by the per-phase solver profiler, where phase durations are
    derived by subtraction of cumulative timings rather than wrapped)."""
    _SPANS[name].append(seconds)


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard-viewable) around a block."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Simple reusable timer with the reference's print format."""

    def __init__(self, name: str = "elapsed"):
        self.name = name
        self.start = None
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        _SPANS[self.name].append(self.elapsed)
        return False

    def report(self) -> str:
        minutes, seconds, milliseconds = format_elapsed_time(self.elapsed)
        return f"{self.name}: {minutes} minutes, {seconds} seconds, {milliseconds} milliseconds"
