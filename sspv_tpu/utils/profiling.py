#!/usr/bin/env python3
"""Profiling helpers.

The reference's only perf instrumentation is a wall-clock real-time factor
(demo.py:76-77); here we add first-class helpers: a wall-clock RealTimeFactor
timer and an optional ``jax.profiler`` trace context for TensorBoard-style
device profiles (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["RealTimeFactor", "device_trace"]


class RealTimeFactor:
    """Measure wall time against audio duration.

    >>> rtf = RealTimeFactor(audio_seconds=2.0)
    >>> with rtf:
    ...     process()
    >>> rtf.factor   # processing_time / duration  (lower is better)
    >>> rtf.speedup  # duration / processing_time  (x real-time)
    """

    def __init__(self, audio_seconds: float):
        self.audio_seconds = float(audio_seconds)
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False

    @property
    def factor(self) -> float:
        if self.audio_seconds:
            return self.elapsed / self.audio_seconds
        # zero audio with nonzero wall time is infinitely slow per audio
        # second, not 0 (the best possible reading)
        return float("inf") if self.elapsed else 0.0

    @property
    def speedup(self) -> float:
        if self.elapsed:
            return self.audio_seconds / self.elapsed
        # an unmeasurably fast run is inf x real-time, not 0 x
        return float("inf") if self.audio_seconds else 0.0


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir`` (viewable with
    TensorBoard / xprof). No-ops gracefully if the profiler is unavailable."""
    try:
        import jax

        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:  # profiler (or jax itself) unavailable: no-op
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
