#!/usr/bin/env python3
"""Time-domain features over ``(num_frames, frame_size)`` batches, in JAX.

Contracts match the reference (``signal_processing/time_features.py``):

- short-time energy: ``sum(frames**2, axis=1)`` in float32 (:12-28);
- zero-crossing rate: sign-change count / frame_size, with NumPy ``sign``
  semantics (zeros produce their own sign level; **no DC removal, no /2**)
  (:31-49);
- autocorrelation: ``R[:, lag] = sum(frames[:, :-lag] * frames[:, lag:])`` for
  lag 0..max_lag, shape ``(num_frames, max_lag+1)`` (:52-76);
- AMDF: ``mean(|frames[:, :-lag] - frames[:, lag:]|)`` for lag 1..max_lag,
  shape ``(num_frames, max_lag)`` (:79-104).

TPU notes: the lag loops are unrolled at trace time (``max_lag`` is static),
producing a fused stack of vectorized multiply-reduces — no per-frame Python.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "calculate_short_time_energy",
    "calculate_zero_crossing_rate",
    "calculate_short_time_autocorrelation",
    "calculate_average_magnitude_difference",
]


def calculate_short_time_energy(frames: jnp.ndarray) -> jnp.ndarray:
    """Per-frame short-time energy, float32, shape ``(num_frames,)``."""
    x = jnp.asarray(frames, dtype=jnp.float32)
    if x.size == 0:
        return jnp.zeros((0,), dtype=jnp.float32)
    return jnp.sum(x * x, axis=-1).astype(jnp.float32)


def calculate_zero_crossing_rate(frames: jnp.ndarray) -> jnp.ndarray:
    """Per-frame zero-crossing rate, float32, shape ``(num_frames,)``."""
    x = jnp.asarray(frames, dtype=jnp.float32)
    if x.size == 0:
        return jnp.zeros((0,), dtype=jnp.float32)
    signs = jnp.sign(x)
    crossings = jnp.sum(jnp.abs(jnp.diff(signs, axis=-1)) > 0, axis=-1)
    return crossings.astype(jnp.float32) / jnp.float32(x.shape[-1])


@functools.partial(jax.jit, static_argnames=("max_lag",))
def calculate_short_time_autocorrelation(
    frames: jnp.ndarray, max_lag: int
) -> jnp.ndarray:
    """Short-time autocorrelation up to ``max_lag`` inclusive."""
    x = jnp.asarray(frames, dtype=jnp.float32)
    num_frames = x.shape[0] if x.ndim == 2 else 0
    if num_frames == 0 or x.size == 0 or max_lag < 0:
        return jnp.zeros((num_frames, max(0, max_lag + 1)), dtype=jnp.float32)
    cols = []
    for lag in range(max_lag + 1):
        a = x if lag == 0 else x[:, :-lag]
        b = x[:, lag:]
        cols.append(jnp.sum(a * b, axis=1))
    return jnp.stack(cols, axis=1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_lag",))
def calculate_average_magnitude_difference(
    frames: jnp.ndarray, max_lag: int
) -> jnp.ndarray:
    """Average magnitude difference function for lags 1..max_lag."""
    x = jnp.asarray(frames, dtype=jnp.float32)
    num_frames = x.shape[0] if x.ndim == 2 else 0
    if num_frames == 0 or x.size == 0 or max_lag <= 0:
        return jnp.zeros((num_frames, max(0, max_lag)), dtype=jnp.float32)
    cols = []
    for lag in range(1, max_lag + 1):
        diff = jnp.abs(x[:, :-lag] - x[:, lag:])
        cols.append(jnp.mean(diff, axis=1))
    return jnp.stack(cols, axis=1).astype(jnp.float32)
