#!/usr/bin/env python3
"""Pitch-period detection from short-time autocorrelation.

The reference exposes the building blocks (autocorrelation + AMDF,
time_features.py:52-104) and its docs describe ACF peak-picking for pitch;
BASELINE.json's config list names "autocorrelation pitch-period detection on
VAD-gated voiced segments" as a benchmark config. This module provides the
batched TPU implementation:

- ``pitch_from_frames``: per-frame F0 via the ACF peak in a plausible lag
  band (default 50..400 Hz), vectorized over all frames at once;
- VAD gating: frames marked unvoiced get F0 = 0;
- an optional normalized-ACF voicing confidence.

All lag arithmetic is static; the argmax over the banded lag axis runs on
the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .time_features import calculate_short_time_autocorrelation

__all__ = ["pitch_from_frames", "pitch_track"]


@functools.partial(
    jax.jit, static_argnames=("sample_rate", "fmin", "fmax")
)
def pitch_from_frames(
    frames: jnp.ndarray,
    sample_rate: int = 16000,
    fmin: float = 50.0,
    fmax: float = 400.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame pitch estimate from the autocorrelation peak.

    Parameters
    ----------
    frames : (num_frames, frame_size) float32 (windowed or raw)
    sample_rate : audio sample rate in Hz
    fmin, fmax : F0 search band in Hz

    Returns
    -------
    (f0, confidence): both (num_frames,) float32. ``f0`` is the frequency of
    the strongest normalized-ACF peak within [fmin, fmax]; ``confidence`` is
    that peak's normalized ACF value in [0, 1]-ish (can dip below 0 for
    aperiodic frames).
    """
    x = jnp.asarray(frames, dtype=jnp.float32)
    frame_size = x.shape[-1]
    lag_min = max(1, int(sample_rate / fmax))
    lag_max = min(frame_size - 1, int(sample_rate / fmin))
    acf = calculate_short_time_autocorrelation(x, lag_max)  # (F, lag_max+1)
    r0 = jnp.maximum(acf[:, 0], jnp.float32(1e-10))
    band = acf[:, lag_min : lag_max + 1] / r0[:, None]
    best = jnp.argmax(band, axis=1)
    confidence = jnp.take_along_axis(band, best[:, None], axis=1)[:, 0]
    lags = (best + lag_min).astype(jnp.float32)
    f0 = jnp.float32(sample_rate) / lags
    return f0.astype(jnp.float32), confidence.astype(jnp.float32)


def pitch_track(
    frames,
    vad,
    sample_rate: int = 16000,
    fmin: float = 50.0,
    fmax: float = 400.0,
    min_confidence: float = 0.3,
):
    """VAD-gated pitch track: F0 per frame, 0 where unvoiced or where the ACF
    peak is weaker than ``min_confidence``."""
    f0, conf = pitch_from_frames(frames, sample_rate, fmin, fmax)
    gate = (jnp.asarray(vad) > 0) & (conf >= jnp.float32(min_confidence))
    return jnp.where(gate, f0, 0.0).astype(jnp.float32), conf
