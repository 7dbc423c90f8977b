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
    "autocorrelation_via_dft",
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


@functools.lru_cache(maxsize=8)
def _acf_dft_bases(frame_size: int, max_lag: int):
    """Host-precomputed real-DFT and inverse-cosine bases for the
    Wiener-Khinchin ACF (float64 build, rounded once to float32).

    ``nfft >= frame_size + max_lag`` makes the circular correlation equal the
    linear one for lags 0..max_lag (no wrap-around), rounded up to a multiple
    of 128 so every matmul operand tiles the MXU lanes cleanly.
    """
    import numpy as np

    nfft = frame_size + max_lag
    nfft = -(-nfft // 128) * 128
    k = nfft // 2 + 1
    n = np.arange(frame_size, dtype=np.float64)[:, None]
    ks = np.arange(k, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * ks / nfft
    cos_b = np.cos(ang).astype(np.float32)  # (frame_size, k)
    sin_b = np.sin(ang).astype(np.float32)
    # inverse: R[lag] = (1/nfft) * sum_k w_k |X_k|^2 cos(2*pi*k*lag/nfft),
    # w_k = 2 except the DC and (even-nfft) Nyquist bins
    lags = np.arange(max_lag + 1, dtype=np.float64)[None, :]
    w = np.full((k, 1), 2.0)
    w[0, 0] = 1.0
    if nfft % 2 == 0:
        w[-1, 0] = 1.0
    inv = (
        w * np.cos(2.0 * np.pi * np.arange(k, dtype=np.float64)[:, None] * lags / nfft)
        / nfft
    ).astype(np.float32)  # (k, max_lag+1)
    return cos_b, sin_b, inv


@functools.lru_cache(maxsize=8)
def _acf_dft_bases_merged(frame_size: int, max_lag: int):
    """MXU-tiled repacking of :func:`_acf_dft_bases` (same trick as
    ``bases.merged_windowed_dft_bases``): the live cos/sin bins pack into one
    ``(frame_size, nfft)`` basis whose lane dimension is the 128-rounded
    ``nfft`` itself, and the Nyquist bin (sin column identically zero, cos
    column the +/-1 alternation; always present — nfft is rounded to a
    multiple of 128, hence even) is peeled off as a matvec plus a rank-1
    inverse term.

    Returns ``(merged (frame, nfft), nyq (frame,), inv_live (nfft//2, L+1),
    inv_nyq (L+1,))`` with
    ``acf = p_live @ inv_live + p_nyq[:, None] * inv_nyq[None, :]``.
    """
    import numpy as np

    cos_b, sin_b, inv = _acf_dft_bases(frame_size, max_lag)
    half = cos_b.shape[1] - 1  # nfft // 2
    merged = np.ascontiguousarray(
        np.concatenate([cos_b[:, :half], sin_b[:, :half]], axis=1)
    )
    return (
        merged,
        np.ascontiguousarray(cos_b[:, half]),
        np.ascontiguousarray(inv[:half]),
        np.ascontiguousarray(inv[half]),
    )


@functools.partial(jax.jit, static_argnames=("max_lag",))
def autocorrelation_via_dft(frames: jnp.ndarray, max_lag: int) -> jnp.ndarray:
    """Short-time autocorrelation 0..max_lag via Wiener-Khinchin as three
    MXU matmuls: power spectrum from a real-DFT matmul pair, then an
    inverse-cosine matmul back to the lag domain.

    Same contract as :func:`calculate_short_time_autocorrelation`; values
    agree at the ~1e-6 relative level (float32 matmuls at HIGHEST precision
    vs the direct sliding sums — tests pin the NMSE). Preferable on TPU for
    large lag counts: the unrolled direct form re-reads the frame block once
    per lag (~max_lag x the HBM traffic), while this form moves each operand
    once and puts the arithmetic on the MXU.
    """
    x = jnp.asarray(frames, dtype=jnp.float32)
    num_frames = x.shape[0] if x.ndim == 2 else 0
    if num_frames == 0 or x.size == 0 or max_lag < 0:
        return jnp.zeros((num_frames, max(0, max_lag + 1)), dtype=jnp.float32)
    merged, nyq_b, inv_live, inv_nyq = _acf_dft_bases_merged(
        int(x.shape[-1]), int(max_lag)
    )
    half = merged.shape[1] // 2
    hp = jax.lax.Precision.HIGHEST
    m = jnp.matmul(x, jnp.asarray(merged), precision=hp,
                   preferred_element_type=jnp.float32)
    nyq = jnp.matmul(x, jnp.asarray(nyq_b), precision=hp,
                     preferred_element_type=jnp.float32)
    power = m[:, :half] * m[:, :half] + m[:, half:] * m[:, half:]
    return (
        jnp.matmul(power, jnp.asarray(inv_live), precision=hp,
                   preferred_element_type=jnp.float32)
        + (nyq * nyq)[:, None] * jnp.asarray(inv_nyq)[None, :]
    )


@functools.partial(jax.jit, static_argnames=("max_lag", "lag_start"))
def calculate_average_magnitude_difference(
    frames: jnp.ndarray, max_lag: int, lag_start: int = 1
) -> jnp.ndarray:
    """Average magnitude difference function for lags ``lag_start..max_lag``.

    ``lag_start=1`` is the reference surface (rtvp time_features.py:79-104:
    all lags from 1). Callers that only consume a lag band (the AMDF pitch
    tracker searches ``lag_min..lag_max``) pass a higher start so the
    below-band columns — one unrolled slice+abs+mean subgraph each — are
    never traced at all, instead of being computed and discarded.
    """
    x = jnp.asarray(frames, dtype=jnp.float32)
    num_frames = x.shape[0] if x.ndim == 2 else 0
    lag_start = max(1, int(lag_start))
    if num_frames == 0 or x.size == 0 or max_lag < lag_start:
        return jnp.zeros(
            (num_frames, max(0, max_lag - lag_start + 1)), dtype=jnp.float32
        )
    cols = []
    for lag in range(lag_start, max_lag + 1):
        diff = jnp.abs(x[:, :-lag] - x[:, lag:])
        cols.append(jnp.mean(diff, axis=1))
    return jnp.stack(cols, axis=1).astype(jnp.float32)
