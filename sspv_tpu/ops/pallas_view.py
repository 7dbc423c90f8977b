#!/usr/bin/env python3
"""Fused Pallas TPU kernel for the SIGNAL-VIEW hot path (50%-overlap geometry).

The shipped offline path (`FeaturePipeline._features_from_rows`) is XLA-fused
hop-phase matmuls; its measured bottleneck is HBM traffic on materialized
intermediates — the ``(F, n_fft)`` DFT output (~3 GB per 4 h call) is written
to HBM by the matmul and read back by the power/mel/entropy fusions
(docs/benchmarks.md, "HBM-bound on materialized intermediates"). This kernel
keeps every intermediate in VMEM: for each block of BF frames it

    assembles the (BF, frame_size) frame tile from two hop rows (VMEM copy,
        never materialized in HBM)
    -> short-time energy + zero-crossing rate (VPU)
    -> merged windowed-DFT matmul via MANUAL 3-pass bf16 (MXU) -> power
    -> mel (3-pass bf16 MXU) -> log -> DCT (3-pass bf16) -> lifter  => MFCC
    -> normalized-PSD Shannon entropy (VPU)

and writes only the per-frame feature columns back to HBM (~100 MB per 4 h
call instead of ~11 GB of intermediates).

The manual 3-pass split exists because Mosaic has no bf16_3x (``HIGH``)
dot lowering — the r3 frames-path kernel lost its A/B partly by running
f32-accurate 6-pass dots against XLA's 3-pass "high" default
(docs/benchmarks.md, Pallas scope). Splitting each operand into
``hi = bf16(x)`` and ``lo = bf16(x - f32(hi))`` and summing the three
significant cross products (hi*hi + hi*lo + lo*hi) reproduces the bf16_3x
algorithm in-kernel; measured NMSE vs the float64 oracle is the same order
as XLA "high" (tests/test_pallas_view.py).

Scope: requires frame_size == 2*hop_size, even n_fft, a single shared
spectrum (entropy_n_fft == n_fft), and a strictly positive window (the view
trick needs sign(x*w) == sign(x)). The wrapper's caller gates on these and
falls back to the XLA view path otherwise. Replaces the reference's
per-frame loop semantics exactly (rtvp engine.py:240-297, batched).

On non-TPU backends the kernel runs in interpreter mode so the CPU test
suite exercises the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_common import block_specs

__all__ = ["fused_view_features", "fused_view_pitch"]

_DN = (((1,), (0,)), ((), ()))


def _pick_block_frames(f: int) -> int:
    """Grid-step frame count: ``Config.TPU_VIEW_BLOCK_FRAMES`` (r3 sweep
    winner 1024), shrunk to the padded frame count for short inputs. Always
    a multiple of 8 (f32 sublane tile).

    Read at TRACE time: jitted callers (``pitch_track_signal``, the
    pipeline's signal programs) bake the value into the compiled program,
    so flipping the knob after a shape has been traced silently keeps the
    old grid step for that shape — set it (env ``RTP_TPU_VIEW_BLOCK_FRAMES``)
    before the first dispatch/warmup. Non-jitted callers re-read it per
    call, but their inner ``_fused_*_call`` still caches per
    ``block_frames`` value."""
    from ..config import Config

    bf = int(getattr(Config, "TPU_VIEW_BLOCK_FRAMES", 1024) or 1024)
    bf = max(8, -(-bf // 8) * 8)
    return bf if f >= bf else max(8, -(-f // 8) * 8)


def _split_bf16(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-term bf16 decomposition: x ~= f32(hi) + f32(lo)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, b_hi, b_lo) -> jnp.ndarray:
    """bf16_3x matmul: the three significant cross products of the split
    operands, each a native bf16 MXU dot with f32 accumulation (the lo*lo
    term is below f32 resolution and is dropped, as in XLA's HIGH)."""
    kw = dict(dimension_numbers=_DN, preferred_element_type=jnp.float32)
    return (
        jax.lax.dot_general(a_hi, b_hi, **kw)
        + jax.lax.dot_general(a_hi, b_lo, **kw)
        + jax.lax.dot_general(a_lo, b_hi, **kw)
    )


def _view_kernel(
    top_ref,
    bot_ref,
    w2_ref,
    nyqc_ref,
    mhi_ref,
    mlo_ref,
    fbhi_ref,
    fblo_ref,
    fbnyq_ref,
    dcthi_ref,
    dctlo_ref,
    lifter_ref,
    energy_ref,
    zcr_ref,
    entropy_ref,
    mfcc_ref,
    *,
    frame_size: int,
    half: int,
):
    # Frame tile: frame i = concat(rows[i], rows[i+1]) — assembled in VMEM,
    # never written to HBM (the whole point of this kernel).
    ft = jnp.concatenate([top_ref[:], bot_ref[:]], axis=1)  # (BF, frame)

    # Short-time energy: sum((x*w)^2) == sum(x^2 * w^2) (time_features.py:28);
    # full-f32 VPU reduction (more accurate than the XLA path's HIGH matvec).
    energy_ref[:] = jnp.sum(ft * ft * w2_ref[:], axis=1, keepdims=True)

    # ZCR on the raw tile (strictly positive window => sign(x*w) == sign(x);
    # time_features.py:47-49 NumPy sign semantics). The concat seam at column
    # hop-1 -> hop is two consecutive samples, so one diff covers the frame.
    signs = jnp.sign(ft)
    crossings = jnp.sum(
        (jnp.abs(signs[:, 1:] - signs[:, :-1]) > 0).astype(jnp.float32),
        axis=1,
        keepdims=True,
    )
    zcr_ref[:] = crossings / jnp.float32(frame_size)

    # Merged windowed-DFT (live bins 0..half-1, cos|sin side by side) as one
    # 3-pass bf16 MXU matmul; windowed Nyquist bin as a full-f32 VPU matvec.
    ft_hi, ft_lo = _split_bf16(ft)
    m = _dot3(ft_hi, ft_lo, mhi_ref[:], mlo_ref[:])  # (BF, n_fft)
    nyq = jnp.sum(ft * nyqc_ref[:], axis=1, keepdims=True)  # (BF, 1)
    power = m[:, :half] * m[:, :half] + m[:, half:] * m[:, half:]
    nyq2 = nyq * nyq

    # Mel -> log -> DCT -> lifter (frequency_features.py:147-158 + facade
    # lifter). The Nyquist bin's filterbank row is applied as a rank-1 VPU
    # term so the MXU contraction stays a clean K=half (multiple of 128).
    p_hi, p_lo = _split_bf16(power)
    mel = _dot3(p_hi, p_lo, fbhi_ref[:], fblo_ref[:]) + nyq2 * fbnyq_ref[:]
    mel = jnp.maximum(mel, jnp.float32(1e-10))
    lm = jnp.log(mel)
    lm_hi, lm_lo = _split_bf16(lm)
    mfcc = _dot3(lm_hi, lm_lo, dcthi_ref[:], dctlo_ref[:])
    mfcc_ref[:] = mfcc * lifter_ref[:]

    # Spectral entropy over the full half+1 bins, with the Nyquist term
    # peeled out of the reductions (frequency_features.py:183-196 semantics:
    # zero-total spectra normalize to 0 before the 1e-12 clamp).
    psum = jnp.sum(power, axis=1, keepdims=True) + nyq2
    pn = jnp.where(psum > 0, power / psum, jnp.float32(0.0))
    pn = jnp.maximum(pn, jnp.float32(1e-12))
    ent = -jnp.sum(pn * jnp.log(pn), axis=1, keepdims=True)
    qn = jnp.where(psum > 0, nyq2 / psum, jnp.float32(0.0))
    qn = jnp.maximum(qn, jnp.float32(1e-12))
    ent = ent - qn * jnp.log(qn)
    entropy_ref[:] = ent / jnp.float32(np.log(half + 1))


@functools.partial(
    jax.jit,
    static_argnames=("frame_size", "half", "num_filters", "num_ceps",
                     "block_frames"),
)
def _fused_view_call(
    top,
    bot,
    w2_row,
    nyqc_row,
    merged,
    fb_live,
    fb_nyq,
    dct,
    lifter_row,
    *,
    frame_size: int,
    half: int,
    num_filters: int,
    num_ceps: int,
    block_frames: int,
):
    f_pad = top.shape[0]
    grid = (f_pad // block_frames,)
    interpret, vmem_spec, const = block_specs()

    # Constant-operand bf16 splits, outside the kernel (tiny; XLA fuses or
    # folds them — merged is (frame, n_fft), the rest are smaller).
    mhi, mlo = _split_bf16(merged)
    fbhi, fblo = _split_bf16(fb_live)
    dcthi, dctlo = _split_bf16(dct)

    kernel = functools.partial(
        _view_kernel, frame_size=frame_size, half=half
    )
    n_fft = 2 * half
    out_shapes = (
        jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),  # energy
        jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),  # zcr
        jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),  # entropy
        jax.ShapeDtypeStruct((f_pad, num_ceps), jnp.float32),  # mfcc
    )
    hop = frame_size // 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem_spec((block_frames, hop), lambda i: (i, 0)),  # top
            vmem_spec((block_frames, hop), lambda i: (i, 0)),  # bot
            const((1, frame_size)),  # w2
            const((1, frame_size)),  # nyq col
            const((frame_size, n_fft)),  # merged hi
            const((frame_size, n_fft)),  # merged lo
            const((half, num_filters)),  # fb hi
            const((half, num_filters)),  # fb lo
            const((1, num_filters)),  # fb nyquist row
            const((num_filters, num_ceps)),  # dct hi
            const((num_filters, num_ceps)),  # dct lo
            const((1, num_ceps)),  # lifter
        ],
        out_specs=(
            vmem_spec((block_frames, 1), lambda i: (i, 0)),
            vmem_spec((block_frames, 1), lambda i: (i, 0)),
            vmem_spec((block_frames, 1), lambda i: (i, 0)),
            vmem_spec((block_frames, num_ceps), lambda i: (i, 0)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(top, bot, w2_row, nyqc_row, mhi, mlo, fbhi, fblo,
      jnp.asarray(fb_nyq, jnp.float32).reshape(1, num_filters),
      dcthi, dctlo, lifter_row)


def _pitch_kernel(
    top_ref,
    bot_ref,
    nyqc_ref,
    mhi_ref,
    mlo_ref,
    invhi_ref,
    invlo_ref,
    invnyq_ref,
    f0_ref,
    conf_ref,
    *,
    half: int,
    lag_min: int,
    lag_max: int,
    sample_rate: int,
):
    """Banded-ACF pitch for one block of frames, all intermediates in VMEM:
    frame tile -> merged ACF-DFT matmul (3-pass bf16) -> power -> inverse
    matmul back to lags (+ rank-1 Nyquist term) -> normalized band peak.

    Mirrors ``time_features.autocorrelation_via_dft`` +
    ``pitch._band_peak_pick`` (reference ACF semantics:
    rtvp/signal_processing/time_features.py:73-76)."""
    ft = jnp.concatenate([top_ref[:], bot_ref[:]], axis=1)  # raw frames
    ft_hi, ft_lo = _split_bf16(ft)
    m = _dot3(ft_hi, ft_lo, mhi_ref[:], mlo_ref[:])  # (BF, nfft)
    nyq = jnp.sum(ft * nyqc_ref[:], axis=1, keepdims=True)
    power = m[:, :half] * m[:, :half] + m[:, half:] * m[:, half:]
    p_hi, p_lo = _split_bf16(power)
    acf = _dot3(p_hi, p_lo, invhi_ref[:], invlo_ref[:]) + (
        nyq * nyq
    ) * invnyq_ref[:]  # (BF, lag_max+1)

    # Normalized band peak (pitch._band_peak_pick): argmax over the full lag
    # axis with out-of-band lags masked to -inf (avoids lane-slice relayouts).
    r0 = jnp.maximum(acf[:, :1], jnp.float32(1e-10))
    lags = jax.lax.broadcasted_iota(jnp.int32, acf.shape, 1)
    in_band = (lags >= lag_min) & (lags <= lag_max)
    band = jnp.where(in_band, acf / r0, jnp.float32(-jnp.inf))
    best = jnp.argmax(band, axis=1, keepdims=True)
    conf = jnp.max(band, axis=1, keepdims=True)
    f0_ref[:] = jnp.float32(sample_rate) / best.astype(jnp.float32)
    conf_ref[:] = conf


@functools.partial(
    jax.jit,
    static_argnames=("half", "lag_min", "lag_max", "sample_rate",
                     "block_frames"),
)
def _fused_pitch_call(
    top,
    bot,
    nyqc_row,
    merged,
    inv_live,
    inv_nyq_row,
    *,
    half: int,
    lag_min: int,
    lag_max: int,
    sample_rate: int,
    block_frames: int,
):
    f_pad = top.shape[0]
    grid = (f_pad // block_frames,)
    interpret, vmem_spec, const = block_specs()
    frame_size = top.shape[1] * 2
    n_fft = merged.shape[1]
    n_lags = inv_live.shape[1]
    hop = frame_size // 2

    mhi, mlo = _split_bf16(merged)
    invhi, invlo = _split_bf16(inv_live)

    kernel = functools.partial(
        _pitch_kernel, half=half, lag_min=lag_min, lag_max=lag_max,
        sample_rate=sample_rate,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem_spec((block_frames, hop), lambda i: (i, 0)),  # top
            vmem_spec((block_frames, hop), lambda i: (i, 0)),  # bot
            const((1, frame_size)),  # nyq col
            const((frame_size, n_fft)),  # merged hi
            const((frame_size, n_fft)),  # merged lo
            const((half, n_lags)),  # inv hi
            const((half, n_lags)),  # inv lo
            const((1, n_lags)),  # inv nyquist row
        ],
        out_specs=(
            vmem_spec((block_frames, 1), lambda i: (i, 0)),
            vmem_spec((block_frames, 1), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),  # f0
            jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),  # confidence
        ),
        interpret=interpret,
    )(top, bot, nyqc_row, mhi, mlo, invhi, invlo, inv_nyq_row)


def fused_view_pitch(
    rows: jnp.ndarray,
    *,
    merged: np.ndarray,
    nyq_b: np.ndarray,
    inv_live: np.ndarray,
    inv_nyq: np.ndarray,
    lag_min: int,
    lag_max: int,
    sample_rate: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused banded-ACF pitch from a ``(F+1, hop)`` signal view.

    Returns ``(f0, confidence)`` of shape ``(F,)`` each — the UNGATED track
    (the caller applies the VAD/confidence gate, as in
    ``pitch.pitch_track_signal``). ``merged``/``nyq_b``/``inv_live``/
    ``inv_nyq`` come from ``time_features._acf_dft_bases_merged``.
    """
    f = int(rows.shape[0]) - 1
    half = merged.shape[1] // 2
    n_lags = int(inv_live.shape[1])

    x = jnp.asarray(rows, jnp.float32)
    top, bot = x[:-1], x[1:]
    block_frames = _pick_block_frames(f)
    f_pad = -(-f // block_frames) * block_frames
    if f_pad != f:
        top = jnp.pad(top, ((0, f_pad - f), (0, 0)))
        bot = jnp.pad(bot, ((0, f_pad - f), (0, 0)))

    frame_size = int(merged.shape[0])
    f0, conf = _fused_pitch_call(
        top,
        bot,
        jnp.asarray(np.asarray(nyq_b, np.float32).reshape(1, frame_size)),
        jnp.asarray(merged),
        jnp.asarray(inv_live),
        jnp.asarray(np.asarray(inv_nyq, np.float32).reshape(1, n_lags)),
        half=half,
        lag_min=int(lag_min),
        lag_max=int(lag_max),
        sample_rate=int(sample_rate),
        block_frames=block_frames,
    )
    return f0[:f, 0], conf[:f, 0]


def fused_view_features(
    rows: jnp.ndarray,
    *,
    wm: np.ndarray,
    wnyq: np.ndarray,
    fb_t: np.ndarray,
    dct: np.ndarray,
    lifter: np.ndarray,
    window: np.ndarray,
) -> dict:
    """Fused per-frame features from a ``(F+1, hop)`` signal view.

    Same output dict as ``FeaturePipeline._features_from_rows`` (the XLA
    hop-phase path): energy/zcr/entropy ``(F,)`` + mfcc ``(F, num_ceps)``.
    ``wm``/``wnyq`` are the merged windowed-DFT bases
    (bases.merged_windowed_dft_bases); the caller gates on the supported
    geometry (see module docstring).
    """
    f = int(rows.shape[0]) - 1
    frame_size = int(wm.shape[0])
    n_fft = int(wm.shape[1])
    half = n_fft // 2
    num_filters = int(fb_t.shape[1])
    num_ceps = int(dct.shape[1])

    x = jnp.asarray(rows, jnp.float32)
    top, bot = x[:-1], x[1:]
    block_frames = _pick_block_frames(f)
    f_pad = -(-f // block_frames) * block_frames
    if f_pad != f:
        top = jnp.pad(top, ((0, f_pad - f), (0, 0)))
        bot = jnp.pad(bot, ((0, f_pad - f), (0, 0)))

    w = np.asarray(window, np.float64)
    w2_row = jnp.asarray((w * w).astype(np.float32).reshape(1, frame_size))
    nyqc_row = jnp.asarray(
        np.asarray(wnyq, np.float32).reshape(1, frame_size)
    )
    energy, zcr, entropy, mfcc = _fused_view_call(
        top,
        bot,
        w2_row,
        nyqc_row,
        jnp.asarray(wm),
        jnp.asarray(fb_t[:half]),
        np.asarray(fb_t[half], np.float32),
        jnp.asarray(dct),
        jnp.asarray(lifter, jnp.float32).reshape(1, num_ceps),
        frame_size=frame_size,
        half=half,
        num_filters=num_filters,
        num_ceps=num_ceps,
        block_frames=block_frames,
    )
    return {
        "energy": energy[:f, 0],
        "zcr": zcr[:f, 0],
        "entropy": entropy[:f, 0],
        "mfcc": mfcc[:f],
    }
