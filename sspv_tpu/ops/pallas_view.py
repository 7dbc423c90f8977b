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


def _use_transposed(f: int, block_frames: int) -> bool:
    """Whether the TRANSPOSED kernel orientation serves this call.

    Why transposed: XLA assigns the ``(F+1, hop)`` rows parameter a
    column-major ``{0,1}`` entry layout (row-major would pad hop=160 lanes
    to 256 — 37% wasted HBM), then pays a ~920 MB relayout copy
    (~3.7 ms/call in the r4 trace) to feed the row-major kernel operand.
    A ``{0,1}`` (F+1, hop) array is BIT-identical to a row-major
    ``(hop, F+1)`` transpose, so a kernel written in transposed orientation
    consumes ``rows.T`` as a FREE bitcast; per-frame gate outputs leave the
    kernel lane-major (no (F,1)->(F,) relayout reduces) and the mfcc block
    leaves as (num_ceps, F) whose ``.T`` is again a free bitcast to the
    ``{0,1}`` output layout XLA wants.

    Engagement gate (exhaustive):
    - ``block_frames % 128 == 0``: the per-step seam tile is a 128-lane
      block whose start ``(i+1)*block_frames`` must be lane-tile aligned.
    - ``f >= block_frames``: short inputs shrink the block to a non-128
      multiple; the rows-direct kernel serves them (their cost is trivial).
    - ``f % block_frames >= 127``: Mosaic CLAMPS out-of-range blocks. A
      clamped seam tile reads shifted values; the one frame that consumes
      step i's seam is frame ``(i+1)*bf - 1``, which is a REAL frame only
      when ``(i+1)*bf <= f``. With ``r = f % bf >= 127`` every multiple of
      ``bf`` that is ``<= f`` is also ``<= f+1-128``, so every clamped
      seam feeds only masked tail frames. (All shipped bucket lengths and
      the bench length satisfy r >= 127; exact multiples r == 0 and tiny
      remainders fall back to the rows-direct kernel.)
    - ``Config.TPU_VIEW_ORIENT`` == "rows" forces the rows-direct kernel
      (A/B escape hatch); "t" skips only the r-gate's fallback — the
      alignment gates above are correctness requirements and always hold.
    """
    from ..config import Config

    orient = str(getattr(Config, "TPU_VIEW_ORIENT", "auto") or "auto").lower()
    if orient == "rows":
        return False
    if block_frames % 128 or f < block_frames:
        return False
    return (f % block_frames) >= 127


def _seam_lane_spec(vmem_spec, hop: int, block_frames: int):
    """BlockSpec for the transposed seam: a 128-lane tile of ``xt`` whose
    first lane is column ``(i+1)*block_frames`` (the one extra sample column
    grid step i's shifted "bot" half needs). Requires the alignment gates of
    :func:`_use_transposed`."""
    step = block_frames // 128
    return vmem_spec((hop, 128), lambda i: (0, (i + 1) * step))


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


def _seam_rows(x: jnp.ndarray, f: int, block_frames: int) -> jnp.ndarray:
    """The per-grid-step seam rows: row ``(i+1)*block_frames`` of the rows
    view, as a tiny ``(nb, hop)`` strided gather (~1 MB for 4 h of audio).

    Grid step i's one-row-shifted "bot" half needs exactly one row beyond
    its own block. r4's first seam design padded the WHOLE rows array with
    8 headroom rows — a full ~920 MB HBM copy (4.5 ms/call in the trace)
    to provide values that matter only for the final frame. The strided
    gather provides the same rows for the cost of reading nb scattered
    tiles. A missing last seam row (f not a block multiple — every frame
    that would read it is padding and is sliced off) is zero-filled.

    Shaped ``(nb, 1, hop)``: Mosaic requires a block's last two dims to be
    (8, 128)-divisible OR equal to the array dims — a (1, hop) block over
    an (nb, hop) array fails that check, while a (1, 1, hop) block over
    (nb, 1, hop) passes (leading grid dims are unconstrained)."""
    nb = -(-f // block_frames)
    seams = x[block_frames::block_frames][:nb]
    if int(seams.shape[0]) < nb:
        seams = jnp.pad(
            seams, ((0, nb - int(seams.shape[0])), (0, 0))
        )
    return seams[:, None, :]


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
    rows_ref,
    seam_ref,
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
    # never written to HBM (the whole point of this kernel). The r4
    # roofline traced ~21 ms/call of HBM copies just BUILDING the r3
    # kernel's top/bot operands (a full slice plus two ~920 MB pads per 4 h
    # call — docs/benchmarks.md), so the kernel reads the UNPADDED
    # (F+1, hop) rows view directly: grid step i gets its bf-row block plus
    # ITS seam row (row (i+1)*bf, pre-gathered into a tiny (nb, hop) array
    # by _seam_rows), and the one-row-shifted "bot" half is a VMEM sublane
    # shift (~0.7 MB), not an HBM materialization. This also halves input
    # DMA (each row was previously fetched twice: as a top row and again
    # as a bot row).
    top = rows_ref[:]
    bot = jnp.concatenate([rows_ref[1:], seam_ref[0]], axis=0)
    ft = jnp.concatenate([top, bot], axis=1)  # (BF, frame)

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


def _view_kernel_t(
    xt_ref,
    seam_ref,
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
    """TRANSPOSED orientation of :func:`_view_kernel` (see
    :func:`_use_transposed` for why). Data flows as ``(feature_dim, BF)``
    tiles: frames are COLUMNS, the one-column-shifted "bot" half is a VMEM
    lane shift, reductions run along sublanes, and every matmul is
    ``basisT @ dataT`` — identical products to the row-major kernel (the
    bf16_3x split is per-element), with reduction trees along the other
    axis (same ~1e-7-level reassociation class as the hop-phase XLA path).
    Per-frame outputs leave as ``(1, BF)`` lane-major rows — no
    ``(F,1)->(F,)`` relayout downstream."""
    topT = xt_ref[:]  # (hop, BF)
    botT = jnp.concatenate([topT[:, 1:], seam_ref[:, :1]], axis=1)
    ftT = jnp.concatenate([topT, botT], axis=0)  # (frame, BF)

    energy_ref[:] = jnp.sum(ftT * ftT * w2_ref[:], axis=0, keepdims=True)

    signs = jnp.sign(ftT)
    crossings = jnp.sum(
        (jnp.abs(signs[1:, :] - signs[:-1, :]) > 0).astype(jnp.float32),
        axis=0,
        keepdims=True,
    )
    zcr_ref[:] = crossings / jnp.float32(frame_size)

    ft_hi, ft_lo = _split_bf16(ftT)
    m = _dot3(mhi_ref[:], mlo_ref[:], ft_hi, ft_lo)  # (n_fft, BF)
    nyq = jnp.sum(ftT * nyqc_ref[:], axis=0, keepdims=True)  # (1, BF)
    power = m[:half] * m[:half] + m[half:] * m[half:]  # (half, BF)
    nyq2 = nyq * nyq

    p_hi, p_lo = _split_bf16(power)
    mel = _dot3(fbhi_ref[:], fblo_ref[:], p_hi, p_lo) + fbnyq_ref[:] * nyq2
    mel = jnp.maximum(mel, jnp.float32(1e-10))
    lm = jnp.log(mel)
    lm_hi, lm_lo = _split_bf16(lm)
    mfcc = _dot3(dcthi_ref[:], dctlo_ref[:], lm_hi, lm_lo)  # (ceps, BF)
    mfcc_ref[:] = mfcc * lifter_ref[:]

    psum = jnp.sum(power, axis=0, keepdims=True) + nyq2
    pn = jnp.where(psum > 0, power / psum, jnp.float32(0.0))
    pn = jnp.maximum(pn, jnp.float32(1e-12))
    ent = -jnp.sum(pn * jnp.log(pn), axis=0, keepdims=True)
    qn = jnp.where(psum > 0, nyq2 / psum, jnp.float32(0.0))
    qn = jnp.maximum(qn, jnp.float32(1e-12))
    ent = ent - qn * jnp.log(qn)
    entropy_ref[:] = ent / jnp.float32(np.log(half + 1))


@functools.partial(
    jax.jit,
    static_argnames=("frame_size", "half", "num_filters", "num_ceps",
                     "block_frames"),
)
def _fused_view_call_t(
    xt,
    w2_col,
    nyqc_col,
    mergedT,
    fb_liveT,
    fb_nyq_col,
    dctT,
    lifter_col,
    *,
    frame_size: int,
    half: int,
    num_filters: int,
    num_ceps: int,
    block_frames: int,
):
    """Transposed-orientation fused call: ``xt`` is ``rows.T`` —
    ``(hop, F+1)``, a free bitcast of the column-major rows parameter. The
    seam is a second 128-lane VIEW of the same array (no strided gather in
    XLA, no extra operand materialization)."""
    f = xt.shape[1] - 1
    nb = -(-f // block_frames)
    interpret, vmem_spec, const = block_specs()

    mhi, mlo = _split_bf16(mergedT)
    fbhi, fblo = _split_bf16(fb_liveT)
    dcthi, dctlo = _split_bf16(dctT)

    kernel = functools.partial(
        _view_kernel_t, frame_size=frame_size, half=half
    )
    n_fft = 2 * half
    hop = frame_size // 2
    out_shapes = (
        jax.ShapeDtypeStruct((1, f), jnp.float32),  # energy
        jax.ShapeDtypeStruct((1, f), jnp.float32),  # zcr
        jax.ShapeDtypeStruct((1, f), jnp.float32),  # entropy
        jax.ShapeDtypeStruct((num_ceps, f), jnp.float32),  # mfcc (transposed)
    )
    lane_out = lambda rows_dim: vmem_spec(  # noqa: E731
        (rows_dim, block_frames), lambda i: (0, i)
    )
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            vmem_spec((hop, block_frames), lambda i: (0, i)),  # xt block
            _seam_lane_spec(vmem_spec, hop, block_frames),  # seam column
            const((frame_size, 1)),  # w2 column
            const((frame_size, 1)),  # nyquist basis column
            const((n_fft, frame_size)),  # mergedT hi
            const((n_fft, frame_size)),  # mergedT lo
            const((num_filters, half)),  # fbT hi
            const((num_filters, half)),  # fbT lo
            const((num_filters, 1)),  # fb nyquist column
            const((num_ceps, num_filters)),  # dctT hi
            const((num_ceps, num_filters)),  # dctT lo
            const((num_ceps, 1)),  # lifter column
        ],
        out_specs=(
            lane_out(1),
            lane_out(1),
            lane_out(1),
            lane_out(num_ceps),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(xt, xt, w2_col, nyqc_col, mhi, mlo, fbhi, fblo,
      fb_nyq_col, dcthi, dctlo, lifter_col)


@functools.partial(
    jax.jit,
    static_argnames=("frame_size", "half", "num_filters", "num_ceps",
                     "block_frames"),
)
def _fused_view_call(
    rows,
    seams,
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
    # rows is the UNPADDED (f+1, hop) view (the last main block is partial
    # — Pallas masks the tail reads; those lanes feed only discarded
    # frames); seams is the (nb, hop) per-step seam gather (_seam_rows)
    nb = seams.shape[0]
    grid = (nb,)
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
    # outputs sized to the TRUE frame count: the partial final write block
    # is masked by Pallas, so no (f_pad -> f) slice (75 MB read+write on a
    # 4 h mfcc) ever materializes downstream
    f = rows.shape[0] - 1
    out_shapes = (
        jax.ShapeDtypeStruct((f, 1), jnp.float32),  # energy
        jax.ShapeDtypeStruct((f, 1), jnp.float32),  # zcr
        jax.ShapeDtypeStruct((f, 1), jnp.float32),  # entropy
        jax.ShapeDtypeStruct((f, num_ceps), jnp.float32),  # mfcc
    )
    hop = frame_size // 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem_spec((block_frames, hop), lambda i: (i, 0)),  # rows
            vmem_spec((1, 1, hop), lambda i: (i, 0, 0)),  # seam row for i
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
    )(rows, seams, w2_row, nyqc_row, mhi, mlo, fbhi, fblo,
      jnp.asarray(fb_nyq, jnp.float32).reshape(1, num_filters),
      dcthi, dctlo, lifter_row)


def _pitch_kernel(
    rows_ref,
    seam_ref,
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
    rtvp/signal_processing/time_features.py:73-76). Rows-direct seam-block
    input (see _view_kernel): the frame tile assembles from the grid
    step's own row block plus an 8-row seam block, with no top/bot HBM
    materialization."""
    top = rows_ref[:]
    bot = jnp.concatenate([rows_ref[1:], seam_ref[0]], axis=0)
    ft = jnp.concatenate([top, bot], axis=1)  # raw frames
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
    rows,
    seams,
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
    nb = seams.shape[0]  # unpadded rows + seam gather (see _fused_view_call)
    grid = (nb,)
    interpret, vmem_spec, const = block_specs()
    frame_size = rows.shape[1] * 2
    f = rows.shape[0] - 1  # true frame count (masked partial final write)
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
            vmem_spec((block_frames, hop), lambda i: (i, 0)),  # rows
            vmem_spec((1, 1, hop), lambda i: (i, 0, 0)),  # seam row for i
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
            jax.ShapeDtypeStruct((f, 1), jnp.float32),  # f0
            jax.ShapeDtypeStruct((f, 1), jnp.float32),  # confidence
        ),
        interpret=interpret,
    )(rows, seams, nyqc_row, mhi, mlo, invhi, invlo, inv_nyq_row)


def _pitch_kernel_t(
    xt_ref,
    seam_ref,
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
    """TRANSPOSED orientation of :func:`_pitch_kernel` (see
    :func:`_use_transposed`): frames are columns, the ACF comes out as
    ``(n_lags, BF)``, and the band peak is an argmax along sublanes."""
    topT = xt_ref[:]
    botT = jnp.concatenate([topT[:, 1:], seam_ref[:, :1]], axis=1)
    ftT = jnp.concatenate([topT, botT], axis=0)  # (frame, BF)
    ft_hi, ft_lo = _split_bf16(ftT)
    m = _dot3(mhi_ref[:], mlo_ref[:], ft_hi, ft_lo)  # (n_fft, BF)
    nyq = jnp.sum(ftT * nyqc_ref[:], axis=0, keepdims=True)
    power = m[:half] * m[:half] + m[half:] * m[half:]  # (half, BF)
    p_hi, p_lo = _split_bf16(power)
    acf = _dot3(invhi_ref[:], invlo_ref[:], p_hi, p_lo) + invnyq_ref[:] * (
        nyq * nyq
    )  # (n_lags, BF)

    r0 = jnp.maximum(acf[:1], jnp.float32(1e-10))  # (1, BF)
    lags = jax.lax.broadcasted_iota(jnp.int32, acf.shape, 0)
    in_band = (lags >= lag_min) & (lags <= lag_max)
    band = jnp.where(in_band, acf / r0, jnp.float32(-jnp.inf))
    best = jnp.argmax(band, axis=0, keepdims=True)
    conf = jnp.max(band, axis=0, keepdims=True)
    f0_ref[:] = jnp.float32(sample_rate) / best.astype(jnp.float32)
    conf_ref[:] = conf


@functools.partial(
    jax.jit,
    static_argnames=("half", "lag_min", "lag_max", "sample_rate",
                     "block_frames"),
)
def _fused_pitch_call_t(
    xt,
    nyqc_col,
    mergedT,
    inv_liveT,
    inv_nyq_col,
    *,
    half: int,
    lag_min: int,
    lag_max: int,
    sample_rate: int,
    block_frames: int,
):
    f = xt.shape[1] - 1
    nb = -(-f // block_frames)
    interpret, vmem_spec, const = block_specs()
    hop = xt.shape[0]
    frame_size = hop * 2
    n_fft = mergedT.shape[0]
    n_lags = inv_liveT.shape[0]

    mhi, mlo = _split_bf16(mergedT)
    invhi, invlo = _split_bf16(inv_liveT)

    kernel = functools.partial(
        _pitch_kernel_t, half=half, lag_min=lag_min, lag_max=lag_max,
        sample_rate=sample_rate,
    )
    lane_out = lambda: vmem_spec(  # noqa: E731
        (1, block_frames), lambda i: (0, i)
    )
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            vmem_spec((hop, block_frames), lambda i: (0, i)),  # xt block
            _seam_lane_spec(vmem_spec, hop, block_frames),  # seam column
            const((frame_size, 1)),  # nyq basis column
            const((n_fft, frame_size)),  # mergedT hi
            const((n_fft, frame_size)),  # mergedT lo
            const((n_lags, half)),  # invT hi
            const((n_lags, half)),  # invT lo
            const((n_lags, 1)),  # inv nyquist column
        ],
        out_specs=(lane_out(), lane_out()),
        out_shape=(
            jax.ShapeDtypeStruct((1, f), jnp.float32),  # f0
            jax.ShapeDtypeStruct((1, f), jnp.float32),  # confidence
        ),
        interpret=interpret,
    )(xt, xt, nyqc_col, mhi, mlo, invhi, invlo, inv_nyq_col)


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
    block_frames = _pick_block_frames(f)
    frame_size = int(merged.shape[0])
    if _use_transposed(f, block_frames):
        f0t, conft = _fused_pitch_call_t(
            x.T,  # free bitcast of the {0,1} rows parameter
            jnp.asarray(np.asarray(nyq_b, np.float32).reshape(frame_size, 1)),
            jnp.asarray(np.ascontiguousarray(np.asarray(merged).T)),
            jnp.asarray(np.ascontiguousarray(np.asarray(inv_live).T)),
            jnp.asarray(np.asarray(inv_nyq, np.float32).reshape(n_lags, 1)),
            half=half,
            lag_min=int(lag_min),
            lag_max=int(lag_max),
            sample_rate=int(sample_rate),
            block_frames=block_frames,
        )
        return f0t[0], conft[0]
    seams = _seam_rows(x, f, block_frames)
    f0, conf = _fused_pitch_call(
        x,
        seams,
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
    block_frames = _pick_block_frames(f)

    w = np.asarray(window, np.float64)
    if _use_transposed(f, block_frames):
        energy, zcr, entropy, mfccT = _fused_view_call_t(
            x.T,  # free bitcast of the {0,1} rows parameter
            jnp.asarray(
                (w * w).astype(np.float32).reshape(frame_size, 1)
            ),
            jnp.asarray(np.asarray(wnyq, np.float32).reshape(frame_size, 1)),
            jnp.asarray(np.ascontiguousarray(np.asarray(wm).T)),
            jnp.asarray(np.ascontiguousarray(np.asarray(fb_t[:half]).T)),
            jnp.asarray(np.asarray(fb_t[half], np.float32).reshape(-1, 1)),
            jnp.asarray(np.ascontiguousarray(np.asarray(dct).T)),
            jnp.asarray(np.asarray(lifter, np.float32).reshape(num_ceps, 1)),
            frame_size=frame_size,
            half=half,
            num_filters=num_filters,
            num_ceps=num_ceps,
            block_frames=block_frames,
        )
        return {
            "energy": energy[0],
            "zcr": zcr[0],
            "entropy": entropy[0],
            # (ceps, F).T — a free bitcast to the {0,1} output layout
            "mfcc": mfccT.T,
        }
    seams = _seam_rows(x, f, block_frames)
    w2_row = jnp.asarray((w * w).astype(np.float32).reshape(1, frame_size))
    nyqc_row = jnp.asarray(
        np.asarray(wnyq, np.float32).reshape(1, frame_size)
    )
    energy, zcr, entropy, mfcc = _fused_view_call(
        x,
        seams,
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
