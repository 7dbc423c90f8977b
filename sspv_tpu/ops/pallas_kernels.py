#!/usr/bin/env python3
"""Fused Pallas TPU kernel for the frame→window→spectrum→feature hot path.

One kernel launch computes, for a block of raw frames resident in VMEM:

    windowed frames (VPU)  -> short-time energy, zero-crossing rate
    raw frames @ windowed-DFT bases (MXU, 2 matmuls) -> power spectrum
    power @ mel^T (MXU) -> log -> @ DCT (MXU) -> lifter  => MFCC
    power -> normalized PSD -> Shannon entropy (VPU)

replacing the reference's per-frame Python loop of one rFFT for entropy, one
rFFT for MFCC, a 26x257 matvec and a 26-pt DCT per 10 ms frame
(engine.py:240-297). The rFFT appears as a matmul pair against precomputed
(frame_size, n_fft//2+1) cos/sin bases with the analysis window folded in
(see ops/bases.py) — at 320x257 these ride the MXU and avoid needing an FFT
primitive inside the kernel.

The grid tiles the frame axis; all constant operands (DFT bases, mel
filterbank, DCT matrix, lifter, window) are replicated to every grid step.
Zero-padded tail frames produce finite outputs (energy 0, entropy ~0) and are
sliced off by the wrapper.

On non-TPU backends the kernel runs in interpreter mode so the same code path
is exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_common import block_specs

__all__ = ["fused_features"]

_HIGHEST = jax.lax.Precision.HIGHEST


def _feature_kernel(
    frames_ref,
    window_ref,
    wc_ref,
    ws_ref,
    fbt_ref,
    dct_ref,
    lifter_ref,
    energy_ref,
    zcr_ref,
    entropy_ref,
    mfcc_ref,
    *,
    frame_size: int,
    n_bins: int,
    compute_entropy: bool = True,
    precision=_HIGHEST,
):
    x = frames_ref[:]  # (BF, frame_size) f32
    w = window_ref[:]  # (1, frame_size)
    xw = x * w

    # Short-time energy: sum(windowed^2) per frame (time_features.py:28).
    energy_ref[:] = jnp.sum(xw * xw, axis=1, keepdims=True)

    # Zero-crossing rate with NumPy sign semantics (time_features.py:47-49).
    signs = jnp.sign(xw)
    crossings = jnp.sum(
        (jnp.abs(signs[:, 1:] - signs[:, :-1]) > 0).astype(jnp.float32),
        axis=1,
        keepdims=True,
    )
    zcr_ref[:] = crossings / jnp.float32(frame_size)

    # Windowed power spectrum as a real/imag DFT matmul pair (MXU).
    re = jax.lax.dot_general(
        x, wc_ref[:], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    im = jax.lax.dot_general(
        x, ws_ref[:], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    power = re * re + im * im  # (BF, n_bins)

    # Mel -> log -> DCT -> lifter (frequency_features.py:147-158 + facade lifter).
    mel = jnp.maximum(
        jax.lax.dot_general(
            power, fbt_ref[:], (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        ),
        jnp.float32(1e-10),
    )
    mfcc = jax.lax.dot_general(
        jnp.log(mel), dct_ref[:], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    mfcc_ref[:] = mfcc * lifter_ref[:]

    # Spectral entropy from the shared power spectrum
    # (frequency_features.py:183-196). Skipped (zero-filled) when a distinct
    # entropy FFT size is configured — the wrapper computes it separately.
    if compute_entropy:
        psum = jnp.sum(power, axis=1, keepdims=True)
        pn = jnp.where(psum > 0, power / psum, jnp.float32(0.0))
        pn = jnp.maximum(pn, jnp.float32(1e-12))
        ent = -jnp.sum(pn * jnp.log(pn), axis=1, keepdims=True)
        entropy_ref[:] = ent / jnp.float32(np.log(n_bins))
    else:
        entropy_ref[:] = jnp.zeros_like(entropy_ref)


@functools.partial(
    jax.jit,
    static_argnames=("frame_size", "n_bins", "num_ceps", "block_frames",
                     "compute_entropy", "precision"),
)
def _fused_call(
    frames,
    window2d,
    wc,
    ws,
    fb_t,
    dct,
    lifter2d,
    *,
    frame_size: int,
    n_bins: int,
    num_ceps: int,
    block_frames: int,
    compute_entropy: bool = True,
    precision=_HIGHEST,
):
    f_pad = frames.shape[0]
    grid = (f_pad // block_frames,)
    interpret, vmem_spec, const = block_specs()

    kernel = functools.partial(
        _feature_kernel, frame_size=frame_size, n_bins=n_bins,
        compute_entropy=compute_entropy, precision=precision,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),  # energy
        jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),  # zcr
        jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),  # entropy
        jax.ShapeDtypeStruct((f_pad, num_ceps), jnp.float32),  # mfcc
    )
    energy, zcr, entropy, mfcc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem_spec((block_frames, frame_size), lambda i: (i, 0)),
            const((1, frame_size)),
            const((frame_size, n_bins)),
            const((frame_size, n_bins)),
            const((n_bins, fb_t.shape[1])),
            const((dct.shape[0], num_ceps)),
            const((1, num_ceps)),
        ],
        out_specs=(
            vmem_spec((block_frames, 1), lambda i: (i, 0)),
            vmem_spec((block_frames, 1), lambda i: (i, 0)),
            vmem_spec((block_frames, 1), lambda i: (i, 0)),
            vmem_spec((block_frames, num_ceps), lambda i: (i, 0)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(frames, window2d, wc, ws, fb_t, dct, lifter2d)
    return energy, zcr, entropy, mfcc


def fused_features(
    frames: jnp.ndarray,
    *,
    wc: np.ndarray,
    ws: np.ndarray,
    fb_t: np.ndarray,
    dct: np.ndarray,
    lifter: np.ndarray,
    window: np.ndarray,
    entropy_bases: tuple = (None, None),
    precision=_HIGHEST,
) -> dict:
    """Fused per-frame features for raw ``(F, frame_size)`` float32 frames.

    Returns the same dict as the plain-JAX path in ``FeaturePipeline._features``.
    When a distinct entropy FFT size is configured (``entropy_bases`` set), the
    entropy spectrum is computed outside the kernel with a second matmul pair.
    """
    if isinstance(precision, str):
        # same resolver as every other matmul path (ops/precision.resolve:
        # unknown spellings map to HIGHEST, the safe end, instead of raising
        # only on the Pallas path)
        from .precision import resolve

        precision = resolve(precision)
    kernel_precision = precision
    if precision == jax.lax.Precision.HIGH:
        # Mosaic lowers DEFAULT and HIGHEST dots only; HIGH (bf16x3 passes)
        # has no in-kernel lowering rule and raises NotImplementedError at
        # compile. Round up the KERNEL's dots so the precision knob never
        # crashes the TPU path — but only the kernel's: the outside-kernel
        # entropy matmuls below are plain XLA and honor HIGH as configured.
        kernel_precision = _HIGHEST
    f, frame_size = frames.shape
    n_bins = wc.shape[1]
    num_ceps = dct.shape[1]
    block_frames = 256 if f >= 256 else max(8, -(-f // 8) * 8)
    f_pad = -(-f // block_frames) * block_frames
    x = frames
    if f_pad != f:
        x = jnp.pad(x, ((0, f_pad - f), (0, 0)))

    energy, zcr, entropy, mfcc = _fused_call(
        x,
        jnp.asarray(window, jnp.float32).reshape(1, frame_size),
        jnp.asarray(wc),
        jnp.asarray(ws),
        jnp.asarray(fb_t),
        jnp.asarray(dct),
        jnp.asarray(lifter, jnp.float32).reshape(1, num_ceps),
        frame_size=frame_size,
        n_bins=n_bins,
        num_ceps=num_ceps,
        block_frames=block_frames,
        compute_entropy=entropy_bases[0] is None,
        precision=kernel_precision,
    )
    out = {
        "energy": energy[:f, 0],
        "zcr": zcr[:f, 0],
        "entropy": entropy[:f, 0],
        "mfcc": mfcc[:f],
    }
    if entropy_bases[0] is not None:
        from .frequency_features import entropy_from_power

        wce, wse = entropy_bases
        re = jnp.matmul(frames, jnp.asarray(wce), precision=precision,
                        preferred_element_type=jnp.float32)
        im = jnp.matmul(frames, jnp.asarray(wse), precision=precision,
                        preferred_element_type=jnp.float32)
        out["entropy"] = entropy_from_power(re * re + im * im)
    return out
