#!/usr/bin/env python3
"""Fused Pallas kernel parity (interpreter mode on CPU) against the plain-JAX
feature path and the NumPy oracle."""

import numpy as np

from sspv_tpu.ops import bases
from sspv_tpu.ops.pallas_kernels import fused_features
from sspv_tpu.ops.windows import hamming_window

import oracle


def test_fused_features_matches_oracle():
    rng = np.random.default_rng(9)
    f, frame_size, n_fft = 100, 320, 512
    raw = rng.normal(0, 3000, (f, frame_size)).astype(np.float32)
    w = hamming_window(frame_size)
    wc, ws = bases.windowed_dft_bases(frame_size, n_fft, "hamming")
    out = fused_features(
        raw,
        wc=wc,
        ws=ws,
        fb_t=bases.mel_filterbank_np(26, n_fft, 16000).T.copy(),
        dct=bases.dct_ortho_matrix(26, 13),
        lifter=bases.lifter_vector(13, 22),
        window=w,
    )
    windowed = (raw * w).astype(np.float32)

    def nmse(got, want):
        got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
        return np.mean((got - want) ** 2) / max(np.mean(want**2), 1e-12)

    assert out["energy"].shape == (f,)
    assert out["mfcc"].shape == (f, 13)
    assert nmse(out["energy"], oracle.short_time_energy(windowed)) < 1e-6
    # division may lower to a reciprocal multiply inside the kernel: allow 1 ulp
    np.testing.assert_allclose(
        np.asarray(out["zcr"]), oracle.zero_crossing_rate(windowed), atol=1e-6
    )
    assert nmse(out["mfcc"], oracle.mfcc(windowed, 16000, lifter=22)) < 1e-5
    assert nmse(out["entropy"], oracle.spectral_entropy(windowed, 512)) < 1e-6


def test_fused_features_high_precision_coerced():
    """precision=HIGH must not crash (Mosaic has no HIGH lowering; the wrapper
    rounds it up to HIGHEST) and must match the HIGHEST result exactly."""
    import jax

    rng = np.random.default_rng(11)
    raw = rng.normal(0, 2000, (16, 320)).astype(np.float32)
    w = hamming_window(320)
    wc, ws = bases.windowed_dft_bases(320, 512, "hamming")
    kw = dict(
        wc=wc,
        ws=ws,
        fb_t=bases.mel_filterbank_np(26, 512, 16000).T.copy(),
        dct=bases.dct_ortho_matrix(26, 13),
        lifter=bases.lifter_vector(13, 22),
        window=w,
    )
    hi = fused_features(raw, precision=jax.lax.Precision.HIGHEST, **kw)
    got = fused_features(raw, precision=jax.lax.Precision.HIGH, **kw)
    for k in hi:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(hi[k]))
    # the documented config spellings must take the same path as the enums
    got_str = fused_features(raw, precision="high", **kw)
    for k in hi:
        np.testing.assert_array_equal(np.asarray(got_str[k]), np.asarray(hi[k]))


def test_fused_features_small_batch_padding():
    rng = np.random.default_rng(10)
    raw = rng.normal(0, 1000, (3, 320)).astype(np.float32)
    w = hamming_window(320)
    wc, ws = bases.windowed_dft_bases(320, 512, "hamming")
    out = fused_features(
        raw,
        wc=wc,
        ws=ws,
        fb_t=bases.mel_filterbank_np(26, 512, 16000).T.copy(),
        dct=bases.dct_ortho_matrix(26, 13),
        lifter=bases.lifter_vector(13, 22),
        window=w,
    )
    assert out["energy"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(out["mfcc"])))
