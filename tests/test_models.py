#!/usr/bin/env python3
"""Frontend transform models: parity with the functional ops / oracle."""

import numpy as np
import jax

from sspv_tpu.models import (
    MFCC,
    MelSpectrogram,
    SpectralEntropy,
    Spectrogram,
    SpeechFrontend,
    VADModel,
)

import oracle


def nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return np.mean((got - want) ** 2) / max(np.mean(want**2), 1e-12)


def make_frames(n=40, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.normal(0, 2000, (n, 320)).astype(np.float32)
    return (raw * oracle.hamming(320)).astype(np.float32)


def test_spectrogram_matches_rfft():
    frames = make_frames()
    got = np.asarray(Spectrogram()(frames))
    want = np.abs(np.fft.rfft(frames, n=512)) ** 2
    assert nmse(got, want) < 1e-8


def test_mel_and_mfcc_match_oracle():
    frames = make_frames()
    got_mel = np.asarray(MelSpectrogram()(frames))
    fb = oracle.mel_filterbank(26, 512, 16000)
    want_mel = np.log(np.maximum(np.abs(np.fft.rfft(frames, 512)) ** 2 @ fb.T, 1e-10))
    assert nmse(got_mel, want_mel) < 1e-8

    got_mfcc = np.asarray(MFCC()(frames))
    want_mfcc = oracle.mfcc(frames, 16000, lifter=22)
    assert nmse(got_mfcc, want_mfcc) < 1e-5


def test_entropy_and_vad_models():
    frames = make_frames()
    got = np.asarray(SpectralEntropy()(frames))
    assert nmse(got, oracle.spectral_entropy(frames, 512)) < 1e-6

    vad = np.asarray(VADModel(energy_threshold=1.0, zcr_threshold=1.0)(frames))
    e = oracle.short_time_energy(frames)
    z = oracle.zero_crossing_rate(frames)
    np.testing.assert_array_equal(vad, oracle.fixed_vad(e, z, 1.0, 1.0))


def test_frontend_bundle_and_from_signal():
    rng = np.random.default_rng(1)
    sig = rng.normal(0, 2000, 16000).astype(np.float32)
    fe = SpeechFrontend()
    out = fe.from_signal(sig)
    n = 1 + int(np.ceil((16000 - 320) / 160))
    assert np.asarray(out["mfcc"]).shape == (n, 13)
    assert np.asarray(out["energy"]).shape == (n,)
    # jit-compatibility of the transform call
    jitted = jax.jit(fe)
    frames = fe.frames_of(sig)
    out2 = jitted(frames)
    # eager vs jit can fuse differently; near-zero cepstra need an atol
    np.testing.assert_allclose(
        np.asarray(out["mfcc"]), np.asarray(out2["mfcc"]), rtol=1e-4, atol=2e-3
    )


def test_pitch_transform_both_methods():
    import numpy as np

    from sspv_tpu.models import Pitch

    sr = 16000
    t = np.arange(2 * sr) / sr
    sig = (np.sin(2 * np.pi * 200 * t) * 4000).astype(np.float32)
    for method in ("acf", "amdf"):
        model = Pitch(method=method)
        f0, conf = model.from_signal(sig)
        f0 = np.asarray(f0)
        # interior frames (tail zero-padding perturbs the last few)
        mid = f0[2:-4]
        assert np.all(np.abs(mid - 200.0) < 4.0), (method, mid[:5])
        assert np.asarray(conf)[2:-4].min() > 0.4, method


def test_pitch_transform_validation():
    import pytest

    from sspv_tpu.models import Pitch

    with pytest.raises(ValueError):
        Pitch(method="cepstrum")
    with pytest.raises(ValueError):
        Pitch(fmin=10.0, fmax=20.0)  # empty lag band at 320-sample frames
