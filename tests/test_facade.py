#!/usr/bin/env python3
"""Facade polymorphism quirks that the historical API promises
(reference signal_processing/__init__.py:88-253)."""

import numpy as np

from sspv_tpu.signal_processing import SignalProcessing

import oracle


def test_energy_scalar_vs_batch():
    frame = np.random.randn(320).astype(np.float32) * 100
    scalar = SignalProcessing.calculate_short_time_energy(frame)
    assert isinstance(scalar, float)
    batch = SignalProcessing.calculate_short_time_energy(frame[None, :])
    assert batch.shape == (1,)
    np.testing.assert_allclose(scalar, batch[0], rtol=1e-5)


def test_zcr_scalar_empty():
    assert SignalProcessing.calculate_zero_crossing_rate(np.zeros(0)) == 0.0


def test_autocorr_single_frame_normalized_length():
    frame = np.sin(np.arange(320) * 0.1).astype(np.float32)
    acf = SignalProcessing.calculate_short_time_autocorrelation(frame, 50)
    # single frame: length == max_lag (NOT max_lag+1), acf[0] == 1
    assert acf.shape == (50,)
    assert np.isclose(acf[0], 1.0)
    # multi frame: (num_frames, max_lag+1), unnormalized
    frames = np.stack([frame, frame * 2])
    acf2 = SignalProcessing.calculate_short_time_autocorrelation(frames, 50)
    assert acf2.shape == (2, 51)
    assert acf2[1, 0] > acf2[0, 0]


def test_amdf_single_frame_promotes_to_2d():
    frame = np.sin(np.arange(320) * 0.1).astype(np.float32)
    out = SignalProcessing.calculate_average_magnitude_difference(frame, 40)
    assert out.shape == (1, 40)


def test_mel_filterbank_param_name_shim():
    fb = SignalProcessing.mel_filterbank(n_filters=26, n_fft=512, sample_rate=16000)
    assert fb.shape == (26, 257)
    np.testing.assert_allclose(fb, oracle.mel_filterbank(26, 512, 16000), atol=1e-6)


def test_mfcc_pre_emphasis_and_lifter_paths():
    rng = np.random.default_rng(3)
    frame = rng.normal(0, 1000, 320).astype(np.float32)
    base = SignalProcessing.compute_mfcc(frame, 16000)
    lifted = SignalProcessing.compute_mfcc(frame, 16000, lifter=22)
    pre = SignalProcessing.compute_mfcc(frame, 16000, pre_emphasis=0.97)
    assert base.shape == lifted.shape == pre.shape == (13,)
    lift = 1.0 + 11.0 * np.sin(np.pi * np.arange(13) / 22.0)
    np.testing.assert_allclose(lifted, base * lift, rtol=1e-5)
    # pre-emphasis changes the spectrum
    assert not np.allclose(pre, base)
    # oracle cross-check of the pre-emphasis path
    pre_frame = oracle.preemphasis(frame, 0.97)
    want = oracle.mfcc(pre_frame, 16000)[0]
    np.testing.assert_allclose(pre, want, atol=2e-3)


def test_vad_threshold_defaults_come_from_config():
    from sspv_tpu.config import Config

    e = np.array([Config.ENERGY_THRESHOLD * 2.0], np.float32)
    z = np.array([Config.ZCR_THRESHOLD / 2.0], np.float32)
    out = SignalProcessing.voice_activity_detection(e, z)
    assert out.dtype == bool and bool(out[0])


def test_adaptive_vad_batch_returns_bool_array():
    e = np.array([5000.0, 100.0], np.float32)
    z = np.array([0.02, 0.02], np.float32)
    out = SignalProcessing.adaptive_voice_activity_detection(
        e, z, [200.0] * 30, [0.03] * 30, alpha=0.8
    )
    assert out.dtype == bool and out.shape == (2,)
    assert bool(out[0]) and not bool(out[1])
