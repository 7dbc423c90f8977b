#!/usr/bin/env python3
"""Pitch detection: known-frequency tones recover their F0; VAD gating zeros
unvoiced frames; noise yields low confidence."""

import numpy as np

from sspv_tpu.ops.pitch import pitch_from_frames, pitch_track


def tone_frames(freq, n_frames=20, frame_size=320, sr=16000):
    t = np.arange(n_frames * 160 + frame_size) / sr
    sig = np.sin(2 * np.pi * freq * t).astype(np.float32)
    idx = np.arange(frame_size)[None, :] + 160 * np.arange(n_frames)[:, None]
    return sig[idx]


def test_pitch_recovers_tone_frequency():
    for freq in (100.0, 150.0, 220.0, 330.0):
        frames = tone_frames(freq)
        f0, conf = pitch_from_frames(frames, 16000)
        f0 = np.asarray(f0)
        # lag quantization: expected resolution ~ f^2/sr
        tol = freq * freq / 16000 + 1.0
        assert np.all(np.abs(f0 - freq) < tol), (freq, f0[:3])
        # low F0 peaks sit at lag ~ frame_size/2 where the un-normalized ACF
        # overlap is halved, so confidence bottoms out near 0.5
        assert np.all(np.asarray(conf) >= 0.45)


def test_pitch_vad_gating_and_noise_confidence():
    rng = np.random.default_rng(0)
    voiced = tone_frames(120.0, n_frames=10)
    noise = rng.normal(0, 1.0, (10, 320)).astype(np.float32)
    frames = np.concatenate([voiced, noise])
    vad = np.array([1] * 10 + [0] * 10)
    f0, conf = pitch_track(frames, vad, 16000)
    f0 = np.asarray(f0)
    assert np.all(f0[:10] > 0)
    assert np.all(f0[10:] == 0)
    # tone frames should be far more periodic than noise frames
    assert np.mean(np.asarray(conf)[:10]) > np.mean(np.asarray(conf)[10:])
