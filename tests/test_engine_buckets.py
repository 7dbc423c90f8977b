#!/usr/bin/env python3
"""Engine bucketing: drains larger than the top bucket must split into the
fixed shape set and still produce sequential-oracle-exact results."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from sspv_tpu.config import Config
from sspv_tpu.runtime import AudioRuntime

from test_runtime_engine import DummyAudioSource, _run_engine_to_eof
import oracle


def test_oversized_drain_splits_into_fixed_buckets(monkeypatch):
    # tiny buckets force many splits; 0.9 s => 89 frames > 3 * top bucket.
    # Pin the legacy frames layout: this test asserts on frame-matrix
    # dispatch shapes (the samples layout has its own splitting test).
    monkeypatch.setattr(Config, "TPU_STREAM_BUCKETS", (8, 16))
    monkeypatch.setattr(
        Config, "TPU_STREAM_SAMPLES_DISPATCH", 0, raising=False
    )
    rng = np.random.default_rng(4)
    n = int(0.9 * Config.SAMPLE_RATE)
    sig = (rng.normal(0, 2500, n)).astype(np.int16)

    rt = AudioRuntime(audio_source=DummyAudioSource(signal=sig))
    assert rt._buckets == (8, 16)
    assert rt._samples_dispatch is False
    seen = []
    orig = rt._dispatch

    def spy(frames):
        seen.append(frames.shape[0])
        return orig(frames)

    rt._dispatch = spy
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)

    assert max(seen) <= 16, seen
    energies, zcrs, vads = rt.get_recent_processed(max_display=10**6)
    nf = 1 + (n - Config.FRAME_SIZE) // Config.HOP_SIZE
    assert energies.size == nf

    # oracle comparison across the split dispatches
    idx = np.arange(Config.FRAME_SIZE)[None, :] + Config.HOP_SIZE * np.arange(nf)[:, None]
    frames = (sig[idx].astype(np.float32) * oracle.hamming(Config.FRAME_SIZE))
    e = oracle.short_time_energy(frames)
    z = oracle.zero_crossing_rate(frames)
    h = oracle.spectral_entropy(frames, Config.SPECTRAL_ENTROPY_N_FFT)
    ref = oracle.EngineVadOracle(
        energy_threshold=Config.ENERGY_THRESHOLD,
        zcr_threshold=Config.ZCR_THRESHOLD,
        entropy_voice_max=Config.SPECTRAL_ENTROPY_VOICE_MAX,
        use_adaptive=Config.USE_ADAPTIVE_VAD,
        alpha_raw=Config.ADAPTIVE_VAD_ENERGY_K,
        hangover_on=Config.VAD_HANGOVER_ON,
        release_off=Config.VAD_RELEASE_OFF,
    )
    want_vad, _ = ref.run_all(e, z, h)
    np.testing.assert_allclose(energies, e, rtol=1e-5)
    np.testing.assert_array_equal(vads, want_vad)


def test_low_latency_mode_is_oracle_exact(monkeypatch):
    """TPU_LOW_LATENCY=1: 8-frame bucket prepended, no in-flight block —
    results must still be bit-identical to the sequential per-frame oracle."""
    monkeypatch.setattr(Config, "TPU_LOW_LATENCY", 1, raising=False)
    rng = np.random.default_rng(5)
    n = int(0.7 * Config.SAMPLE_RATE)
    t = np.arange(n) / Config.SAMPLE_RATE
    sig = rng.normal(0, 600, n)
    sig[2000:6000] = np.sin(2 * np.pi * 150 * t[2000:6000]) * 9000
    sig = sig.astype(np.int16)

    rt = AudioRuntime(audio_source=DummyAudioSource(signal=sig))
    assert rt._low_latency and rt._buckets[0] == 8
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)

    energies, zcrs, vads = rt.get_recent_processed(max_display=10**6)
    nf = 1 + (n - Config.FRAME_SIZE) // Config.HOP_SIZE
    assert energies.size == nf

    idx = np.arange(Config.FRAME_SIZE)[None, :] + Config.HOP_SIZE * np.arange(nf)[:, None]
    frames = (sig[idx].astype(np.float32) * oracle.hamming(Config.FRAME_SIZE))
    e = oracle.short_time_energy(frames)
    z = oracle.zero_crossing_rate(frames)
    h = oracle.spectral_entropy(frames, Config.SPECTRAL_ENTROPY_N_FFT)
    ref = oracle.EngineVadOracle(
        energy_threshold=Config.ENERGY_THRESHOLD,
        zcr_threshold=Config.ZCR_THRESHOLD,
        entropy_voice_max=Config.SPECTRAL_ENTROPY_VOICE_MAX,
        use_adaptive=Config.USE_ADAPTIVE_VAD,
        alpha_raw=Config.ADAPTIVE_VAD_ENERGY_K,
        hangover_on=Config.VAD_HANGOVER_ON,
        release_off=Config.VAD_RELEASE_OFF,
    )
    want_vad, _ = ref.run_all(e, z, h)
    np.testing.assert_allclose(energies, e, rtol=1e-5)
    np.testing.assert_array_equal(vads, want_vad)


def test_samples_dispatch_splits_and_matches_oracle(monkeypatch):
    """Samples-layout dispatch (the default): oversized drains split into
    <=top-bucket-frame sample slices (consecutive slices sharing the
    frame-overlap samples), and the streamed output stays bit-identical to
    the sequential oracle."""
    monkeypatch.setattr(Config, "TPU_STREAM_BUCKETS", (8, 16))
    rng = np.random.default_rng(6)
    n = int(0.9 * Config.SAMPLE_RATE)
    t = np.arange(n) / Config.SAMPLE_RATE
    sig = rng.normal(0, 700, n)
    sig[3000:8000] = np.sin(2 * np.pi * 170 * t[3000:8000]) * 9000
    sig = sig.astype(np.int16)

    rt = AudioRuntime(audio_source=DummyAudioSource(signal=sig))
    assert rt._samples_dispatch is True
    seen = []
    orig = rt._dispatch_samples

    def spy(samples):
        seen.append(len(samples))
        return orig(samples)

    rt._dispatch_samples = spy
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)

    frame, hop = Config.FRAME_SIZE, Config.HOP_SIZE
    max_slice = (16 - 1) * hop + frame  # top bucket in samples
    assert seen and max(seen) <= max_slice, seen

    energies, zcrs, vads = rt.get_recent_processed(max_display=10**6)
    nf = 1 + (n - frame) // hop
    assert energies.size == nf

    idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
    frames = sig[idx].astype(np.float32) * oracle.hamming(frame)
    e = oracle.short_time_energy(frames)
    z = oracle.zero_crossing_rate(frames)
    h = oracle.spectral_entropy(frames, Config.SPECTRAL_ENTROPY_N_FFT)
    ref = oracle.EngineVadOracle(
        energy_threshold=Config.ENERGY_THRESHOLD,
        zcr_threshold=Config.ZCR_THRESHOLD,
        entropy_voice_max=Config.SPECTRAL_ENTROPY_VOICE_MAX,
        use_adaptive=Config.USE_ADAPTIVE_VAD,
        alpha_raw=Config.ADAPTIVE_VAD_ENERGY_K,
        hangover_on=Config.VAD_HANGOVER_ON,
        release_off=Config.VAD_RELEASE_OFF,
    )
    want_vad, _ = ref.run_all(e, z, h)
    np.testing.assert_allclose(energies, e, rtol=1e-5)
    np.testing.assert_array_equal(vads, want_vad)


def test_samples_vs_frames_dispatch_same_decisions(monkeypatch):
    """Both dispatch layouts over the same audio must produce identical VAD
    decisions and closely matching features (the layouts reassociate float
    sums differently, so features agree to ~1e-6 relative, decisions
    exactly on this oracle-pinned seed)."""
    rng = np.random.default_rng(14)
    n = int(1.1 * Config.SAMPLE_RATE)
    t = np.arange(n) / Config.SAMPLE_RATE
    sig = rng.normal(0, 900, n)
    sig[4000:9000] = np.sin(2 * np.pi * 200 * t[4000:9000]) * 8500
    sig[12000:16000] = rng.normal(0, 2600, 4000)
    sig = sig.astype(np.int16)

    results = {}
    for mode in (1, 0):
        monkeypatch.setattr(
            Config, "TPU_STREAM_SAMPLES_DISPATCH", mode, raising=False
        )
        rt = AudioRuntime(audio_source=DummyAudioSource(signal=sig))
        assert rt._samples_dispatch is bool(mode)
        rt.auto_stop_on_eof = True
        _run_engine_to_eof(rt)
        results[mode] = rt.get_recent_processed(max_display=10**6)

    e1, z1, v1 = results[1]
    e0, z0, v0 = results[0]
    assert e1.size == e0.size > 0
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_allclose(e1, e0, rtol=1e-5)
    np.testing.assert_allclose(z1, z0, atol=1e-6)
