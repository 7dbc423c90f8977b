#!/usr/bin/env python3
"""Randomized-geometry parity sweep: every op must match the oracle across
arbitrary frame sizes, hops, window types, FFT sizes and filter counts —
not just the default 320/160/512/26 configuration."""

import numpy as np
import pytest

from sspv_tpu import ops
from sspv_tpu.ops import bases
from sspv_tpu.ops.windows import get_window

import oracle


def nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return np.mean((got - want) ** 2) / max(np.mean(want**2), 1e-12)


CONFIGS = [
    # (frame, hop, window, n_fft, mels, sr)
    (320, 160, "hamming", 512, 26, 16000),
    (400, 160, "hamming", 512, 40, 16000),
    (256, 128, "hanning", 256, 20, 8000),
    (200, 80, "rectangular", 512, 26, 8000),
    (480, 120, "hanning", 1024, 32, 48000),
    (160, 37, "hamming", 256, 13, 16000),
]


@pytest.mark.parametrize("frame,hop,window,n_fft,mels,sr", CONFIGS)
def test_geometry_sweep(frame, hop, window, n_fft, mels, sr):
    rng = np.random.default_rng(frame * hop)
    sig = rng.normal(0, 3000, sr).astype(np.float32)

    w = get_window(window, frame)
    got_frames = np.asarray(ops.framing(sig, frame, hop, window))
    want_frames = oracle.framing(sig, frame, hop, w)
    assert got_frames.shape == want_frames.shape
    assert nmse(got_frames, want_frames) < 1e-10

    frames = want_frames[:60]
    assert nmse(
        ops.calculate_short_time_energy(frames), oracle.short_time_energy(frames)
    ) < 1e-9

    fb_got = bases.mel_filterbank_np(mels, n_fft, sr)
    fb_want = oracle.mel_filterbank(mels, n_fft, sr)
    np.testing.assert_allclose(fb_got, fb_want, atol=1e-6)

    got_mfcc = np.asarray(
        ops.compute_mfcc(frames, sr, n_fft=n_fft, num_filters=mels, num_ceps=13)
    )
    want_mfcc = oracle.mfcc(frames, sr, n_fft=n_fft, num_filters=mels, num_ceps=13)
    assert nmse(got_mfcc, want_mfcc) < 1e-5

    got_ent = np.asarray(ops.calculate_spectral_entropy(frames, n_fft))
    # oracle entropy hardcodes nothing; recompute with this n_fft
    want_ent = oracle.spectral_entropy(frames, n_fft)
    assert nmse(got_ent, want_ent) < 1e-6


@pytest.mark.parametrize("seed", range(4))
def test_streaming_vad_fuzz(seed):
    """Random feature streams + random thresholds: parallel VAD == oracle."""
    import jax.numpy as jnp

    from sspv_tpu.ops import vad as vad_ops

    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    energy = rng.uniform(0, 2e6, n).astype(np.float32)
    zcr = rng.uniform(0, 0.6, n).astype(np.float32)
    entropy = rng.uniform(0, 1, n).astype(np.float32)
    e_th = float(rng.uniform(100, 1e5))
    z_th = float(rng.uniform(0.05, 0.5))
    h_th = float(rng.uniform(0.3, 0.9))
    on = int(rng.integers(0, 6))
    off = int(rng.integers(0, 6))
    alpha = float(rng.uniform(0, 4.0))

    ref = oracle.EngineVadOracle(
        energy_threshold=e_th, zcr_threshold=z_th, entropy_voice_max=h_th,
        use_adaptive=True, alpha_raw=alpha, hangover_on=on, release_off=off,
    )
    want_vad, want_adp = ref.run_all(energy, zcr, entropy)

    state = vad_ops.initial_vad_state(hangover_on=on)
    got_vad, got_adp, _ = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy), state,
        energy_threshold=e_th, zcr_threshold=z_th, entropy_voice_max=h_th,
        use_adaptive=True, adaptive_alpha=alpha, hangover_on=on,
        release_off=off,
    )
    np.testing.assert_array_equal(np.asarray(got_adp), want_adp, err_msg=str(seed))
    np.testing.assert_array_equal(np.asarray(got_vad), want_vad, err_msg=str(seed))
