#!/usr/bin/env python3
"""Native host framing kernel vs the NumPy fallback: identical output."""

import numpy as np

from sspv_tpu.utils import native


def test_native_framing_matches_numpy():
    rng = np.random.default_rng(0)
    samples = rng.integers(-32768, 32767, 10000, dtype=np.int16)
    for frame, hop in [(320, 160), (400, 147), (512, 512)]:
        got = native.frame_i16_to_f32(samples, frame, hop)
        n = 1 + (len(samples) - frame) // hop
        idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
        want = samples[idx].astype(np.float32)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def test_native_framing_windowed():
    rng = np.random.default_rng(1)
    samples = rng.integers(-1000, 1000, 5000, dtype=np.int16)
    w = (0.5 - 0.5 * np.cos(np.linspace(0, 2 * np.pi, 320))).astype(np.float32)
    got = native.frame_i16_to_f32(samples, 320, 160, window=w)
    n = 1 + (len(samples) - 320) // 160
    idx = np.arange(320)[None, :] + 160 * np.arange(n)[:, None]
    want = samples[idx].astype(np.float32) * w
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_short_input_returns_empty():
    out = native.frame_i16_to_f32(np.zeros(100, np.int16), 320, 160)
    assert out.shape == (0, 320)


def test_native_library_builds():
    # In this environment g++ exists, so the native path should be live.
    assert native.native_available()


def test_window_length_mismatch_raises():
    """The native kernel reads window[0..frame_size) unconditionally, so a
    short window must be rejected up front (identically on both paths)."""
    import pytest

    samples = np.zeros(5000, np.int16)
    with pytest.raises(ValueError, match="window shape"):
        native.frame_i16_to_f32(samples, 320, 160, window=np.ones(160, np.float32))
    with pytest.raises(ValueError, match="window shape"):
        native.frame_i16_to_f32(samples, 320, 160, window=np.ones(640, np.float32))
