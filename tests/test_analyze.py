#!/usr/bin/env python3
"""Offline analyzer: end-to-end on a generated WAV with PNG + npz outputs."""

import wave

import numpy as np

from sspv_tpu.analyze import analyze_file
from sspv_tpu.config import Config


def test_analyze_file_outputs(tmp_path):
    sr = Config.SAMPLE_RATE
    t = np.arange(2 * sr) / sr
    sig = np.zeros(2 * sr)
    sig[sr // 2 : sr] = np.sin(2 * np.pi * 200 * t[sr // 2 : sr]) * 9000
    p = tmp_path / "in.wav"
    with wave.open(str(p), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(sig.astype(np.int16).tobytes())

    png = tmp_path / "out.png"
    npz = tmp_path / "out.npz"
    summary = analyze_file(str(p), png=str(png), npz=str(npz))

    assert summary["frames"] == 199
    assert summary["duration_s"] == 2.0
    assert summary["voiced_frames"] > 0
    # 200 Hz tone: the gated pitch tracker should land near 200
    assert summary["median_f0_hz"] is not None
    assert abs(summary["median_f0_hz"] - 200.0) < 8.0
    assert png.exists() and png.stat().st_size > 10_000
    with np.load(npz) as d:
        assert d["mfcc"].shape == (199, 13)
        assert d["f0"].shape == (199,)
        assert d["pitch_confidence"].shape == (199,)
        assert d["pitch_confidence"].dtype == np.float32
        assert d["vads"].dtype == np.int32
