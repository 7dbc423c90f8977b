#!/usr/bin/env python3
"""Drive the application entry point (sspv_tpu/main.py) in-process: env-driven
source selection (RTP_INPUT_FILE / RTP_INPUT_DIR), headless UI run to EOF,
and snapshot export — the reference main.py:18-50 flow without a display."""

import os
import wave

import numpy as np

from sspv_tpu.config import Config
from sspv_tpu import main as main_mod


def _write_wav(path, seconds=0.3, freq=220.0):
    sr = Config.SAMPLE_RATE
    t = np.arange(int(seconds * sr)) / sr
    sig = (np.sin(2 * np.pi * freq * t) * 11000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(sig.tobytes())
    return str(path)


def test_main_headless_single_file(monkeypatch, tmp_path):
    wav = _write_wav(tmp_path / "tone.wav")
    snap = str(tmp_path / "snap.png")
    monkeypatch.setenv("RTP_INPUT_FILE", wav)
    monkeypatch.setenv("RTP_HEADLESS", "1")
    monkeypatch.setenv("RTP_SNAPSHOT", snap)
    monkeypatch.setenv("RTP_DURATION", "60")  # upper bound; EOF stops earlier
    monkeypatch.delenv("RTP_INPUT_DIR", raising=False)

    main_mod.main()
    assert os.path.exists(snap) and os.path.getsize(snap) > 0


def test_main_headless_playlist_dir(monkeypatch, tmp_path):
    for name in ("a.wav", "b.wav"):
        _write_wav(tmp_path / name, seconds=0.2)
    snap = str(tmp_path / "snap.png")
    monkeypatch.setenv("RTP_INPUT_DIR", str(tmp_path))
    monkeypatch.setenv("RTP_HEADLESS", "1")
    monkeypatch.setenv("RTP_SNAPSHOT", snap)
    monkeypatch.setenv("RTP_DURATION", "60")
    monkeypatch.delenv("RTP_INPUT_FILE", raising=False)

    main_mod.main()
    assert os.path.exists(snap) and os.path.getsize(snap) > 0
