#!/usr/bin/env python3
"""File/playlist sources: WAV decode (stdlib fallback), downmix, resampling,
EOF/exhausted semantics, playlist continuity."""

import wave

import numpy as np
import pytest

from sspv_tpu.runtime.audio_source import (
    SUPPORTED_EXTENSIONS,
    FileAudioSource,
    PlaylistAudioSource,
    _resample_to,
)


def write_wav(path, data: np.ndarray, sr: int = 16000, channels: int = 1):
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(np.asarray(data, dtype=np.int16).tobytes())


def test_file_source_reads_wav(tmp_path):
    sig = (np.sin(np.linspace(0, 100, 4000)) * 10000).astype(np.int16)
    p = tmp_path / "tone.wav"
    write_wav(p, sig)
    src = FileAudioSource(str(p), sample_rate=16000)
    assert src.sample_rate == 16000  # exposed pre-open
    src.open()
    chunks = []
    while True:
        c = src.read(1024)
        if c.size == 0:
            break
        chunks.append(c)
    assert src.exhausted
    got = np.concatenate(chunks)
    np.testing.assert_array_equal(got, sig)
    src.close()


def test_file_source_stereo_downmix(tmp_path):
    left = np.full(1000, 1000, np.int16)
    right = np.full(1000, 3000, np.int16)
    inter = np.empty(2000, np.int16)
    inter[0::2] = left
    inter[1::2] = right
    p = tmp_path / "stereo.wav"
    write_wav(p, inter, channels=2)
    src = FileAudioSource(str(p))
    src.open()
    got = src.read(1000)
    assert np.all(got == 2000)  # mean across channels


def test_file_source_resamples(tmp_path):
    sr_src = 8000
    t = np.arange(sr_src) / sr_src
    sig = (np.sin(2 * np.pi * 440 * t) * 16000).astype(np.int16)
    p = tmp_path / "a8k.wav"
    write_wav(p, sig, sr=sr_src)
    src = FileAudioSource(str(p), sample_rate=16000)
    src.open()
    assert src.sample_rate == 16000
    out = src.read(10**6)
    assert abs(len(out) - 2 * len(sig)) <= 2  # ~2x samples after 8k->16k
    assert out.dtype == np.int16


def test_file_source_decode_failure(tmp_path):
    p = tmp_path / "garbage.wav"
    p.write_bytes(b"not audio at all")
    src = FileAudioSource(str(p))
    with pytest.raises(RuntimeError, match="could not decode"):
        src.open()


def test_playlist_source_continuity(tmp_path):
    parts = []
    paths = []
    for i in range(3):
        data = np.full(1500, (i + 1) * 100, np.int16)
        parts.append(data)
        p = tmp_path / f"part{i}.wav"
        write_wav(p, data)
        paths.append(str(p))
    src = PlaylistAudioSource(paths, sample_rate=16000)
    src.open()
    got = []
    while True:
        c = src.read(1024)
        if c.size == 0:
            break
        got.append(c)
    assert src.exhausted
    np.testing.assert_array_equal(np.concatenate(got), np.concatenate(parts))
    assert src._index >= 3  # progress attributes the UI reads


def test_resample_identity_and_clip():
    x = np.array([-32768, 32767, 0, 100], np.int16)
    np.testing.assert_array_equal(_resample_to(x, 16000, 16000), x)
    y = _resample_to(np.full(1000, 32767, np.int16), 8000, 16000)
    assert y.dtype == np.int16
    assert y.max() <= 32767 and y.min() >= -32768


def test_supported_extensions_set():
    assert ".wav" in SUPPORTED_EXTENSIONS and ".mp3" in SUPPORTED_EXTENSIONS
    assert len(SUPPORTED_EXTENSIONS) == 10


def test_playlist_skips_empty_file(tmp_path):
    """A zero-sample file mid-playlist must be skipped entirely — an empty
    chunk with exhausted=False would break the 'empty read means EOF'
    contract for generic consumers."""
    a = (np.ones(500) * 100).astype(np.int16)
    c = (np.ones(300) * -100).astype(np.int16)
    write_wav(tmp_path / "a.wav", a)
    write_wav(tmp_path / "b.wav", np.zeros(0, np.int16))  # empty
    write_wav(tmp_path / "c.wav", c)
    src = PlaylistAudioSource(
        [str(tmp_path / n) for n in ("a.wav", "b.wav", "c.wav")],
        sample_rate=16000,
    )
    src.open()
    chunks = []
    while (chunk := src.read(200)).size:
        chunks.append(chunk)
    got = np.concatenate(chunks)
    np.testing.assert_array_equal(got, np.concatenate([a, c]))
    assert src.exhausted


def test_playlist_locks_rate_to_first_file(tmp_path):
    """With no target rate, the playlist must not change sample_rate
    mid-stream (the engine reads it once): later files resample to the
    first file's native rate."""
    write_wav(tmp_path / "a.wav", (np.ones(1600) * 50).astype(np.int16), sr=16000)
    write_wav(tmp_path / "b.wav", (np.ones(4410) * 50).astype(np.int16), sr=44100)
    src = PlaylistAudioSource(
        [str(tmp_path / "a.wav"), str(tmp_path / "b.wav")], sample_rate=None
    )
    src.open()
    assert src.sample_rate == 16000
    total = 0
    while (chunk := src.read(512)).size:
        total += chunk.size
        assert src.sample_rate == 16000  # never flips mid-stream
    # b.wav's 0.1 s at 44.1k resamples to ~1600 samples at 16k
    assert abs(total - 3200) <= 5


def test_file_source_empty_file_keeps_target_rate(tmp_path):
    """An empty file with a requested target rate must report the target,
    not the file's native rate (the engine refreshes its rate post-open)."""
    write_wav(tmp_path / "e.wav", np.zeros(0, np.int16), sr=44100)
    src = FileAudioSource(str(tmp_path / "e.wav"), sample_rate=16000)
    src.open()
    assert src.sample_rate == 16000
    assert src.read(100).size == 0
