#!/usr/bin/env python3
"""Drive the live-microphone path (PyAudioSource -> AudioRuntime) with a
scripted fake ``pyaudio`` module — the one source class round 1 left
unexercised (no mic and no pyaudio wheel in this image).

The fake reproduces the slice of the PyAudio API the source uses
(``PyAudio().open(...)``, ``Stream.read(n, exception_on_overflow=False)``,
``stop_stream``/``close``/``terminate``) and serves a synthetic int16 sine,
so the engine's default-source path (reference engine.py:68-76 equivalent)
runs end-to-end: lazy import in open(), format/rate plumbed through, engine
stop (a mic never reaches EOF), and device teardown ordering.
"""

import sys
import time
import types

import numpy as np
import pytest

from sspv_tpu.config import Config
from sspv_tpu.runtime import AudioRuntime
from sspv_tpu.runtime.audio_source import PyAudioSource


class _FakeStream:
    def __init__(self, owner, rate, channels, fmt, frames_per_buffer):
        self.owner = owner
        self.rate = rate
        self.channels = channels
        self.format = fmt
        self.frames_per_buffer = frames_per_buffer
        self._pos = 0
        self.stopped = False
        self.closed = False

    def read(self, num_frames, exception_on_overflow=True):
        # the source must pass exception_on_overflow=False like the reference
        assert exception_on_overflow is False
        t = (np.arange(num_frames) + self._pos) / self.rate
        self._pos += num_frames
        # a mic never returns short reads or EOF: always num_frames samples
        chunk = (np.sin(2 * np.pi * 440.0 * t) * 12000).astype(np.int16)
        return chunk.tobytes()

    def stop_stream(self):
        self.stopped = True

    def close(self):
        self.closed = True


class _FakePyAudio:
    instances = []

    def __init__(self):
        self.streams = []
        self.terminated = False
        _FakePyAudio.instances.append(self)

    def open(self, format, channels, rate, input, frames_per_buffer):
        assert input is True
        s = _FakeStream(self, rate, channels, format, frames_per_buffer)
        self.streams.append(s)
        return s

    def terminate(self):
        self.terminated = True


@pytest.fixture
def fake_pyaudio(monkeypatch):
    _FakePyAudio.instances = []
    mod = types.ModuleType("pyaudio")
    mod.PyAudio = _FakePyAudio
    mod.paInt16 = 8
    monkeypatch.setitem(sys.modules, "pyaudio", mod)
    return mod


def test_pyaudio_source_contract(fake_pyaudio):
    src = PyAudioSource(
        sample_rate=Config.SAMPLE_RATE,
        channels=Config.CHANNELS,
        format_const=Config.AUDIO_FORMAT,
        frames_per_buffer=Config.CHUNK_SIZE,
    )
    with pytest.raises(RuntimeError):
        src.read(Config.CHUNK_SIZE)  # must be opened first

    src.open()
    pa = _FakePyAudio.instances[-1]
    stream = pa.streams[-1]
    assert stream.rate == Config.SAMPLE_RATE
    assert stream.channels == Config.CHANNELS
    assert stream.format == Config.AUDIO_FORMAT
    assert stream.frames_per_buffer == Config.CHUNK_SIZE

    chunk = src.read(Config.CHUNK_SIZE)
    assert chunk.dtype == np.int16 and chunk.shape == (Config.CHUNK_SIZE,)

    src.close()
    assert stream.stopped and stream.closed
    assert pa.terminated
    assert src._stream is None and src._pa is None
    # close() is idempotent
    src.close()


def test_engine_default_mic_source_runs_and_stops(fake_pyaudio):
    """AudioRuntime() with no source defaults to the microphone; a mic
    session only ends via stop() (no EOF), exactly the reference's default
    flow (engine.py:68-76, 143-175)."""
    rt = AudioRuntime()  # default: PyAudioSource from Config
    assert isinstance(rt.audio_source, PyAudioSource)

    rt.start()
    deadline = time.time() + 60
    while time.time() < deadline:
        e, _, _ = rt.get_recent_processed()
        if e.size >= 5:
            break
        time.sleep(0.01)
    assert rt.is_running  # mic never auto-stops
    rt.stop()
    assert rt.last_error is None

    energies, zcrs, vads = rt.get_recent_processed()
    assert energies.size >= 5
    assert zcrs.size == energies.size == vads.size
    audio = rt.get_recent_audio()
    assert audio.dtype == np.int16 and audio.size > 0
    # a loud 440 Hz tone: every frame voiced by the fixed gate
    assert energies.min() > Config.ENERGY_THRESHOLD

    # device teardown happened in the capture thread's finally
    pa = _FakePyAudio.instances[-1]
    assert pa.terminated and all(s.closed for s in pa.streams)
