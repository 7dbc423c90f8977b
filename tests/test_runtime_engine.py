#!/usr/bin/env python3
"""Runtime engine integration with a synthetic AudioSource (the reference's
hardware-free strategy: swap the device-facing source, run everything else
for real — tests/test_runtime_engine.py:12-53) plus exact parity of the
engine's streaming output against the sequential per-frame oracle."""

import os
import time

import numpy as np

from sspv_tpu.config import Config
from sspv_tpu.runtime import AudioRuntime
from sspv_tpu.runtime.audio_source import AudioSource

import oracle


class DummyAudioSource(AudioSource):
    """In-memory int16 sine source honoring the 3-method contract."""

    def __init__(self, duration_sec: float = 0.25, freq_hz: float = 440.0,
                 signal: np.ndarray | None = None,
                 read_delay_s: float = 0.0) -> None:
        self.sample_rate = Config.SAMPLE_RATE
        self.channels = 1
        self._read_delay_s = read_delay_s
        if signal is None:
            t = np.arange(int(duration_sec * self.sample_rate)) / self.sample_rate
            signal = (0.5 * np.sin(2 * np.pi * freq_hz * t) * 32767).astype(np.int16)
        self._data = np.asarray(signal, dtype=np.int16)
        self._pos = 0
        self.exhausted = False

    def open(self) -> None:
        self._pos = 0
        self.exhausted = False

    def read(self, num_frames: int) -> np.ndarray:
        if self._read_delay_s:
            time.sleep(self._read_delay_s)
        if self._pos >= len(self._data):
            self.exhausted = True
            return np.array([], dtype=np.int16)
        end = min(len(self._data), self._pos + num_frames)
        chunk = self._data[self._pos:end]
        self._pos = end
        if self._pos >= len(self._data):
            self.exhausted = True
        return chunk

    def close(self) -> None:
        pass


def _run_engine_to_eof(rt: AudioRuntime, timeout_s: float = 60.0) -> None:
    rt.start()
    t0 = time.time()
    while rt.is_running and time.time() - t0 < timeout_s:
        time.sleep(0.01)
    rt.stop()
    assert rt.last_error is None, rt.last_error


def test_runtime_engine_with_dummy_source():
    src = DummyAudioSource(duration_sec=0.3)
    rt = AudioRuntime(audio_source=src)
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)

    energies, zcrs, vads = rt.get_recent_processed()
    assert energies.size > 0
    assert zcrs.size == energies.size
    assert vads.size == energies.size
    audio = rt.get_recent_audio()
    assert audio.dtype == np.int16 and audio.size > 0
    # the monotonic serving counter tracks everything materialized
    assert rt.frames_processed == energies.size
    assert rt.dispatch_count > 0


def test_engine_output_matches_sequential_oracle():
    rng = np.random.default_rng(12)
    sr = Config.SAMPLE_RATE
    n = int(0.9 * sr)  # 89 frames < PROCESSED_DATA_BUFFER_SIZE
    t = np.arange(n) / sr
    sig = np.zeros(n, dtype=np.float64)
    sig[3000:7000] = np.sin(2 * np.pi * 180 * t[3000:7000]) * 9000
    sig[7000:11000] = rng.normal(0, 2500, 4000)
    sig16 = sig.astype(np.int16)

    rt = AudioRuntime(audio_source=DummyAudioSource(signal=sig16))
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)

    energies, zcrs, vads = rt.get_recent_processed(max_display=1000)

    # oracle: streaming framing (full frames only) + per-frame state machine
    nf = 1 + (n - Config.FRAME_SIZE) // Config.HOP_SIZE
    idx = np.arange(Config.FRAME_SIZE)[None, :] + Config.HOP_SIZE * np.arange(nf)[:, None]
    w = oracle.hamming(Config.FRAME_SIZE)
    frames = (sig16[idx].astype(np.float32) * w).astype(np.float32)
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

    assert energies.size == nf, (energies.size, nf)
    np.testing.assert_allclose(energies, e, rtol=1e-5)
    np.testing.assert_array_equal(vads, want_vad)


def test_npz_export_schema(tmp_path):
    rt = AudioRuntime(audio_source=DummyAudioSource(duration_sec=0.3))
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)
    path = rt.save_data(str(tmp_path))
    assert os.path.exists(path)
    with np.load(path) as data:
        assert set(data.files) == {
            "energies", "zcrs", "vads", "spec_entropy", "vads_adaptive",
            "sample_rate", "frame_size", "hop_size",
        }
        assert data["energies"].dtype == np.float64
        assert data["zcrs"].dtype == np.float64
        assert data["vads"].dtype == np.int32
        assert data["spec_entropy"].dtype == np.float32
        assert data["vads_adaptive"].dtype == np.float32
        assert int(data["sample_rate"]) == Config.SAMPLE_RATE
        assert int(data["frame_size"]) == Config.FRAME_SIZE
        assert int(data["hop_size"]) == Config.HOP_SIZE
        n = data["energies"].shape[0]
        assert all(data[k].shape == (n,) for k in
                   ["zcrs", "vads", "spec_entropy", "vads_adaptive"])


def test_save_data_concurrent_with_streaming(tmp_path):
    """Exports taken WHILE blocks are landing must always be internally
    aligned: all five per-frame series come from one snapshot under one lock
    acquisition (deliberate fix of the reference's two-lock export race,
    rtvp/engine.py:377-384, where a block materializing between the two reads
    misaligns energies/zcrs/vads vs spec_entropy/vads_adaptive)."""
    from sspv_tpu.utils.npz_io import load_session, validate_session

    # a long stream -> many streaming blocks; save as fast as possible the
    # whole time so exports interleave with block materialization. The small
    # per-read pacing keeps the capture thread alive for ~1 s of wall clock
    # regardless of host load / warm executables, guaranteeing the save loop
    # below actually overlaps with blocks landing (without it, a warm CPU
    # drain can finish before the first concurrent save — a timing flake).
    src = DummyAudioSource(duration_sec=20.0, read_delay_s=0.003)
    rt = AudioRuntime(audio_source=src)
    rt.auto_stop_on_eof = True
    rt.start()
    paths = []
    t0 = time.time()
    try:
        # EOF flips is_running almost immediately (in-memory source), but the
        # processing thread keeps draining blocks — save against THAT window
        while (
            rt._process_thread is not None
            and rt._process_thread.is_alive()
            and time.time() - t0 < 120.0
        ):
            if len(rt.processed_data):
                paths.append(rt.save_data(str(tmp_path)))
    finally:
        rt.stop()
    assert rt.last_error is None, rt.last_error
    paths.append(rt.save_data(str(tmp_path)))  # final post-stop export

    assert len(paths) >= 2
    saw_growth = set()
    for p in set(paths):
        s = load_session(p)
        assert validate_session(s) == [], (p, validate_session(s))
        saw_growth.add(s.num_frames)
    assert max(saw_growth) > 0


def test_set_audio_source_resets_buffers():
    rt = AudioRuntime(audio_source=DummyAudioSource(duration_sec=0.3))
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)
    assert len(rt.processed_data) > 0
    rt.set_audio_source(DummyAudioSource(duration_sec=0.2), auto_stop_on_eof=True)
    assert len(rt.processed_data) == 0
    assert len(rt.energy_history) == 0
    _run_engine_to_eof(rt)
    assert len(rt.processed_data) > 0


def test_engine_learns_file_rate_after_open(tmp_path):
    """A FileAudioSource built WITHOUT a target rate reports sample_rate 0
    until open(); the engine must pick up the real rate for backpressure
    sizing and the npz sample_rate field."""
    import wave

    from sspv_tpu.runtime.audio_source import FileAudioSource

    sr = 8000
    path = str(tmp_path / "native8k.wav")
    t = np.arange(sr // 2) / sr
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.sin(2 * np.pi * 100 * t) * 9000)
                      .astype("<i2").tobytes())
    src = FileAudioSource(path)  # no target rate -> pre-open rate is 0
    assert src.sample_rate == 0
    rt = AudioRuntime(audio_source=src)
    assert rt.rate == Config.SAMPLE_RATE  # sane default until open
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)
    assert rt.rate == sr
    out = rt.save_data(str(tmp_path))
    with np.load(out) as z:
        assert int(z["sample_rate"]) == sr


def test_engine_start_clears_stale_error():
    rt = AudioRuntime(audio_source=DummyAudioSource(duration_sec=0.2))
    rt.last_error = RuntimeError("old failure")
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)
    assert rt.last_error is None
    assert len(rt.processed_data) > 0


def test_parse_flag_defensive():
    from sspv_tpu.runtime.engine import _parse_flag

    assert _parse_flag("1", False, "X") is True
    assert _parse_flag(0, True, "X") is False
    assert _parse_flag("true", False, "X") is True
    assert _parse_flag("False", True, "X") is False
    assert _parse_flag("", True, "X") is False
    assert _parse_flag(None, True, "X") is False  # falsy -> off
    assert _parse_flag("garbage", True, "X") is True  # keeps default
    assert _parse_flag("garbage", False, "X") is False


def test_source_swap_after_eof_does_not_leak_old_frames():
    """After an auto-stop-on-EOF, set_audio_source + start (no explicit
    stop) must join the draining process thread first: the new session's
    buffers must contain only the new source's frames."""
    frame, hop = Config.FRAME_SIZE, Config.HOP_SIZE
    n_a = (99 - 1) * hop + frame  # 99 frames
    n_b = (49 - 1) * hop + frame  # 49 frames
    src_a = DummyAudioSource(signal=np.full(n_a, 3000, np.int16),
                             read_delay_s=0.001)
    rt = AudioRuntime(audio_source=src_a)
    rt.auto_stop_on_eof = True
    rt.start()
    t0 = time.time()
    while rt.is_running and time.time() - t0 < 60:
        time.sleep(0.002)
    # immediately swap + restart WITHOUT stop(): the old drain must not
    # race the buffer clears
    src_b = DummyAudioSource(signal=np.full(n_b, -2000, np.int16))
    rt.set_audio_source(src_b, auto_stop_on_eof=True)
    rt.start()
    t0 = time.time()
    while rt.is_running and time.time() - t0 < 60:
        time.sleep(0.002)
    rt.stop()
    assert rt.last_error is None, rt.last_error
    assert len(rt.processed_data) == 49  # only B's frames in the new session
    assert rt.frames_processed == 99 + 49  # both sessions fully processed


def test_stop_never_strands_pending_audio():
    """stop() must drain every captured sample (the capture thread can
    append its final chunk after is_running flips)."""
    sig = np.full(Config.SAMPLE_RATE, 2500, np.int16)  # 1 s
    src = DummyAudioSource(signal=sig, read_delay_s=0.004)
    rt = AudioRuntime(audio_source=src)
    rt.start()
    time.sleep(0.15)  # mid-stream
    rt.stop()
    assert rt.last_error is None, rt.last_error
    assert rt._pending == [] and rt._pending_samples == 0


def test_bad_min_dispatch_interval_does_not_hang(monkeypatch):
    """An unparseable TPU_MIN_DISPATCH_INTERVAL (raw YAML string) must warn
    and default, not kill the processing thread with is_running stuck True."""
    monkeypatch.setattr(Config, "TPU_MIN_DISPATCH_INTERVAL", "50ms")
    src = DummyAudioSource(duration_sec=0.3)
    rt = AudioRuntime(audio_source=src)
    assert rt._min_dispatch_interval == 0.0
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt, timeout_s=60)
    assert len(rt.processed_data) > 0


def test_engine_window_is_a_copy():
    """Mutating the public window attribute must not write through into the
    pipeline's traced-constant window."""
    rt = AudioRuntime(audio_source=DummyAudioSource(duration_sec=0.05))
    before = np.array(rt.pipeline._window, copy=True)
    rt.window[:] = 0.0
    np.testing.assert_array_equal(np.asarray(rt.pipeline._window), before)


def test_display_ring_bounded_by_samples():
    """Sources returning chronically short chunks must still fill the full
    WAVEFORM_DISPLAY_LENGTH window (ring bounded by samples, not chunks)."""

    class TinyChunkSource(DummyAudioSource):
        def read(self, num_frames):
            return super().read(min(200, num_frames))

    need = Config.WAVEFORM_DISPLAY_LENGTH
    src = TinyChunkSource(signal=np.arange(3 * need, dtype=np.int16) % 1000)
    rt = AudioRuntime(audio_source=src)
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)
    audio = rt.get_recent_audio()
    assert audio.size == need  # a full window, despite 200-sample chunks
