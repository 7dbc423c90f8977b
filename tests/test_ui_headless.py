#!/usr/bin/env python3
"""UI layer: plot model auto-ranging, headless poll loop + PNG render, file
discovery helpers, and the VisualizationUI fallback dispatch."""

import os
import wave

import numpy as np

from sspv_tpu.config import Config
from sspv_tpu.runtime import AudioRuntime, FileAudioSource
from sspv_tpu.ui import (
    HeadlessVisualizer,
    PlotModel,
    RangeTracker,
    VisualizationUI,
    collect_audio_files,
)


class FakeRuntime:
    """Minimal object honoring the 6-method UI contract."""

    def __init__(self, n=50):
        self.is_running = False
        rng = np.random.default_rng(0)
        self._audio = (rng.normal(0, 5000, 4096)).astype(np.int16)
        self._e = rng.uniform(0, 1e7, n)
        self._z = rng.uniform(0, 0.4, n)
        self._v = (rng.random(n) < 0.5).astype(int)
        self.audio_source = None

    def start(self):
        self.is_running = True

    def stop(self):
        self.is_running = False

    def get_recent_audio(self):
        return self._audio

    def get_recent_processed(self, max_display=None):
        return self._e, self._z, self._v

    def save_data(self, directory=None):
        return "fake.npz"


def test_range_tracker_policies():
    rt = RangeTracker("waveform")
    lo, hi = rt.update(np.array([-1000.0, 2000.0]))
    assert lo == -hi and hi >= 2000.0
    rt2 = RangeTracker("vad")
    assert rt2.update(np.array([0, 1])) == (-0.1, 1.1)
    rt3 = RangeTracker("energy")
    lo, hi = rt3.update(np.array([5.0, 10.0]))
    assert lo == 0.0 and hi >= 10.0
    # empty data falls back to the initial fixed range
    assert RangeTracker("zcr").update(np.array([])) == (0.0, 0.5)


def test_plot_model_poll_and_summary():
    m = PlotModel(FakeRuntime())
    m.poll()
    assert m.energies.size == 50
    s = m.summary()
    assert "frames=50" in s and "voiced=" in s


def test_headless_visualizer_end_to_end(tmp_path):
    sr = Config.SAMPLE_RATE
    sig = (np.sin(np.arange(sr // 2) * 0.1) * 8000).astype(np.int16)
    p = tmp_path / "t.wav"
    with wave.open(str(p), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(sig.tobytes())
    rt = AudioRuntime(audio_source=FileAudioSource(str(p), sample_rate=sr))
    rt.auto_stop_on_eof = True
    png = tmp_path / "snap.png"
    ui = VisualizationUI(rt, headless=True, duration=30.0, snapshot_path=str(png))
    ui.run()
    assert not rt.is_running
    assert png.exists() and png.stat().st_size > 1000
    e, _, _ = rt.get_recent_processed()
    assert e.size > 0


def test_collect_audio_files(tmp_path):
    (tmp_path / "b.wav").write_bytes(b"x")
    (tmp_path / "a.WAV").write_bytes(b"x")
    (tmp_path / "notes.txt").write_bytes(b"x")
    (tmp_path / "sub").mkdir()
    got = collect_audio_files(str(tmp_path))
    assert [os.path.basename(f) for f in got] == ["a.WAV", "b.wav"]
    assert collect_audio_files(str(tmp_path / "missing")) == []


def test_headless_run_survives_missing_matplotlib(monkeypatch):
    """snapshot rendering is on by default; a minimal install without
    matplotlib must log a warning at the end, not crash the whole run."""
    from sspv_tpu.ui.headless import HeadlessVisualizer

    rt = FakeRuntime()
    v = HeadlessVisualizer(rt, duration=0.05, snapshot_path="unused.png")
    monkeypatch.setattr(
        v, "render_png",
        lambda path: (_ for _ in ()).throw(ImportError("no matplotlib")),
    )
    v.run()  # must not raise


def test_plot_model_reenable_autorange_clears_history():
    """Extrema recorded before auto-range was toggled off must not frame
    data after it is re-enabled."""
    import numpy as np

    from sspv_tpu.ui.plots import PlotModel

    class FakeRuntime:
        def __init__(self):
            self.amplitude = 20000.0

        def get_recent_audio(self):
            return np.full(100, self.amplitude, dtype=np.float32)

        def get_recent_processed(self):
            e = np.full(10, self.amplitude)
            return e, np.full(10, 0.1), np.zeros(10)

    rt = FakeRuntime()
    m = PlotModel(rt)
    m.poll()  # loud extrema recorded
    m.auto_range = False
    rt.amplitude = 10.0
    m.poll()
    m.auto_range = True
    m.poll()
    lo, hi = m.ranges["waveform"]
    assert hi <= 10 * 1.1 + 1e-6  # framed to the quiet data, not the old peak


def test_progress_reports_completion_after_close():
    """A finished playlist (close() reset _index to 0) must read
    'file N/N', not 'file 1/N'."""
    from sspv_tpu.ui.plots import PlotModel

    class FakePlaylist:
        _paths = ["a.wav", "b.wav", "c.wav"]
        _index = 0
        exhausted = True

    class FakeRuntime:
        audio_source = FakePlaylist()

    assert PlotModel(FakeRuntime()).progress() == "file 3/3"
