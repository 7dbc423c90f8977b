#!/usr/bin/env python3
"""Opt-in real-time engine pitch (Config.TPU_ENGINE_PITCH): the engine
dispatches the pitch-enabled packed programs — features + VAD + VAD-gated
F0 fused into the same single device call per block.

Contracts:
- feature outputs are bit-identical to a pitch-off engine run (the fused
  columns are append-only; the frozen frame dicts and npz schema are
  untouched);
- the F0 track matches the offline frames-path matmul-ACF comparator on
  the engine's own VAD decisions (same contract as /v1/stream?pitch=1),
  regardless of dispatch mode (samples layout and frames fallback).
"""

import numpy as np
import pytest

from sspv_tpu.config import Config
from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
from sspv_tpu.ops.pitch import pitch_track
from sspv_tpu.runtime import AudioRuntime

from test_runtime_engine import DummyAudioSource, _run_engine_to_eof


def _tone_signal(duration_s=0.8, freq=140.0):
    sr = Config.SAMPLE_RATE
    t = np.arange(int(duration_s * sr)) / sr
    sig = np.where(
        (t * 4).astype(int) % 2 == 0,
        7000 * np.sin(2 * np.pi * freq * t),
        np.random.default_rng(7).normal(0, 300, t.size),
    )
    return sig.astype(np.int16)


@pytest.mark.parametrize("samples_dispatch,low_latency", [
    (1, 0), (0, 0), (1, 1),
])
def test_engine_pitch_matches_offline_track(
    monkeypatch, samples_dispatch, low_latency
):
    monkeypatch.setattr(Config, "TPU_ENGINE_PITCH", True)
    monkeypatch.setattr(
        Config, "TPU_STREAM_SAMPLES_DISPATCH", samples_dispatch
    )
    monkeypatch.setattr(Config, "TPU_LOW_LATENCY", low_latency)
    sig = _tone_signal()
    rt = AudioRuntime(audio_source=DummyAudioSource(signal=sig))
    assert rt._samples_dispatch == bool(samples_dispatch)
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)

    f0, conf = rt.get_recent_pitch(max_display=10**6)
    with rt.lock:
        vads = np.array([d["vad"] for d in rt.processed_data], np.int32)
    n = vads.shape[0]
    assert f0.shape == conf.shape == (n,)

    pipe = FeaturePipeline(FeatureConfig.from_config(Config))
    frames = pipe.stream_frames(sig)[:n]
    want_f0, want_conf = pitch_track(
        frames, vads, acf_impl="dft",
        min_confidence=Config.TPU_ENGINE_PITCH_MIN_CONF,
    )
    np.testing.assert_array_equal(f0, np.asarray(want_f0))
    np.testing.assert_allclose(conf, np.asarray(want_conf), rtol=1e-5)
    v = f0[f0 > 0]
    assert v.size and abs(np.median(v) - 140) < 10


def test_engine_pitch_off_is_inert_and_features_identical(monkeypatch):
    """Pitch-on vs pitch-off engine runs: decisions bit-identical, float
    features identical to ulp. NOT exact float equality: the two runs split
    pending samples into blocks by wall-clock timing, and a frame's row
    position inside a signal-view block shifts XLA's matmul tiling at the
    ulp level — two pitch-OFF runs differ the same way. The per-program
    guarantee (fused columns bit-equal the plain program on the SAME
    block) is pinned deterministically in
    test_packed_pitch_program_features_bit_equal_plain."""
    sig = _tone_signal(0.5)

    def run(pitch: bool):
        monkeypatch.setattr(Config, "TPU_ENGINE_PITCH", pitch)
        rt = AudioRuntime(audio_source=DummyAudioSource(signal=sig))
        rt.auto_stop_on_eof = True
        _run_engine_to_eof(rt)
        with rt.lock:
            rows = [dict(d) for d in rt.processed_data]
        return rt, rows

    rt_off, rows_off = run(False)
    assert all(a.size == 0 for a in rt_off.get_recent_pitch())
    rt_on, rows_on = run(True)
    assert len(rt_on.pitch_data) == len(rows_on)
    assert len(rows_on) == len(rows_off)
    for a, b in zip(rows_on, rows_off):
        assert a["vad"] == b["vad"] and a["vad_adaptive"] == b["vad_adaptive"]
        for k in ("energy", "zcr", "spec_entropy"):
            assert a[k] == pytest.approx(b[k], rel=1e-5), k
        np.testing.assert_allclose(a["mfcc"], b["mfcc"], rtol=1e-4, atol=1e-3)


def test_packed_pitch_program_features_bit_equal_plain():
    """Deterministic program-level contract: on the SAME input block, the
    pitch-enabled packed programs' feature columns are bit-identical to the
    plain packed programs' — both dispatch layouts, all stream buckets."""
    pipe = FeaturePipeline(FeatureConfig())
    rng = np.random.default_rng(0)
    for bucket in (32, 256, 2048):
        frames = rng.normal(0, 3000, (bucket, 320)).astype(np.float32)
        st = pipe.initial_packed_state()
        plain, _ = pipe.process_block_packed(frames, st, bucket - 5)
        fused, _ = pipe.process_block_packed_pitch(frames, st, bucket - 5, 0.3)
        pa = np.asarray(plain)
        np.testing.assert_array_equal(
            pa, np.asarray(fused)[:, : pa.shape[1]], err_msg=f"frames {bucket}"
        )
        blen = (bucket - 1) * 160 + 320
        samples = rng.normal(0, 3000, blen).astype(np.int16)
        st = pipe.initial_packed_state()
        plain, _ = pipe.process_signal_packed(samples, st, blen - 700)
        fused, _ = pipe.process_signal_packed_pitch(
            samples, st, blen - 700, 0.3
        )
        pa = np.asarray(plain)
        np.testing.assert_array_equal(
            pa, np.asarray(fused)[:, : pa.shape[1]],
            err_msg=f"samples {bucket}",
        )


def test_headless_renders_pitch_panel(monkeypatch, tmp_path):
    """With engine pitch on, the headless UI adds a fifth F0 panel and the
    status line reports the median voiced F0; with it off, the reference's
    4-panel layout and summary are unchanged."""
    monkeypatch.setattr(Config, "TPU_ENGINE_PITCH", True)
    from sspv_tpu.ui.headless import HeadlessVisualizer

    rt = AudioRuntime(audio_source=DummyAudioSource(signal=_tone_signal(0.5)))
    rt.auto_stop_on_eof = True
    snap = tmp_path / "snap.png"
    viz = HeadlessVisualizer(rt, snapshot_path=str(snap))
    viz.run()
    assert snap.exists() and snap.stat().st_size > 0
    assert "f0=" in viz.model.summary()

    monkeypatch.setattr(Config, "TPU_ENGINE_PITCH", False)
    rt2 = AudioRuntime(audio_source=DummyAudioSource(signal=_tone_signal(0.4)))
    rt2.auto_stop_on_eof = True
    snap2 = tmp_path / "snap2.png"
    viz2 = HeadlessVisualizer(rt2, snapshot_path=str(snap2))
    viz2.run()
    assert snap2.exists()
    assert "f0=" not in viz2.model.summary()


def test_set_audio_source_clears_pitch(monkeypatch):
    monkeypatch.setattr(Config, "TPU_ENGINE_PITCH", True)
    rt = AudioRuntime(audio_source=DummyAudioSource(signal=_tone_signal(0.4)))
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)
    assert len(rt.pitch_data) > 0
    rt.set_audio_source(DummyAudioSource(signal=_tone_signal(0.3)))
    assert len(rt.pitch_data) == 0
