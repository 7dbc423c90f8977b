#!/usr/bin/env python3
"""utils: npz session round-trip against the engine's export, RTF timer."""

import time

import numpy as np

from sspv_tpu.config import Config
from sspv_tpu.utils import RealTimeFactor, load_session, validate_session


def test_npz_roundtrip_with_engine(tmp_path):
    from sspv_tpu.runtime import AudioRuntime
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_runtime_engine import DummyAudioSource, _run_engine_to_eof

    rt = AudioRuntime(audio_source=DummyAudioSource(duration_sec=0.3))
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)
    path = rt.save_data(str(tmp_path))

    s = load_session(path)
    assert validate_session(s) == []
    assert s.sample_rate == Config.SAMPLE_RATE
    assert s.num_frames > 0
    assert 0 < s.duration_seconds < 1.0
    e, _, v = rt.get_recent_processed(max_display=10**6)
    np.testing.assert_allclose(s.energies, e)
    np.testing.assert_array_equal(s.vads, v)


def test_load_session_rejects_missing_keys(tmp_path):
    import pytest

    p = tmp_path / "bad.npz"
    np.savez(p, energies=np.zeros(3))
    with pytest.raises(ValueError, match="missing keys"):
        load_session(str(p))


def test_validate_session_flags_mismatch(tmp_path):
    p = tmp_path / "x.npz"
    np.savez(
        p,
        energies=np.zeros(3), zcrs=np.zeros(2), vads=np.array([0, 1, 2]),
        spec_entropy=np.zeros(3, np.float32),
        vads_adaptive=np.zeros(3, np.float32),
        sample_rate=np.int32(16000), frame_size=np.int32(320),
        hop_size=np.int32(160),
    )
    problems = validate_session(load_session(str(p)))
    assert any("zcrs" in m for m in problems)
    assert any("binary" in m for m in problems)


def test_real_time_factor():
    rtf = RealTimeFactor(audio_seconds=1.0)
    with rtf:
        time.sleep(0.02)
    assert rtf.elapsed >= 0.02
    assert rtf.speedup <= 50.0
    assert np.isclose(rtf.factor * rtf.speedup, 1.0)


def test_real_time_factor_zero_guards():
    """elapsed==0 means unmeasurably fast (inf x), not 0 x; audio==0 with
    wall time means infinitely slow (inf factor), not 0."""
    from sspv_tpu.utils.profiling import RealTimeFactor

    rtf = RealTimeFactor(audio_seconds=2.0)
    assert rtf.speedup == float("inf")  # elapsed still 0
    assert rtf.factor == 0.0
    rtf2 = RealTimeFactor(audio_seconds=0.0)
    rtf2.elapsed = 1.0
    assert rtf2.factor == float("inf")
    assert rtf2.speedup == 0.0
    rtf3 = RealTimeFactor(audio_seconds=0.0)
    assert rtf3.factor == 0.0 and rtf3.speedup == 0.0


def test_session_duration_guards_zero_rate():
    from sspv_tpu.utils.npz_io import SessionData, validate_session

    s = SessionData(
        energies=np.zeros(5), zcrs=np.zeros(5), vads=np.zeros(5, np.int32),
        spec_entropy=np.zeros(5, np.float32),
        vads_adaptive=np.zeros(5, np.float32),
        sample_rate=0, frame_size=320, hop_size=160,
    )
    assert s.duration_seconds == 0.0  # no ZeroDivisionError
    assert any("sample_rate" in p for p in validate_session(s))


def test_load_session_surfaces_analyze_schema_extras(tmp_path):
    """The analyze/batch per-file schema adds mfcc/f0/pitch_confidence on
    top of the engine's 8 required keys; load_session must surface them
    (None for engine/reference files) and validate their shapes."""
    import numpy as np

    from sspv_tpu.utils.export import export_features_npz
    from sspv_tpu.utils.npz_io import load_session, validate_session

    n = 42
    sl = {
        "energy": np.ones(n), "zcr": np.zeros(n), "entropy": np.zeros(n),
        "vad": np.ones(n, np.int32), "vad_adaptive": np.zeros(n),
        "mfcc": np.zeros((n, 13), np.float32),
        "f0": np.full(n, 120.0, np.float32),
        "pitch_confidence": np.full(n, 0.5, np.float32),
    }
    path = str(tmp_path / "s.npz")
    export_features_npz(path, sl, 16000, 320, 160)
    s = load_session(path)
    assert validate_session(s) == []
    assert s.f0.shape == s.pitch_confidence.shape == (n,)
    assert s.mfcc.shape == (n, 13)
    # shape problems are reported, not crashed on
    bad = s._replace(f0=np.zeros(n + 3, np.float32))
    assert any("f0" in p for p in validate_session(bad))
