#!/usr/bin/env python3
"""Load the reference repo's committed sample exports with our session
loader — direct evidence of .npz schema compatibility. Skipped when the
reference snapshot isn't mounted."""

import glob
import os

import numpy as np
import pytest

from sspv_tpu.utils import load_session, validate_session

REF_GLOB = "/root/reference/voice_processing_data_*.npz"


@pytest.mark.skipif(not glob.glob(REF_GLOB), reason="reference snapshot not mounted")
def test_reference_sample_exports_load():
    paths = sorted(glob.glob(REF_GLOB))
    assert paths
    for p in paths:
        s = load_session(p)
        assert validate_session(s) == [], p
        assert s.sample_rate == 16000
        assert s.frame_size == 320 and s.hop_size == 160
        assert s.energies.dtype == np.float64
        assert s.vads.dtype == np.int32
        assert s.spec_entropy.dtype == np.float32
        assert s.num_frames in (21, 22, 100)  # per SURVEY.md §2


@pytest.mark.skipif(not glob.glob(REF_GLOB), reason="reference snapshot not mounted")
def test_our_export_matches_reference_schema_exactly():
    """Key set and dtypes of our engine export == the reference's samples."""
    import sys, time

    sys.path.insert(0, os.path.dirname(__file__))
    from test_runtime_engine import DummyAudioSource, _run_engine_to_eof

    from sspv_tpu.runtime import AudioRuntime

    rt = AudioRuntime(audio_source=DummyAudioSource(duration_sec=0.3))
    rt.auto_stop_on_eof = True
    _run_engine_to_eof(rt)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ours = rt.save_data(d)
        with np.load(ours) as a, np.load(sorted(glob.glob(REF_GLOB))[0]) as b:
            assert set(a.files) == set(b.files)
            for k in b.files:
                assert a[k].dtype == b[k].dtype, (k, a[k].dtype, b[k].dtype)
                assert a[k].ndim == b[k].ndim, k
