#!/usr/bin/env python3
"""The lax.scan-over-blocks long-signal path must match the single-block path
exactly (VAD bits) / to float tolerance (features)."""

import numpy as np

from sspv_tpu.ops.pipeline import FeaturePipeline, FeatureConfig


def test_scan_blocks_match_single_block(monkeypatch):
    rng = np.random.default_rng(2)
    sig = rng.normal(0, 3000, (16000 * 2,)).astype(np.float32)

    pipe_one = FeaturePipeline(FeatureConfig())
    want, want_state = pipe_one.process_signal_device(sig)

    pipe_scan = FeaturePipeline(FeatureConfig())
    monkeypatch.setattr(pipe_scan, "SCAN_BLOCK_FRAMES", 64)
    got, got_state = pipe_scan.process_signal_device(sig)

    np.testing.assert_allclose(np.asarray(got.energy), np.asarray(want.energy), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.mfcc), np.asarray(want.mfcc), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.vad), np.asarray(want.vad))
    np.testing.assert_array_equal(
        np.asarray(got.vad_adaptive), np.asarray(want.vad_adaptive)
    )
    assert int(got_state.count) == int(want_state.count)
    assert int(got_state.last_voiced) == int(want_state.last_voiced)
    np.testing.assert_allclose(
        np.asarray(got_state.energy_buf), np.asarray(want_state.energy_buf), rtol=1e-5
    )
