#!/usr/bin/env python3
"""Multi-device sharding: data-parallel batch and sequence-sharded long-signal
paths must agree with the single-device pipeline exactly."""

import numpy as np
import jax

from sspv_tpu.ops.pipeline import FeaturePipeline, FeatureConfig
from sspv_tpu.parallel import make_mesh, BatchPipeline


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "seq")


def test_batch_matches_single_device():
    rng = np.random.default_rng(0)
    signals = rng.normal(0, 3000, (8, 16000)).astype(np.float32)
    mesh = make_mesh(8)
    bp = BatchPipeline(mesh)
    block, states = bp.process_batch(signals)

    pipe = FeaturePipeline(FeatureConfig())
    for i in range(8):
        want, _ = pipe.process_signal_device(signals[i])
        np.testing.assert_allclose(
            np.asarray(block.energy[i]), np.asarray(want.energy), rtol=2e-6
        )
        np.testing.assert_array_equal(
            np.asarray(block.vad[i]), np.asarray(want.vad)
        )
        np.testing.assert_allclose(
            np.asarray(block.mfcc[i]), np.asarray(want.mfcc), atol=2e-4
        )


def test_long_signal_sequence_sharding():
    rng = np.random.default_rng(1)
    sig = rng.normal(0, 3000, (16000 * 4,)).astype(np.float32)
    mesh = make_mesh(8)
    bp = BatchPipeline(mesh)
    block, state = bp.process_long(sig)

    pipe = FeaturePipeline(FeatureConfig())
    want, want_state = pipe.process_signal_device(sig)
    np.testing.assert_allclose(
        np.asarray(block.energy), np.asarray(want.energy), rtol=2e-6
    )
    np.testing.assert_array_equal(np.asarray(block.vad), np.asarray(want.vad))
    assert int(state.count) == int(want_state.count)
