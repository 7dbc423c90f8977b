#!/usr/bin/env python3
"""FeaturePipeline.stream generator: chunked iteration == one-shot results."""

import numpy as np

from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline


def test_stream_generator_matches_oneshot():
    rng = np.random.default_rng(8)
    sig = rng.normal(0, 3000, 16000 * 2).astype(np.float32)
    pipe = FeaturePipeline(FeatureConfig())

    want, _ = pipe.process_signal(sig)

    chunk_sizes = [1024, 333, 7000, 9000, 100, 16000]
    chunks, pos = [], 0
    for s in chunk_sizes:
        chunks.append(sig[pos:pos + s])
        pos += s
    chunks.append(sig[pos:])

    vads, energies = [], []
    for block in pipe.stream(chunks):
        vads.append(np.asarray(block.vad))
        energies.append(np.asarray(block.energy))
    got_vad = np.concatenate(vads)
    got_energy = np.concatenate(energies)

    n = got_vad.size
    np.testing.assert_array_equal(got_vad, np.asarray(want.vad)[:n])
    np.testing.assert_allclose(got_energy, np.asarray(want.energy)[:n], rtol=1e-6)
    assert n == np.asarray(want.vad).size  # 2 s splits cleanly into full frames


def test_stream_generator_int16_chunks():
    rng = np.random.default_rng(9)
    sig = rng.integers(-20000, 20000, 8000, dtype=np.int16)
    pipe = FeaturePipeline(FeatureConfig())
    blocks = list(pipe.stream([sig[:3000], sig[3000:]]))
    total = sum(np.asarray(b.energy).size for b in blocks)
    want, _ = pipe.process_signal(sig)
    assert total == np.asarray(want.energy).size
