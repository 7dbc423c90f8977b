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


def test_stream_generator_top_bucket_blocked_path():
    """A drain larger than the 2048-frame top bucket: the exact-2048 slice
    and the 256-padded remainder are both history_len multiples, so the
    production-default blocked trailing-sum branch must be what compiles
    (trace counter), and decisions must match the one-shot (conv-path)
    result — both are oracle-exact, so they must agree with each other."""
    from sspv_tpu.ops import vad as vad_ops

    rng = np.random.default_rng(10)
    n_frames = 2048 + 151
    n = (n_frames - 1) * 160 + 320  # exactly n_frames full frames
    t = np.arange(n) / 16000.0
    sig = np.where(
        (t * 2).astype(int) % 3 == 1,
        7000 * np.sin(2 * np.pi * 160 * t),
        rng.normal(0, 2200, n),
    ).astype(np.float32)

    pipe = FeaturePipeline(FeatureConfig())
    assert pipe.cfg.vad_trailing_impl == "blocked"
    before = vad_ops.BLOCKED_TRACE_COUNT
    blocks = list(pipe.stream([sig], buckets=(32, 256, 2048)))
    assert vad_ops.BLOCKED_TRACE_COUNT > before
    got_vad = np.concatenate([np.asarray(b.vad) for b in blocks])
    got_energy = np.concatenate([np.asarray(b.energy) for b in blocks])
    assert got_vad.size == n_frames
    assert [np.asarray(b.vad).size for b in blocks] == [2048, 151]

    want, _ = pipe.process_signal(sig)
    np.testing.assert_array_equal(got_vad, np.asarray(want.vad))
    np.testing.assert_allclose(got_energy, np.asarray(want.energy), rtol=1e-6)


def test_stream_honors_string_buckets(monkeypatch):
    """A string TPU_STREAM_BUCKETS (uncoerced YAML / direct monkeypatch)
    must parse through the shared parser, not iterate character-by-character."""
    from sspv_tpu.config import Config
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline

    monkeypatch.setattr(Config, "TPU_STREAM_BUCKETS", "64,512")
    pipe = FeaturePipeline(FeatureConfig())
    sig = np.random.default_rng(0).normal(0, 800, 16000).astype(np.float32)
    chunks = [sig[i:i + 3000] for i in range(0, len(sig), 3000)]
    total = sum(
        int(np.asarray(b.energy).shape[0]) for b in pipe.stream(iter(chunks))
    )
    assert total == 1 + (len(sig) - 320) // 160
