#!/usr/bin/env python3
"""Generate committed sample ``.npz`` exports through the real streaming
engine (the reference ships 5 such files at its repo root; N ∈ {21, 22, 100}
frames). Each file goes through AudioRuntime end-to-end on whatever backend
is active — run on the TPU so the committed artifacts are TPU-produced.

Usage: python examples/generate_samples.py [outdir]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _paced_signals():
    """(name, int16 signal) pairs with varied lengths/content; frame counts
    mirror the reference's committed samples (21/22/100) plus two more."""
    from sspv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(REPO, ".jax_cache"))

    from sspv_tpu.config import Config

    sr = Config.SAMPLE_RATE
    frame, hop = Config.FRAME_SIZE, Config.HOP_SIZE

    def n_samples(n_frames):
        return (n_frames - 1) * hop + frame

    rng = np.random.default_rng(42)
    out = []

    n = n_samples(21)  # tone burst in noise floor
    t = np.arange(n) / sr
    sig = rng.normal(0, 300, n)
    sig[n // 4: 3 * n // 4] += 9000 * np.sin(2 * np.pi * 170 * t[n // 4: 3 * n // 4])
    out.append(("tone_burst_21f", sig.astype(np.int16)))

    n = n_samples(22)  # pure noise (unvoiced)
    out.append(("noise_22f", rng.normal(0, 2500, n).astype(np.int16)))

    n = n_samples(100)  # alternating voiced/unvoiced
    t = np.arange(n) / sr
    seg = (t * 4).astype(int) % 2
    sig = np.where(seg == 0, 8000 * np.sin(2 * np.pi * 140 * t)
                   + 2500 * np.sin(2 * np.pi * 280 * t), rng.normal(0, 2000, n))
    out.append(("alternating_100f", sig.astype(np.int16)))

    n = n_samples(55)  # speech-like AM tone
    t = np.arange(n) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    sig = env * 9000 * np.sin(2 * np.pi * 190 * t) + rng.normal(0, 400, n)
    out.append(("am_tone_55f", sig.astype(np.int16)))

    n = n_samples(100)  # silence -> tone -> silence (hangover visible)
    t = np.arange(n) / sr
    sig = rng.normal(0, 80, n)
    sig[n // 3: n // 2] += 10000 * np.sin(2 * np.pi * 160 * t[n // 3: n // 2])
    out.append(("silence_tone_100f", sig.astype(np.int16)))

    return out


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "examples", "sample_outputs")
    os.makedirs(outdir, exist_ok=True)

    from _sources import ArraySource
    from sspv_tpu.runtime import AudioRuntime

    import jax

    from sspv_tpu.config import Config
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline

    # ONE pipeline across all sample runs: each FeaturePipeline carries its
    # own jitted-callable set, and per-process executable loads through the
    # remote client are expensive (the multistream bench documents the
    # shared-pipeline pattern for exactly this reason)
    shared_pipe = FeaturePipeline(FeatureConfig.from_config(Config))
    for name, sig in _paced_signals():
        rt = AudioRuntime(audio_source=ArraySource(sig, Config.SAMPLE_RATE), pipeline=shared_pipe)
        rt.auto_stop_on_eof = True
        rt.start()
        t0 = time.time()
        while rt.is_running and time.time() - t0 < 600:
            time.sleep(0.01)
        rt.stop()
        assert rt.last_error is None, rt.last_error
        n = len(rt.processed_data)
        # a timed-out/partial run (tunnel outage, cold remote compile past
        # the 600 s wait) must not be committed as a sample artifact
        expected = 1 + (len(sig) - Config.FRAME_SIZE) // Config.HOP_SIZE
        assert n == expected, (name, n, expected)
        path = rt.save_data(outdir)
        # name the file by its content, keeping the reference's prefix scheme
        dst = os.path.join(outdir, f"voice_processing_data_{name}.npz")
        os.replace(path, dst)
        print(f"{dst}: {n} frames, backend={jax.default_backend()}")


if __name__ == "__main__":
    main()
