#!/usr/bin/env python3
"""Batch-process a directory of audio files into per-file feature exports.

Production-style offline pipeline: decode each file host-side, then run the
fused frame→MFCC→VAD pipeline per file (sequential; single device). For
mesh-sharded batch processing of equal-length signals see
``sspv_tpu.parallel.BatchPipeline`` and ``examples/sharded_throughput.py``.

    python examples/process_files.py INPUT_DIR [OUTPUT_DIR]

Writes ``<name>.features.npz`` per input file with keys
``energies, zcrs, vads, spec_entropy, vads_adaptive, mfcc, f0, sample_rate,
frame_size, hop_size`` (the engine's export schema plus MFCC and pitch).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    in_dir = argv[0]
    out_dir = argv[1] if len(argv) > 1 else in_dir

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from sspv_tpu.config import Config
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
    from sspv_tpu.ops.pitch import pitch_track
    from sspv_tpu.runtime.audio_source import FileAudioSource
    from sspv_tpu.ui.files import collect_audio_files
    from sspv_tpu.utils.cache import enable_persistent_cache
    from sspv_tpu.utils.native import frame_i16_to_f32

    enable_persistent_cache()
    files = collect_audio_files(in_dir)
    if not files:
        print(f"no supported audio files in {in_dir}")
        return 1
    os.makedirs(out_dir, exist_ok=True)

    pipe = FeaturePipeline(FeatureConfig.from_config(Config))
    total_audio = 0.0
    t_start = time.perf_counter()
    for path in files:
        src = FileAudioSource(path, sample_rate=Config.SAMPLE_RATE)
        src.open()
        pcm = src.read(1 << 62)
        src.close()
        total_audio += len(pcm) / Config.SAMPLE_RATE

        block, _ = pipe.process_signal(pcm)
        jax.block_until_ready(block)
        # second host framing pass, for the pitch tracker's raw frames
        frames = frame_i16_to_f32(pcm, Config.FRAME_SIZE, Config.HOP_SIZE)
        f0, _conf = (
            pitch_track(frames, np.asarray(block.vad), Config.SAMPLE_RATE)
            if frames.shape[0]
            else (np.zeros(0, np.float32), None)
        )

        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(out_dir, f"{name}.features.npz")
        np.savez(
            out,
            energies=np.asarray(block.energy, np.float64),
            zcrs=np.asarray(block.zcr, np.float64),
            vads=np.asarray(block.vad, np.int32),
            spec_entropy=np.asarray(block.entropy, np.float32),
            vads_adaptive=np.asarray(block.vad_adaptive, np.float32),
            mfcc=np.asarray(block.mfcc, np.float32),
            f0=np.asarray(f0, np.float32),
            sample_rate=np.int32(Config.SAMPLE_RATE),
            frame_size=np.int32(Config.FRAME_SIZE),
            hop_size=np.int32(Config.HOP_SIZE),
        )
        print(f"{path}: {np.asarray(block.energy).shape[0]} frames -> {out}")

    elapsed = time.perf_counter() - t_start
    if elapsed > 0:
        print(
            f"processed {total_audio:.1f}s of audio in {elapsed:.2f}s "
            f"({total_audio/elapsed:.1f}x real-time, incl. decode & compile)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
