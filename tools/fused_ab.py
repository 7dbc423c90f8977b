#!/usr/bin/env python3
"""A/B: fused features+VAD+pitch dispatch vs the two-call construction.

Serving-style measurement: per-request latency of ONE pitch-bearing
analysis (what a /v1/pitch client sees, minus HTTP), serialized — each
iteration dispatches, synchronizes, and materializes every output on host,
because a short request cannot amortize across a pipeline.

    python tools/fused_ab.py 2 8

One JSON line per payload length: fused (process_signal_pitch_auto, one
dispatch + one transfer) vs two-call (process_signal_auto then
pitch_signal_auto, two of each), plus the streaming variants (stream_pitch
vs stream, one engine-bucket block). Outputs are bit-identical by contract
(tests/test_signal_auto.py, tests/test_stream_pitch.py); this measures the
dispatch/transfer economics only.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _serialized(fn, reps: int = 12) -> float:
    """Best-of serialized per-call seconds; materializes all outputs."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        for x in out:
            np.asarray(x)
        times.append(time.perf_counter() - t0)
    return min(times)


def main(argv):
    lengths = [float(a) for a in argv] or [2.0, 8.0]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from bench import synth_signal
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
    from sspv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    sr = 16000
    pipe = FeaturePipeline(FeatureConfig())

    for seconds in lengths:
        sig = (synth_signal(seconds) * 0.25).astype(np.int16)

        def fused():
            block, _, f0, conf = pipe.process_signal_pitch_auto(sig)
            return (*block, f0, conf)

        def two_call():
            block, _ = pipe.process_signal_auto(sig)
            vad = np.asarray(block.vad)
            f0, conf = pipe.pitch_signal_auto(sig, vad)
            return (*block, f0, conf)

        # warm both program sets (compile once, then measure)
        for f in (fused, two_call):
            for x in f():
                np.asarray(x)
        t_fused = _serialized(fused)
        t_two = _serialized(two_call)

        # parity spot-check on this exact payload
        bf = fused()
        bt = two_call()
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(bf, bt)
        )

        print(json.dumps({
            "tool": "fused_ab", "seconds": seconds,
            "backend": jax.default_backend(),
            "fused_ms": round(t_fused * 1e3, 3),
            "two_call_ms": round(t_two * 1e3, 3),
            "speedup": round(t_two / t_fused, 3),
            "bit_identical": bool(same),
        }), flush=True)

    # streaming: one engine-bucket block with and without the fused pitch
    from sspv_tpu.config import Config, parse_buckets

    stream_buckets = parse_buckets(
        getattr(Config, "TPU_STREAM_BUCKETS", (32, 256, 2048))
    )
    bucket = stream_buckets[min(1, len(stream_buckets) - 1)]
    n = (bucket - 1) * pipe.cfg.hop_size + pipe.cfg.frame_size
    chunk = (synth_signal(n / sr) * 0.25).astype(np.int16)[:n]

    def stream_plain():
        (block,) = list(pipe.stream(iter([chunk])))
        return tuple(block)

    def stream_pitch():
        ((block, f0, conf),) = list(pipe.stream_pitch(iter([chunk])))
        return (*block, f0, conf)

    for f in (stream_plain, stream_pitch):
        for x in f():
            np.asarray(x)
    t_plain = _serialized(stream_plain)
    t_pitch = _serialized(stream_pitch)
    print(json.dumps({
        "tool": "fused_ab_stream", "bucket_frames": bucket,
        "backend": jax.default_backend(),
        "stream_ms": round(t_plain * 1e3, 3),
        "stream_pitch_ms": round(t_pitch * 1e3, 3),
        "pitch_overhead_pct": round(100 * (t_pitch / t_plain - 1), 1),
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
