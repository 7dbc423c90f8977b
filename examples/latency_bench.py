#!/usr/bin/env python3
"""End-to-end paced streaming latency of the AudioRuntime engine.

Measures, per frame, the wall-clock delay between "the frame's last sample
became available from the (real-time-paced) source" and "the frame's result
appeared in ``processed_data``" — the engine-side equivalent of the
reference's 35.6 ms processing + <50 ms budget row (BASELINE.md).

Usage:
    python examples/latency_bench.py [--mode default|ll] [--chunk 1024]
                                     [--seconds 30] [--warmup 10]

Prints one JSON line per run with median/p90/max latency in ms.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

# allow `python examples/latency_bench.py` from anywhere (script mode puts
# examples/ first on sys.path, not the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _sources import DueTimePacedSource, speech_signal  # noqa: E402


def run_once(mode: str, chunk: int, seconds: float, warmup_s: float) -> dict:
    import jax  # noqa: F401  (backend resolution before Config import is fine)

    from sspv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from sspv_tpu.config import Config
    from sspv_tpu.runtime import AudioRuntime

    Config.TPU_LOW_LATENCY = 1 if mode == "ll" else 0
    Config.PROCESSED_DATA_BUFFER_SIZE = 10**6  # keep every frame observable

    src = DueTimePacedSource(
        speech_signal(seconds, Config.SAMPLE_RATE), Config.SAMPLE_RATE, chunk
    )
    rt = AudioRuntime(audio_source=src)
    rt.auto_stop_on_eof = True

    # pre-warm the programs the engine will ACTUALLY dispatch (the packed
    # paths, per its samples/frames layout decision) so compiles or cache
    # loads never land inside the paced measurement window — warming the
    # unpacked process_block would leave every real program cold
    for b in rt._buckets:
        packed0 = rt.pipeline.initial_packed_state()
        if rt._samples_dispatch:
            blen = (b - 1) * rt.hop_size + rt.frame_size
            out, _ = rt.pipeline.process_signal_packed(
                np.zeros((blen,), np.int16), packed0, blen
            )
        else:
            out, _ = rt.pipeline.process_block_packed(
                np.zeros((b, Config.FRAME_SIZE), np.float32), packed0, b - 1
            )
        jax.block_until_ready(out)

    # publish-time watcher: first-seen wall-clock per frame index
    pub_times: list[float] = []
    stop = threading.Event()

    def watch():
        while not stop.is_set():
            n = len(rt.processed_data)
            now = time.perf_counter()
            while len(pub_times) < n:
                pub_times.append(now)
            time.sleep(0.0005)

    w = threading.Thread(target=watch, daemon=True)
    w.start()
    rt.start()
    deadline = time.time() + seconds + 120
    while rt.is_running and time.time() < deadline:
        time.sleep(0.02)
    rt.stop()
    # let the watcher observe the drain
    time.sleep(0.05)
    n_final = len(rt.processed_data)
    now = time.perf_counter()
    while len(pub_times) < n_final:
        pub_times.append(now)
    stop.set()
    w.join()
    if rt.last_error is not None:
        raise rt.last_error

    frame, hop = Config.FRAME_SIZE, Config.HOP_SIZE
    lat = []
    for i in range(len(pub_times)):
        last_idx = i * hop + frame - 1
        k = last_idx // chunk
        if k >= len(src.chunk_end_times):
            break
        lat.append(pub_times[i] - src.chunk_end_times[k])
    lat = np.array(lat[int(warmup_s * Config.SAMPLE_RATE / hop):]) * 1000.0
    assert lat.size > 0, "no frames measured after warmup"

    return {
        "metric": "paced_streaming_latency",
        "mode": mode,
        "chunk_samples": chunk,
        "chunk_ms": round(chunk / Config.SAMPLE_RATE * 1000, 1),
        "frames": int(lat.size),
        "median_ms": round(float(np.median(lat)), 1),
        "p90_ms": round(float(np.percentile(lat, 90)), 1),
        "max_ms": round(float(lat.max()), 1),
        "buckets": list(rt._buckets),
        "backend": __import__("jax").default_backend(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["default", "ll"], default="default")
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--warmup", type=float, default=10.0)
    args = ap.parse_args()
    print(json.dumps(run_once(args.mode, args.chunk, args.seconds, args.warmup)))


if __name__ == "__main__":
    main()
