#!/usr/bin/env python3
"""Attribute the per-device-call RSS growth to a layer.

The soaks establish a flat ~0.084 MB/call RSS growth on the tunneled TPU
client (CPU control runs are flat — docs/benchmarks.md soak table), always
mitigated by dispatch coalescing but never root-caused (VERDICT r4 #2
stretch). This probe runs the streaming engine hard and samples, per ~15 s:

  - process RSS (the ground truth that grows)
  - tracemalloc traced bytes (ALL live Python-level allocations: numpy
    host arrays, dicts, deques — if the leak were host-Python, this curve
    would track RSS)
  - live jax device-array count (``jax.live_arrays()`` — if the leak were
    leaked jax buffers/handles at the Python layer, this count would climb
    with calls)

Verdict logic: RSS slope positive while tracemalloc slope ~0 and the live
-array count flat pins the growth BELOW Python — in the native PJRT/tunnel
client (per-call RPC bookkeeping), which matches the observed
per-CALL (not per-byte) proportionality and the flat CPU control.

    python tools/leak_probe.py [seconds] [sample_every_s]

Prints one JSON line per sample plus a final fit line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import tracemalloc

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
    ),
)


def rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def fit(xs, ys):
    n = len(xs)
    if n < 2 or max(xs) == min(xs):
        return 0.0
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main(argv) -> int:
    seconds = float(argv[0]) if argv else 480.0
    every = float(argv[1]) if len(argv) > 1 else 15.0

    import jax

    from _sources import LoopingPacedSource
    from sspv_tpu.config import Config
    from sspv_tpu.runtime import AudioRuntime
    from sspv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    Config.load_from_env()
    rt = AudioRuntime(audio_source=LoopingPacedSource(Config.SAMPLE_RATE))
    rt.start()
    # Warm BEFORE tracemalloc and before the sampling clock: the engine's
    # first dispatch may cold-compile through the remote service (minutes),
    # and tracemalloc multiplies trace/lowering cost — starting the budget
    # here made every r5 attempt time out inside its own warm-up. Wait for
    # steady dispatches first; the slope fit only needs the steady region.
    warm_t0 = time.time()
    while rt.dispatch_count < 5 and time.time() - warm_t0 < 1500:
        if rt.last_error is not None:
            print(json.dumps({"warmup_error": rt.last_error}), flush=True)
            rt.stop()
            return 1
        time.sleep(5)
    print(
        json.dumps(
            {
                "warmed_in_s": round(time.time() - warm_t0, 1),
                "calls_at_warm": rt.dispatch_count,
            }
        ),
        flush=True,
    )
    if rt.dispatch_count == 0:
        rt.stop()
        return 1
    tracemalloc.start()
    t0 = time.time()
    rows = []
    try:
        while time.time() - t0 < seconds:
            time.sleep(every)
            cur, _peak = tracemalloc.get_traced_memory()
            row = {
                "t_s": round(time.time() - t0, 1),
                "rss_mb": round(rss_mb(), 2),
                "tracemalloc_mb": round(cur / 1048576.0, 3),
                "live_jax_arrays": len(jax.live_arrays()),
                "calls": rt.dispatch_count,
                "err": rt.last_error,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            if rt.last_error is not None:
                break
    finally:
        rt.stop()
    # steady-state fit: drop the first third (warm-up / executable loads)
    steady = [r for r in rows if r["calls"] > 0][len(rows) // 3:]
    if len(steady) >= 3 and steady[-1]["calls"] > steady[0]["calls"]:
        calls = [r["calls"] for r in steady]
        out = {
            "verdict_input": {
                "rss_mb_per_call": round(
                    fit(calls, [r["rss_mb"] for r in steady]), 5
                ),
                "tracemalloc_mb_per_call": round(
                    fit(calls, [r["tracemalloc_mb"] for r in steady]), 6
                ),
                "live_arrays_per_call": round(
                    fit(calls, [r["live_jax_arrays"] for r in steady]), 6
                ),
                "calls": steady[-1]["calls"],
                "steady_samples": len(steady),
            }
        }
        vi = out["verdict_input"]
        python_share = (
            vi["tracemalloc_mb_per_call"] / vi["rss_mb_per_call"]
            if vi["rss_mb_per_call"] > 1e-6
            else 0.0
        )
        out["python_level_share_of_leak"] = round(python_share, 4)
        out["verdict"] = (
            "native (PJRT/tunnel client) — Python-level allocations and "
            "live jax-array count do not track the RSS growth"
            if abs(python_share) < 0.2
            and abs(vi["live_arrays_per_call"]) < 0.01
            else "python-level contribution detected — see samples"
        )
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
