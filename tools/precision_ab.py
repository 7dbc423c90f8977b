#!/usr/bin/env python3
"""Same-phase A/B of matmul precision for the flagship offline path.

The r3 stage ablation ran at 3600 s/call where a ~30 ms per-dispatch tunnel
floor hides compute differences (docs/benchmarks.md). This tool re-asks the
precision question at the shipped 14,400 s/call granularity, where the
marginal (per-audio-hour) cost dominates and is compute-bound on the DFT/
mel/DCT matmuls: "highest" (f32-accurate) vs "high" (bf16_3x — ~2x MXU
rate) vs opt-in "default" (one bf16 pass).

Runs are interleaved A/B/A/B within one process so both variants see the
same tunnel phase (the known failure mode of cross-run comparisons here),
and each variant's feature NMSE vs the NumPy oracle is printed next to its
timing so a speed win can be judged against the <=1e-5 parity gate.

Usage: python tools/precision_ab.py [seconds_per_call] [rounds]
Appends one JSON line per (variant, round) to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv) -> int:
    seconds = float(argv[0]) if argv else 14400.0
    rounds = int(argv[1]) if len(argv) > 1 else 4
    variants = argv[2].split(",") if len(argv) > 2 else ["highest", "high"]

    import jax
    import jax.numpy as jnp

    from bench import _nmse, _oracle_features, synth_signal
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
    from sspv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    sr = 16000
    sig_np = synth_signal(seconds, sr)
    sig = jax.device_put(jnp.asarray(sig_np))

    reps = 8
    pipes = {}
    for v in variants:
        pipes[v] = FeaturePipeline(FeatureConfig(precision=v))

    # parity first (30 s slice vs the NumPy oracle), measured on the SAME
    # signal-view device path the timing loop runs — process_signal would
    # gate every variant on the frames/Pallas path, where Mosaic rounds
    # "high" up to HIGHEST and the printed NMSE would not describe the
    # program being timed (same fix as ablate_bench/viewkernel_ab).
    sub = sig_np[: 30 * sr]
    want = _oracle_features(sub)
    nmse = {}
    for v, pipe in pipes.items():
        got, _ = pipe.process_signal_device(
            jax.device_put(jnp.asarray(sub)), pipe.initial_state()
        )
        nmse[v] = {
            "energy": _nmse(got.energy, want["energy"]),
            "zcr": _nmse(got.zcr, want["zcr"]),
            "entropy": _nmse(got.entropy, want["entropy"]),
            "mfcc": _nmse(got.mfcc, want["mfcc"]),
        }
        state0 = pipe.initial_state()
        block, _ = pipe.process_signal_device(sig, state0)
        jax.block_until_ready(block)
        _ = int(jax.device_get(block.vad[-1]))

    for r in range(rounds):
        for v, pipe in pipes.items():
            state0 = pipe.initial_state()
            tails = []
            t0 = time.perf_counter()
            for _ in range(reps):
                block, _ = pipe.process_signal_device(sig, state0)
                tails.append(block.vad[-1])
            _ = int(jax.device_get(jnp.stack(tails).sum()))
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "variant": v,
                "round": r,
                "seconds_per_call": seconds,
                "ms_per_call": round(dt * 1e3, 2),
                "audio_x_realtime": round(seconds / dt, 1),
                "nmse_max": float(f"{max(nmse[v].values()):.3e}"),
                "nmse": {k: float(f"{x:.3e}") for k, x in nmse[v].items()},
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
