#!/usr/bin/env python3
"""A/B: shipped XLA signal-view path vs the fused Pallas view kernel.

    python tools/viewkernel_ab.py [seconds] [reps]   # default 14400, 8
    python tools/viewkernel_ab.py --sweep 256,1024,2048 [seconds] [reps]

``--sweep`` measures the kernel legs (features + pitch) at each listed
``TPU_VIEW_BLOCK_FRAMES`` grid-step size instead of running the XLA-vs-
kernel comparison; each new size compiles two fresh programs (minutes each
through the remote service, cached afterwards).

Interleaves warm measurements of the two programs (same process, same
tunnel phase) at the bench call length and prints one JSON line per leg:
pipelined per-call time, x-real-time, and feature NMSE vs the NumPy oracle
on a 30 s slice (the kernel must stay inside the 1e-5 gate to be adoptable).

The kernel keeps the DFT output / power spectrum in VMEM instead of
round-tripping ~11 GB of HBM intermediates per 4 h call, with manual
3-pass bf16 matmuls standing in for XLA's "high" — see ops/pallas_view.py.
First run compiles both programs through the remote service (minutes each);
results persist in .jax_cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main(argv):
    sweep = None
    if argv and argv[0] == "--sweep":
        sweep = [int(x) for x in argv[1].split(",") if x]
        argv = argv[2:]
    seconds = float(argv[0]) if argv else 14400.0
    reps = int(argv[1]) if len(argv) > 1 else 8
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    import jax
    import jax.numpy as jnp

    from sspv_tpu.utils.cache import enable_persistent_cache
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline

    enable_persistent_cache()

    from bench import synth_signal, _oracle_features, _nmse

    sr = 16000
    sig_np = synth_signal(seconds, sr)
    sig = jax.device_put(jnp.asarray(sig_np))
    sub = sig_np[: 30 * sr]
    want = _oracle_features(sub)

    def parity(pipe):
        # process_signal_DEVICE routes through the signal-view path — the
        # only place _use_view_kernel is consumed — so the kernel leg's gate
        # measures actual kernel output. (process_signal would take the
        # frames path and print the shipped path's NMSE for both legs,
        # letting a divergent kernel pass the gate.)
        got, _ = pipe.process_signal_device(jnp.asarray(sub, jnp.float32))
        got = jax.device_get(got)
        return {
            "nmse_max": float(f"{max(_nmse(got.energy, want['energy']), _nmse(got.zcr, want['zcr']), _nmse(got.entropy, want['entropy']), _nmse(got.mfcc, want['mfcc'])):.3e}"),
            "view_kernel_engaged": bool(pipe._use_view_kernel),
        }

    def measure(pipe, name, extra=None):
        state0 = pipe.initial_state()
        block, _ = pipe.process_signal_device(sig, state0)  # compile/warm
        jax.block_until_ready(block)
        _ = int(jax.device_get(block.vad[-1]))
        tails = []
        t0 = time.perf_counter()
        for _ in range(reps):
            block, _ = pipe.process_signal_device(sig, state0)
            tails.append(block.vad[-1])
        _ = int(jax.device_get(jnp.stack(tails).sum()))
        per = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "variant": name,
            "time_s": round(per, 5),
            "audio_x_realtime": round(seconds / per, 1),
            **(extra or {}),
        }), flush=True)
        return per

    if sweep is not None:
        import functools

        from sspv_tpu.config import Config
        from sspv_tpu.ops.pitch import pitch_track_signal

        base_bf = Config.TPU_VIEW_BLOCK_FRAMES
        p_seconds = min(3600.0, float(seconds))
        pn = int(p_seconds * sr)
        p_frames = 1 + (pn - 320) // 160
        sig_p = sig[:pn]
        try:
            for bf in sweep:
                Config.TPU_VIEW_BLOCK_FRAMES = bf
                pipe = FeaturePipeline(FeatureConfig(view_kernel=True))
                if not pipe._use_view_kernel:
                    print(json.dumps({"error": "kernel not engaged",
                                      "block_frames": bf}))
                    continue
                measure(pipe, f"pallas_view_bf{bf}", parity(pipe))
                block, _ = pipe.process_signal_device(sig, pipe.initial_state())
                vad_gate = block.vad[:p_frames]
                fn = jax.jit(
                    functools.partial(pitch_track_signal, use_kernel=True)
                )
                f0, conf = fn(sig_p, vad_gate)
                jax.block_until_ready(f0)
                _ = float(jax.device_get(f0[-1]))
                tails = []
                t0 = time.perf_counter()
                for _ in range(reps):
                    f0, conf = fn(sig_p, vad_gate)
                    tails.append(f0[-1] + conf[-1])
                _ = float(jax.device_get(jnp.stack(tails).sum()))
                per = (time.perf_counter() - t0) / reps
                print(json.dumps({
                    "variant": f"pitch_pallas_bf{bf}",
                    "time_s": round(per, 5),
                    "audio_x_realtime": round(p_seconds / per, 1),
                }), flush=True)
        finally:
            Config.TPU_VIEW_BLOCK_FRAMES = base_bf
        return 0

    # Since r3 the kernel is the default (config.py TPU_VIEW_KERNEL=1), so
    # the XLA leg is the explicit opt-out; leg names keep their historical
    # meaning (xla_view vs pallas_view_kernel).
    shipped = FeaturePipeline(FeatureConfig(view_kernel=False))
    kernel = FeaturePipeline(FeatureConfig(view_kernel=True))
    if not kernel._use_view_kernel:
        print(json.dumps({
            "error": "view kernel not engaged (non-TPU backend or geometry)",
            "backend": jax.default_backend(),
        }))
        return 1

    # interleave: shipped, kernel, shipped, kernel — same-phase pairs
    a1 = measure(shipped, "xla_view_shipped", parity(shipped))
    b1 = measure(kernel, "pallas_view_kernel", parity(kernel))
    a2 = measure(shipped, "xla_view_shipped_rep2")
    b2 = measure(kernel, "pallas_view_kernel_rep2")
    print(json.dumps({
        "summary": "pallas_view vs shipped",
        "speedup_best": round(min(a1, a2) / min(b1, b2), 3),
        "backend": jax.default_backend(),
        "seconds_per_call": seconds,
    }))

    # Pitch leg (bench.py's pitch methodology, capped at the CLI signal
    # length so a short run can't report throughput against audio it never
    # processed): shipped hop-phase XLA track vs the fused kernel track,
    # both jitted (one program per leg — the eager track would time ~12
    # dispatches per call on the tunneled link).
    import functools

    from sspv_tpu.ops.pitch import pitch_track_signal

    p_seconds = min(3600.0, float(seconds))
    pn = int(p_seconds * sr)
    p_frames = 1 + (pn - 320) // 160
    sig_p = sig[:pn]
    state0 = shipped.initial_state()
    block, _ = shipped.process_signal_device(sig, state0)
    vad_gate = block.vad[:p_frames]

    def measure_pitch(use_kernel, name):
        fn = jax.jit(
            functools.partial(pitch_track_signal, use_kernel=use_kernel)
        )
        f0, conf = fn(sig_p, vad_gate)
        jax.block_until_ready(f0)
        _ = float(jax.device_get(f0[-1]))
        tails = []
        t0 = time.perf_counter()
        for _ in range(reps):
            f0, conf = fn(sig_p, vad_gate)
            tails.append(f0[-1] + conf[-1])
        _ = float(jax.device_get(jnp.stack(tails).sum()))
        per = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "variant": name,
            "time_s": round(per, 5),
            "audio_x_realtime": round(p_seconds / per, 1),
        }), flush=True)
        return per, f0

    pa, f0_x = measure_pitch(False, "pitch_xla_shipped")
    pb, f0_k = measure_pitch(True, "pitch_pallas_kernel")
    match = float(np.mean(
        np.asarray(jax.device_get(f0_x)) == np.asarray(jax.device_get(f0_k))
    ))
    print(json.dumps({
        "summary": "pitch kernel vs shipped",
        "speedup": round(pa / pb, 3),
        "f0_match": round(match, 6),
        "seconds_per_call": p_seconds,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
