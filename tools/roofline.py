#!/usr/bin/env python3
"""Roofline / time-accounting decomposition of the headline 4 h call.

VERDICT r3 #1: the 37.8 ms per 14,400 s features call was unaccounted for —
single-digit-percent MXU utilization with no committed profile. This tool
decomposes the call into purpose-built subprograms, times each warm and
pipelined (bench.py methodology), attaches XLA's own cost analysis
(FLOPs / bytes accessed) per program, and optionally captures a
jax.profiler device trace and prints the top ops by self time.

    python tools/roofline.py [--seconds 14400] [--trace] [--skip-r3]

One JSON line per measurement. Subprograms:

  feat_shipped    the shipped features+VAD program (r4: hoisted — one fused
                  kernel sweep + one full-length parallel-prefix VAD)
  feat_r3_scan    the r3 construction (features+VAD inside one
                  VadState-carrying lax.scan over 32k-frame blocks) —
                  rebuilt here verbatim for a same-day A/B
  feat_only       the fused view kernel alone, full sweep, no VAD
  vad_only        the full-length composite VAD over precomputed features
  rows_only       just building + consuming the (F+1, hop) top/bot inputs
                  (pad+slice) — the kernel-input materialization cost
  pitch_shipped   the shipped pitch program (r4: one fused kernel sweep)
  pitch_r3_scan   the r3 construction (fused kernel inside a lax.scan over
                  32k-frame row blocks)

Cost-analysis caveat: XLA reports optimized-HLO flops/bytes; Pallas kernel
internals are opaque to it (reported as custom-call), so kernel-path rows
carry analytic FLOP counts computed from shapes instead.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def synth(seconds: float, sr: int = 16000) -> np.ndarray:
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import bench

    return bench.synth_signal(seconds, sr)


def timed(fn, probe, rounds=3, reps=4) -> dict:
    """Warm + pipelined timing, median over rounds — EXACTLY the bench
    methodology: async dispatch, per-rep scalars stacked ON DEVICE and one
    device_get for the whole round. (The first r4 run of this tool consumed
    each rep with its own blocking device_get — one ~25-30 ms tunnel round
    trip PER REP — which inflated every row by ~30 ms and made a 2.4 ms
    device program read as 40 ms; docs/benchmarks.md roofline notes.)
    ``probe(out) -> 0-d jnp scalar`` must depend on the output."""
    import jax
    import jax.numpy as jnp

    out = fn()
    jax.block_until_ready(out)
    _ = np.asarray(jax.device_get(probe(out)))
    samples = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        probes = [probe(fn()) for _ in range(reps)]
        _ = np.asarray(jax.device_get(jnp.stack(probes).sum()))
        samples.append((time.perf_counter() - t0) / reps)
    s = sorted(samples)
    return {
        "ms_median": round(1e3 * s[len(s) // 2], 2),
        "ms_best": round(1e3 * s[0], 2),
        "ms_spread": round(1e3 * (s[-1] - s[0]), 2),
    }


def cost_of(jitted, *args) -> dict:
    """XLA cost analysis of the compiled program (optimized HLO)."""
    try:
        comp = jitted.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "xla_gflops": round(float(ca.get("flops", 0.0)) / 1e9, 2),
            "xla_gbytes": round(
                float(ca.get("bytes accessed", 0.0)) / 1e9, 3
            ),
        }
    except Exception as e:  # cost analysis is best-effort diagnostics
        return {"cost_analysis_error": str(e)[:120]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=14400.0)
    ap.add_argument("--trace", action="store_true",
                    help="capture a jax.profiler trace of the shipped "
                         "features program and print top ops")
    ap.add_argument("--trace-target", default="feat",
                    choices=("feat", "vad", "pitch"),
                    help="which program --trace captures")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of programs to run")
    ap.add_argument("--skip-r3", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from sspv_tpu.ops import vad as vad_ops
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
    from sspv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    sr = 16000
    sig_np = synth(args.seconds, sr)
    sig = jax.device_put(jnp.asarray(sig_np))
    pipe = FeaturePipeline(FeatureConfig())
    # shipped dispatch since r4: the host-formed (n+1, hop) rows view (free
    # numpy reshape) uploads directly — the device program starts in the
    # tiled 2-D layout, skipping the on-device 1-D->2-D relayout copy.
    # ``sig`` (flat) stays for the *_flat A/B rows.
    sig_rows = jax.device_put(jnp.asarray(pipe.host_rows_view(sig_np)))
    state0 = pipe.initial_state()
    n = 1 + (len(sig_np) - pipe.cfg.frame_size) // pipe.cfg.hop_size
    hop = pipe.cfg.hop_size
    base = {"seconds": args.seconds, "frames": n,
            "backend": jax.default_backend(),
            "view_kernel": pipe._use_view_kernel}

    sel = set(args.only.split(",")) if args.only else None

    def want(name: str) -> bool:
        return sel is None or name in sel

    def emit(name, stats, extra=None):
        row = {"program": name, **base, **stats, **(extra or {})}
        row["x_realtime"] = round(args.seconds / (row["ms_median"] / 1e3), 0)
        print(json.dumps(row), flush=True)

    def consume_block(out):
        block = out[0] if isinstance(out, tuple) else out
        leaf = block.vad if hasattr(block, "vad") else block["energy"]
        return leaf[-1].astype(jnp.float32)

    # -- shipped features+VAD ------------------------------------------------
    def feat_shipped():
        return pipe.process_signal_device(sig_rows, state0)

    jit_shipped = pipe._signal_jit
    if want("feat_shipped"):
        emit("feat_shipped", timed(feat_shipped, consume_block,
                                   rounds=args.rounds),
             cost_of(jit_shipped, sig_rows, state0))

    # same program family fed the flat 1-D signal (pays the on-device
    # relayout) — the A/B for the rows-view dispatch
    if want("feat_shipped_flat"):
        emit("feat_shipped_flat",
             timed(lambda: pipe.process_signal_device(sig, state0),
                   consume_block, rounds=args.rounds),
             cost_of(jit_shipped, sig, state0))

    # -- r3 construction: features+VAD inside one VadState-carrying scan ----
    if not args.skip_r3 and want("feat_r3_scan"):
        b = pipe.SCAN_BLOCK_FRAMES

        def r3_impl(signal, state):
            x = jnp.asarray(signal, jnp.float32)
            rows = x[: (n + 1) * hop].reshape(n + 1, hop)
            nb = -(-n // b)
            pad_rows = nb * b + 1 - (n + 1)
            if pad_rows:
                rows = jnp.pad(rows, ((0, pad_rows), (0, 0)))
            valid = (jnp.arange(nb * b, dtype=jnp.int32)
                     < jnp.int32(n)).reshape(nb, b)
            starts = jnp.arange(nb, dtype=jnp.int32) * b

            def step(st, inp):
                start, va = inp
                rb = jax.lax.dynamic_slice(rows, (start, 0), (b + 1, hop))
                feats = pipe._features_from_rows(rb)
                blk, new_st = pipe._vad_stage(feats, st, va)
                return new_st, blk

            state, blocks = jax.lax.scan(step, state, (starts, valid))
            flat = type(blocks)(
                *(v.reshape(nb * b, *v.shape[2:])[:n] for v in blocks)
            )
            return flat, state

        r3_jit = jax.jit(r3_impl)
        emit("feat_r3_scan",
             timed(lambda: r3_jit(sig, state0), consume_block,
                   rounds=args.rounds),
             cost_of(r3_jit, sig, state0))

    # -- feature kernel alone (no VAD) ---------------------------------------
    def feat_only_impl(signal):
        x = jnp.asarray(signal, jnp.float32)
        rows = x if x.ndim == 2 else x[: (n + 1) * hop].reshape(n + 1, hop)
        return pipe._features_from_rows(rows)

    feat_only_jit = jax.jit(feat_only_impl)
    # analytic FLOPs for the kernel path (XLA sees a custom call): per frame
    # the merged DFT is 2*(hop x n_fft) dots x3 bf16 passes, mel 2*half*nf x3,
    # dct 2*nf*nc x3
    c = pipe.cfg
    half = c.n_fft // 2
    flops_frame = 3 * 2 * (
        c.frame_size * c.n_fft + half * c.num_filters
        + c.num_filters * c.num_ceps
    )
    if want("feat_only"):
        emit("feat_only",
             timed(lambda: feat_only_jit(sig_rows), consume_block,
                   rounds=args.rounds),
             {**cost_of(feat_only_jit, sig_rows),
              "analytic_gflop_3pass": round(n * flops_frame / 1e9, 2)})

    # -- VAD alone over precomputed features ---------------------------------
    feats_dev = feat_only_jit(sig_rows)
    jax.block_until_ready(feats_dev)

    def vad_only_impl(feats, state):
        h = pipe.cfg.history_len
        f_pad = -(-n // h) * h
        if f_pad != n:
            feats = {
                k: jnp.pad(v, ((0, f_pad - n),) + ((0, 0),) * (v.ndim - 1))
                for k, v in feats.items()
            }
            valid = jnp.arange(f_pad, dtype=jnp.int32) < jnp.int32(n)
        else:
            valid = None
        return pipe._vad_stage(feats, state, valid)

    vad_only_jit = jax.jit(vad_only_impl)
    if want("vad_only"):
        emit("vad_only",
             timed(lambda: vad_only_jit(feats_dev, state0), consume_block,
                   rounds=args.rounds),
             cost_of(vad_only_jit, feats_dev, state0))

    # -- input materialization only ------------------------------------------
    def rows_only_impl(signal):
        x = jnp.asarray(signal, jnp.float32)
        rows = x[: (n + 1) * hop].reshape(n + 1, hop)
        top, bot = rows[:-1], rows[1:]
        from sspv_tpu.ops.pallas_view import _pick_block_frames

        bf = _pick_block_frames(n)
        f_pad = -(-n // bf) * bf
        if f_pad != n:
            top = jnp.pad(top, ((0, f_pad - n), (0, 0)))
            bot = jnp.pad(bot, ((0, f_pad - n), (0, 0)))
        # full-reduction consume: forces one complete read pass over both
        # operands (a strided probe would let XLA dead-code-eliminate the
        # pad/slice work entirely); measures the input-side bandwidth floor
        return jnp.sum(top) + jnp.sum(bot)

    rows_jit = jax.jit(rows_only_impl)
    if want("rows_only"):
        emit("rows_only",
             timed(lambda: rows_jit(sig), lambda o: o,
                   rounds=args.rounds),
             cost_of(rows_jit, sig))

    # -- pitch ----------------------------------------------------------------
    from sspv_tpu.ops.pitch import (
        SCAN_BLOCK_FRAMES, _acf_dft_bases_merged, _lag_band,
        pitch_track_signal_jit,
    )

    vad_gate = jax.device_put(jnp.ones((n,), jnp.int32))
    pitch_fn = pitch_track_signal_jit()

    def consume_pitch(out):
        return out[0][-1] + out[1][-1]

    if want("pitch_shipped"):
        emit("pitch_shipped",
             timed(lambda: pitch_fn(sig_rows, vad_gate, np.float32(0.3)),
                   consume_pitch, rounds=args.rounds))

    # pitch decomposition (VERDICT r4 #5: the features call got 2x from
    # exactly this recipe; pitch never had its own rows): kernel alone vs
    # the flat-input relayout vs the gate/output stage.
    from sspv_tpu.ops.pallas_view import fused_view_pitch

    lag_min, lag_max = _lag_band(sr, 50.0, 400.0, c.frame_size)
    merged, nyq_b, inv_live, inv_nyq = _acf_dft_bases_merged(
        c.frame_size, lag_max
    )

    # the fused ACF kernel alone, ungated (full sweep over the rows view)
    def pitch_kernel_only_impl(rows):
        return fused_view_pitch(
            rows, merged=merged, nyq_b=nyq_b, inv_live=inv_live,
            inv_nyq=inv_nyq, lag_min=lag_min, lag_max=lag_max,
            sample_rate=sr,
        )

    pitch_kernel_jit = jax.jit(pitch_kernel_only_impl)
    # analytic 3-pass bf16 FLOPs/frame: forward merged ACF-DFT + inverse
    # band matmul (n_lags columns)
    n_lags = int(inv_live.shape[1])
    pitch_flops_frame = 3 * 2 * (
        c.frame_size * merged.shape[1] + (merged.shape[1] // 2) * n_lags
    )
    if want("pitch_kernel_only"):
        emit("pitch_kernel_only",
             timed(lambda: pitch_kernel_jit(sig_rows), consume_pitch,
                   rounds=args.rounds),
             {"analytic_gflop_3pass": round(n * pitch_flops_frame / 1e9, 2)})

    # shipped program fed the FLAT signal: pays the on-device 1-D->2-D
    # relayout (the r4 features trace's #2 op) — placement cost A/B
    if want("pitch_shipped_flat"):
        emit("pitch_shipped_flat",
             timed(lambda: pitch_fn(sig, vad_gate, np.float32(0.3)),
                   consume_pitch, rounds=args.rounds))

    # gate/output stage alone over precomputed ungated (f0, conf)
    f0c_dev = pitch_kernel_jit(sig_rows)
    jax.block_until_ready(f0c_dev)

    def pitch_gate_only_impl(f0, conf, vad):
        gate = (vad > 0) & (conf >= jnp.float32(0.3))
        return jnp.where(gate, f0, 0.0).astype(jnp.float32), conf

    pitch_gate_jit = jax.jit(pitch_gate_only_impl)
    if want("pitch_gate_only"):
        emit("pitch_gate_only",
             timed(lambda: pitch_gate_jit(*f0c_dev, vad_gate),
                   consume_pitch, rounds=args.rounds),
             cost_of(pitch_gate_jit, *f0c_dev, vad_gate))

    if not args.skip_r3 and want("pitch_r3_scan"):
        pb = SCAN_BLOCK_FRAMES

        def pitch_r3_impl(signal):
            x = jnp.asarray(signal, jnp.float32)
            rows = x[: (n + 1) * hop].reshape(n + 1, hop)
            nb = -(-n // pb)
            pad_rows = nb * pb + 1 - (n + 1)
            if pad_rows:
                rows = jnp.pad(rows, ((0, pad_rows), (0, 0)))
            starts = jnp.arange(nb, dtype=jnp.int32) * pb

            def step(carry, start):
                rb = jax.lax.dynamic_slice(rows, (start, 0), (pb + 1, hop))
                return carry, fused_view_pitch(
                    rb, merged=merged, nyq_b=nyq_b, inv_live=inv_live,
                    inv_nyq=inv_nyq, lag_min=lag_min, lag_max=lag_max,
                    sample_rate=sr,
                )

            _, (f0b, confb) = jax.lax.scan(step, 0, starts)
            return f0b.reshape(nb * pb)[:n], confb.reshape(nb * pb)[:n]

        pitch_r3_jit = jax.jit(pitch_r3_impl)
        emit("pitch_r3_scan",
             timed(lambda: pitch_r3_jit(sig), consume_pitch,
                   rounds=args.rounds))

    # -- optional device trace ------------------------------------------------
    if args.trace:
        import glob
        import tempfile

        targets = {
            "feat": (feat_shipped, consume_block),
            "vad": (lambda: vad_only_jit(feats_dev, state0), consume_block),
            "pitch": (lambda: pitch_fn(sig_rows, vad_gate, np.float32(0.3)),
                      consume_pitch),
        }
        tfn, tprobe = targets[args.trace_target]
        tdir = tempfile.mkdtemp(prefix="sspv_trace_")
        jax.profiler.start_trace(tdir)
        probes = [tprobe(tfn()) for _ in range(3)]
        _ = np.asarray(jax.device_get(jnp.stack(probes).sum()))
        jax.profiler.stop_trace()
        files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
        rows = []
        for fpath in files:
            pd = jax.profiler.ProfileData.from_file(fpath)
            for plane in pd.planes:
                if "TPU" not in plane.name and "device" not in plane.name.lower():
                    continue
                agg: dict[str, float] = {}
                for line in plane.lines:
                    for ev in line.events:
                        agg[ev.name] = agg.get(ev.name, 0.0) + (
                            ev.duration_ns / 1e6
                        )
                rows = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
                print(json.dumps({
                    "trace_plane": plane.name,
                    "top_ops_ms_over_3_calls": [
                        [k[:110], round(v, 3)] for k, v in rows
                    ],
                }), flush=True)
        if not files:
            print(json.dumps({"trace_error": "no xplane produced"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
