#!/usr/bin/env python3
"""A/B the fused view kernel's two orientations at NON-headline call sizes.

VERDICT r4 weak #6: the transposed-orientation kernel engages only when
``block_frames % 128 == 0 and f >= block_frames and f % block_frames >=
127`` (ops/pallas_view.py::_use_transposed); the headline 14,400 s call
satisfies that, but the perf delta between orientations at other sizes was
never measured. This tool measures the full features+VAD signal program at
each requested length under both ``TPU_VIEW_ORIENT`` settings ("auto" —
transposed where the gate passes — and "rows"), interleaved warm in one
process, and prints one JSON line per (seconds, orient) with whether the
transposed gate actually engaged at that geometry.

    python tools/orient_ab.py [seconds,seconds,...] [reps]
    # default: 900,3600,7200,14400  reps=4
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv) -> int:
    sizes = (
        [float(x) for x in argv[0].split(",") if x]
        if argv
        else [900.0, 3600.0, 7200.0, 14400.0]
    )
    reps = int(argv[1]) if len(argv) > 1 else 4

    import jax
    import jax.numpy as jnp

    from sspv_tpu.config import Config
    from sspv_tpu.ops.pallas_view import _pick_block_frames, _use_transposed
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
    from sspv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    sr = 16000
    rng = np.random.default_rng(0)

    for seconds in sizes:
        sig_np = rng.normal(0, 3000, (int(seconds * sr),)).astype(np.float32)
        n = 1 + (len(sig_np) - 320) // 160
        bf = _pick_block_frames(n)
        for orient in ("auto", "rows"):
            Config.TPU_VIEW_ORIENT = orient
            pipe = FeaturePipeline(FeatureConfig())  # fresh jits per orient
            rows = pipe.host_rows_view(sig_np)
            sig = jax.device_put(jnp.asarray(rows))
            state0 = pipe.initial_state()
            block, _ = pipe.process_signal_device(sig, state0)  # compile
            jax.block_until_ready(block)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                tails = []
                for _ in range(reps):
                    block, _ = pipe.process_signal_device(sig, state0)
                    tails.append(block.vad[-1])
                _ = int(jax.device_get(jnp.stack(tails).sum()) // reps)
                times.append((time.perf_counter() - t0) / reps)
            best = min(times)
            print(json.dumps({
                "seconds": seconds,
                "orient": orient,
                "transposed_engaged": bool(
                    orient != "rows" and _use_transposed(n, bf)
                ),
                "frames": n,
                "block_frames": bf,
                "f_mod_bf": n % bf,
                "ms_best": round(best * 1e3, 2),
                "ms_all": [round(t * 1e3, 2) for t in sorted(times)],
                "x_realtime": round(seconds / best, 0),
                "backend": jax.default_backend(),
            }), flush=True)
    Config.TPU_VIEW_ORIENT = "auto"
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
