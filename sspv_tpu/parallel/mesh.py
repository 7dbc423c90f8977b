#!/usr/bin/env python3
"""Device-mesh scale-out for the speech front-end.

The reference has **no** distributed stack (SURVEY.md §2: "Parallelism /
distributed components: NONE" — its concurrency is two Python threads and a
lock, engine.py:99-103). The TPU-native equivalents here are therefore about
*scale-out of the batch workload*, not parity:

- **data parallelism** ("dp"): a batch of independent audio signals (files)
  sharded across devices; every signal carries its own VAD state, so there is
  no cross-device communication at all — XLA runs each shard locally.
- **sequence parallelism** ("sp"): one long signal's frame axis sharded
  across devices. The feature stage is embarrassingly parallel per frame; the
  composite VAD's trailing-history convolution and last-voiced cummax are
  prefix computations whose halo/carry exchange XLA lowers to collectives
  (collective-permute / all-gather of 256-element halos) over ICI.

Both paths go through ``jax.jit`` with ``NamedSharding`` annotations — no
hand-written collectives; XLA SPMD inserts them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import vad as vad_ops
from ..ops.pipeline import (
    FeatureBlock,
    FeatureConfig,
    FeaturePipeline,
    _pallas_available,
)

__all__ = [
    "make_mesh",
    "BatchPipeline",
]

# Trace-time evidence that the shard_map'd fused-kernel feature stage was
# compiled into a mesh program (the multichip dryrun asserts a delta, same
# pattern as pipeline.VIEW_TRACE_COUNT / vad.BLOCKED_TRACE_COUNT — no
# multi-chip hardware exists here to measure on).
MESH_KERNEL_TRACE_COUNT = 0


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    """Build a ("data", "seq") mesh over the first ``n_devices`` devices.

    ``dp`` fixes the data-parallel extent (defaults to the largest power-of-2
    divisor <= sqrt-ish split); the rest becomes the sequence axis.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None:
        dp = 1
        while n % (dp * 2) == 0 and dp * 2 * dp <= n:
            dp *= 2
    assert n % dp == 0, (n, dp)
    arr = np.array(devices[:n]).reshape(dp, n // dp)
    return Mesh(arr, axis_names=("data", "seq"))


def _as_transfer_dtype(signals) -> np.ndarray:
    """Keep int16 input as int16 for the host->device transfer (the traced
    framing casts to float32 on device, exactly); everything else becomes
    float32 host-side."""
    arr = np.asarray(signals)
    if arr.dtype != np.int16:
        arr = arr.astype(np.float32, copy=False)
    return arr


class BatchPipeline:
    """Sharded batch processing over a device mesh.

    ``process_batch``: (B, L) signals, B sharded over "data", each signal's
    frame axis sharded over "seq". ``process_long``: one (L,) signal with
    frames sharded over the whole mesh.

    Every program here lowers the XLA view path — ``view_kernel`` is forced
    off (see ``__init__``). Consequently the CLAUDE.md bit-identity
    invariant for ``process_batch_masked_pitch`` vs its two-call
    construction is scoped SAME-PATH: it holds against two-call programs
    built from this instance's (kernel-off) pipeline; confidence low bits
    may differ vs a single-chip kernel-default ``FeaturePipeline`` (F0
    decisions agree away from ACF ties — tools/viewkernel_ab.py).
    """

    def __init__(
        self,
        mesh: Mesh,
        cfg: FeatureConfig | None = None,
        long_kernel: bool | None = None,
    ):
        self.mesh = mesh
        # view_kernel off: Pallas calls have no GSPMD partitioning rule, so
        # every GSPMD-sharded program here must lower the XLA view path —
        # process_long's view branch would otherwise place a pallas_call
        # under a with_sharding_constraint on real multi-chip meshes. The
        # single-chip FeaturePipeline keeps its own (kernel) default.
        #
        # process_long is the exception: its feature stage runs under
        # shard_map MANUAL partitioning (which sidesteps GSPMD entirely), so
        # it CAN run the fused Pallas view kernel per shard — see
        # ``_long_kernel_feats``. ``long_kernel`` controls that route:
        # None resolves it like the single-chip kernel default (TPU backend
        # + cfg.view_kernel + the kernel's geometry/precision gates);
        # True/False force it (tests and the CPU multichip dryrun opt in
        # explicitly — interpret-mode Pallas under shard_map).
        base = cfg or FeatureConfig()
        if base.view_kernel and cfg is not None:
            # an explicitly passed cfg opting IN must not be dropped
            # silently (ADVICE r3) — the caller sees why their knob is inert
            import logging

            logging.getLogger(__name__).info(
                "BatchPipeline: view_kernel=True overridden to False for "
                "GSPMD-sharded programs — Pallas kernels cannot be "
                "GSPMD-partitioned; process_long's shard_map feature stage "
                "still runs the fused kernel per shard (long_kernel)"
            )
        self.pipe = FeaturePipeline(base._replace(view_kernel=False))
        p = self.pipe
        if long_kernel is None:
            long_kernel = bool(base.view_kernel) and _pallas_available()
        self._long_kernel = bool(long_kernel) and (
            p.cfg.frame_size == 2 * p.cfg.hop_size
            and p._wm is not None
            and p._wc_ent is None
            and p._precision != jax.lax.Precision.HIGHEST
            and bool(np.all(p._window > 0))
        )
        self._batch_jit = {}

    def _batch_impl(self, signals: jnp.ndarray, states: vad_ops.VadState):
        """vmapped per-signal pipeline; frame axis sharding is constrained so
        XLA partitions the heavy feature matmuls over "seq" too."""

        def one(signal, state):
            frames = self.pipe._device_stream_frames(signal)
            frames = jax.lax.with_sharding_constraint(
                frames, NamedSharding(self.mesh, P("seq", None))
            )
            return self.pipe._process_block_impl(frames, state, None)

        return jax.vmap(one)(signals, states)

    def initial_states(self, batch: int) -> vad_ops.VadState:
        s = self.pipe.initial_state()
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)

    def process_batch(
        self, signals, states: vad_ops.VadState | None = None
    ) -> tuple[FeatureBlock, vad_ops.VadState]:
        """Process a (B, L) batch of equal-length signals, B over "data".
        int16 batches transfer as int16 and cast on device (half the bytes)."""
        signals = _as_transfer_dtype(signals)
        b = signals.shape[0]
        if states is None:
            states = self.initial_states(b)
        key = ("batch", signals.shape)
        if key not in self._batch_jit:
            in_sh = NamedSharding(self.mesh, P("data", None))
            state_sh = NamedSharding(self.mesh, P("data"))
            self._batch_jit[key] = jax.jit(
                self._batch_impl,
                in_shardings=(in_sh, jax.tree.map(lambda _: state_sh, states)),
            )
        return self._batch_jit[key](signals, states)

    def _masked_row(self, signal, length, state):
        """Traced per-row body shared by :meth:`process_batch_masked` and
        :meth:`process_batch_masked_pitch`: frame, shard the frame axis over
        "seq", mask the zero-padded tail out of the VAD state. One definition
        keeps the fused block bit-identical to the plain one by construction.
        Returns ``(block, new_state, valid)``."""
        c = self.pipe.cfg
        frames = self.pipe._device_stream_frames(signal)
        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(self.mesh, P("seq", None))
        )
        n = frames.shape[0]
        true_n = jnp.where(
            length >= c.frame_size,
            1 + (length - c.frame_size) // c.hop_size,
            0,
        )
        valid = jnp.arange(n, dtype=jnp.int32) < true_n
        block, new_state = self.pipe._process_block_impl(frames, state, valid)
        return block, new_state, valid

    def process_batch_masked(
        self, signals, lengths, states: vad_ops.VadState | None = None
    ) -> tuple[FeatureBlock, vad_ops.VadState]:
        """Process a (B, L) zero-padded batch of *unequal-length* signals, B
        over "data": ``lengths[i]`` is signal i's true sample count. Padded
        frames are masked out of each signal's VAD state (the same valid-mask
        machinery the bucketed streaming engine uses), so one compiled
        program serves any mix of file lengths that pads to L. int16
        batches transfer as int16 and cast on device (half the bytes)."""
        signals = _as_transfer_dtype(signals)
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        b = signals.shape[0]
        if states is None:
            states = self.initial_states(b)
        key = ("batch_masked", signals.shape)
        if key not in self._batch_jit:

            def impl(sigs, lens, sts):
                def one(signal, length, state):
                    block, new_state, _ = self._masked_row(
                        signal, length, state
                    )
                    return block, new_state

                return jax.vmap(one)(sigs, lens, sts)

            in_sh = NamedSharding(self.mesh, P("data", None))
            len_sh = NamedSharding(self.mesh, P("data"))
            self._batch_jit[key] = jax.jit(
                impl,
                in_shardings=(in_sh, len_sh,
                              jax.tree.map(lambda _: len_sh, states)),
            )
        return self._batch_jit[key](signals, lengths, states)

    def process_batch_masked_pitch(
        self,
        signals,
        lengths,
        states: vad_ops.VadState | None = None,
        fmin: float = 50.0,
        fmax: float = 400.0,
        min_confidence: float = 0.3,
    ):
        """:meth:`process_batch_masked` plus the VAD-gated pitch track in ONE
        sharded device call: returns ``(block, states, f0, conf)`` with
        ``f0``/``conf`` of shape (B, frames). The two-call alternative pays a
        second dispatch (~25 ms tunnel RTT each), re-ships the (B, L) signal
        batch, and round-trips the VAD gate through the host; outputs are
        bit-identical to it (tests/test_parallel.py). ``min_confidence`` is
        traced (the inner track runs ungated at ``-inf``; the outer
        comparison is the sole confidence gate), so thresholds never force a
        recompile — one program per (shape, band).

        Note: every sharded program here pins ``use_kernel=False`` (Pallas
        has no GSPMD partitioning rule), so on TPU the single-chip
        ``FeaturePipeline`` pitch default (fused kernel) and this path can
        differ in confidence low bits; F0 picks measured bit-identical
        (docs/benchmarks.md r3 A/B). Bit-identity claims compare same-path
        constructions."""
        signals = _as_transfer_dtype(signals)
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        b = signals.shape[0]
        if states is None:
            states = self.initial_states(b)
        c = self.pipe.cfg
        key = ("batch_masked_pitch", signals.shape, float(fmin), float(fmax))
        if key not in self._batch_jit:
            from ..ops.pitch import pitch_track_signal_gated

            def impl(sigs, lens, sts, min_conf):
                def one(signal, length, state, mc):
                    block, new_state, valid = self._masked_row(
                        signal, length, state
                    )
                    # hangover can spill decisions past a short row's true
                    # frame range into the zero padding; gate pitch on the
                    # masked VAD exactly like the two-call path does host-side
                    gate_vad = jnp.where(valid, block.vad, 0)
                    # shared traced-threshold gate (ops/pitch.py).
                    # use_kernel=False: Pallas calls have no GSPMD
                    # partitioning rule, so inside this sharded jit the
                    # pitch leg must stay on the XLA view path (the
                    # single-chip default resolves to the fused kernel).
                    f0, conf = pitch_track_signal_gated(
                        signal, gate_vad, mc,
                        frame_size=c.frame_size, hop_size=c.hop_size,
                        sample_rate=c.sample_rate, fmin=fmin, fmax=fmax,
                        use_kernel=False,
                    )
                    return block, new_state, f0, conf

                return jax.vmap(one, in_axes=(0, 0, 0, None))(
                    sigs, lens, sts, min_conf
                )

            in_sh = NamedSharding(self.mesh, P("data", None))
            len_sh = NamedSharding(self.mesh, P("data"))
            self._batch_jit[key] = jax.jit(
                impl,
                in_shardings=(in_sh, len_sh,
                              jax.tree.map(lambda _: len_sh, states), None),
            )
        return self._batch_jit[key](
            signals, lengths, states, jnp.float32(min_confidence)
        )

    def _long_kernel_feats(self, rows: jnp.ndarray, n: int) -> dict:
        """Fused-Pallas feature stage for ``process_long`` under shard_map
        MANUAL partitioning (VERDICT r4 #4: GSPMD has no Pallas partitioning
        rule, but shard_map sidesteps GSPMD — each device runs the single
        -chip fused view kernel on its own frame block, so the multi-chip
        path stops paying the XLA-path penalty).

        ``rows`` is the ``(n+1, hop)`` signal view. The frame axis is split
        into ``D`` contiguous blocks of ``fpb`` frames (padded); a shard's
        frames need ``fpb + 1`` rows, so each shard also receives its SEAM
        row (the next shard's first row) — a tiny ``(D, hop)`` strided
        gather done outside shard_map, where GSPMD moves the D rows. This
        is the same rows+seam decomposition the single-chip kernel uses
        internally (pallas_view._seam_rows), lifted to the mesh level.

        Returns the feature dict sliced to the true ``n`` frames; the VAD
        prefix runs outside, in ordinary GSPMD land, where XLA lowers its
        exchanges to collectives.
        """
        global MESH_KERNEL_TRACE_COUNT
        MESH_KERNEL_TRACE_COUNT += 1
        from ..ops.pallas_view import fused_view_features

        p = self.pipe
        d = int(self.mesh.devices.size)
        hop = p.cfg.hop_size
        fpb = -(-n // d)
        fpb = max(8, -(-fpb // 8) * 8)  # f32 sublane multiple per shard
        pad_rows = d * fpb + 1 - (n + 1)
        if pad_rows:
            rows = jnp.pad(rows, ((0, pad_rows), (0, 0)))
        rows_main = rows[:-1]  # (d*fpb, hop)
        seams = rows[fpb::fpb]  # (d, hop): shard i's row fpb == row (i+1)*fpb

        def per_shard(rb, seam):
            # rb (fpb, hop) + seam (1, hop) -> the shard-local (fpb+1, hop)
            # view; the fused kernel grid-blocks internally exactly as on a
            # single chip (frames are frame-local — no cross-shard state)
            feats = fused_view_features(
                jnp.concatenate([rb, seam], axis=0),
                wm=p._wm,
                wnyq=p._wnyq,
                fb_t=p._fb_t,
                dct=p._dct,
                lifter=p._lifter,
                window=p._window,
            )
            return feats

        axes = ("data", "seq")
        spec2, spec1 = P(axes, None), P(axes)
        feats = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(spec2, spec2),
            out_specs={
                "energy": spec1, "zcr": spec1, "entropy": spec1,
                "mfcc": spec2,
            },
            check_vma=False,  # pallas_call has no varying-axes rule
        )(rows_main, seams)
        return {k: v[:n] for k, v in feats.items()}

    def _long_kernel_pitch(
        self, rows: jnp.ndarray, n: int, fmin: float, fmax: float
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """shard_map'd fused-Pallas UNGATED pitch stage for
        :meth:`process_long_pitch` — the pitch twin of
        :meth:`_long_kernel_feats` (same rows+seam decomposition; the
        banded-ACF kernel is frame-local, so shards need only their seam
        row). Returns ``(f0, conf)`` of shape ``(n,)`` each; the caller
        applies the VAD/confidence gate."""
        from ..ops.pitch import _acf_dft_bases_merged, _lag_band
        from ..ops.pallas_view import fused_view_pitch

        p = self.pipe
        c = p.cfg
        d = int(self.mesh.devices.size)
        lag_min, lag_max = _lag_band(c.sample_rate, fmin, fmax, c.frame_size)
        merged, nyq_b, inv_live, inv_nyq = _acf_dft_bases_merged(
            c.frame_size, lag_max
        )
        fpb = -(-n // d)
        fpb = max(8, -(-fpb // 8) * 8)
        pad_rows = d * fpb + 1 - (n + 1)
        if pad_rows:
            rows = jnp.pad(rows, ((0, pad_rows), (0, 0)))
        rows_main = rows[:-1]
        seams = rows[fpb::fpb]

        def per_shard(rb, seam):
            return fused_view_pitch(
                jnp.concatenate([rb, seam], axis=0),
                merged=merged, nyq_b=nyq_b, inv_live=inv_live,
                inv_nyq=inv_nyq, lag_min=lag_min, lag_max=lag_max,
                sample_rate=c.sample_rate,
            )

        axes = ("data", "seq")
        f0, conf = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(axes, None), P(axes, None)),
            out_specs=(P(axes), P(axes)),
            check_vma=False,  # pallas_call has no varying-axes rule
        )(rows_main, seams)
        return f0[:n], conf[:n]

    def process_long_pitch(
        self,
        signal,
        state: vad_ops.VadState | None = None,
        fmin: float = 50.0,
        fmax: float = 400.0,
        min_confidence: float = 0.3,
    ):
        """:meth:`process_long` plus the VAD-gated pitch track in ONE mesh
        program: ``(block, state, f0, conf)`` with the frame axis sharded
        over the flattened ("data", "seq") mesh. On the ``long_kernel``
        route BOTH halves run the fused Pallas kernels per shard under
        shard_map (features + banded-ACF pitch); otherwise both ride the
        XLA view path. The gate definition is the shared one
        (``ops.pitch.pitch_track_signal_gated`` semantics: ungated inner
        track, one outer traced confidence comparison), so outputs are
        bit-identical to the two-call construction on the same path
        (tests/test_parallel.py)."""
        signal = _as_transfer_dtype(signal)
        if state is None:
            state = self.pipe.initial_state()
        key = ("long_pitch", signal.shape, float(fmin), float(fmax))
        if key not in self._batch_jit:
            from ..ops.pitch import pitch_track_signal_gated

            c = self.pipe.cfg
            length = int(signal.shape[0])
            n = 1 + (length - c.frame_size) // c.hop_size
            use_view = (
                c.frame_size == 2 * c.hop_size
                and length >= c.frame_size
                and self.pipe._window_strictly_positive()
            )

            if use_view and self._long_kernel:

                def impl(sig, st, min_conf):
                    x = jnp.asarray(sig, jnp.float32)
                    rows = x[: (n + 1) * c.hop_size].reshape(
                        n + 1, c.hop_size
                    )
                    feats = self._long_kernel_feats(rows, n)
                    block, new_state = self.pipe._vad_full_length(
                        feats, st, n
                    )
                    f0u, conf = self._long_kernel_pitch(rows, n, fmin, fmax)
                    gate = (block.vad > 0) & (conf >= min_conf)
                    f0 = jnp.where(gate, f0u, 0.0).astype(jnp.float32)
                    return block, new_state, f0, conf

            else:
                sharding = NamedSharding(self.mesh, P(("data", "seq")))

                def impl(sig, st, min_conf):
                    sig = jax.lax.with_sharding_constraint(sig, sharding)
                    # force_full_vad: see process_long — the conv trailing
                    # -sum fallback is not GSPMD-safe on a sharded frame axis
                    if use_view:
                        block, new_state = (
                            self.pipe._process_signal_view_impl(
                                sig, st, n, force_full_vad=True
                            )
                        )
                    else:
                        frames = self.pipe._device_stream_frames(sig)
                        block, new_state = self.pipe._vad_full_length(
                            self.pipe._features(frames), st,
                            int(frames.shape[0]),
                        )
                    f0, conf = pitch_track_signal_gated(
                        sig, block.vad, min_conf,
                        frame_size=c.frame_size, hop_size=c.hop_size,
                        sample_rate=c.sample_rate, fmin=fmin, fmax=fmax,
                        use_kernel=False,
                    )
                    return block, new_state, f0, conf

            self._batch_jit[key] = jax.jit(impl)
        return self._batch_jit[key](
            signal, state, jnp.float32(min_confidence)
        )

    def process_long(
        self, signal, state: vad_ops.VadState | None = None
    ) -> tuple[FeatureBlock, vad_ops.VadState]:
        """Process one long (L,) signal with the frame axis sharded over the
        flattened ("data", "seq") mesh — sequence parallelism.

        With the 50%-overlap geometry this routes through the signal-view
        path — the same machinery as single-device
        ``process_signal_device`` (hoisted frame-local features, one
        full-length parallel-prefix VAD; past ``SCAN_BLOCK_FRAMES`` frames
        the XLA feature stage scans carry-less blocks) — under the mesh,
        so the prefix ops' exchanges lower to collectives. int16 transfers
        as int16 and casts on device (half the bytes)."""
        signal = _as_transfer_dtype(signal)
        if state is None:
            state = self.pipe.initial_state()
        key = ("long", signal.shape)
        if key not in self._batch_jit:
            c = self.pipe.cfg
            length = int(signal.shape[0])
            sharding = NamedSharding(self.mesh, P(("data", "seq")))
            use_view = (
                c.frame_size == 2 * c.hop_size
                and length >= c.frame_size
                and self.pipe._window_strictly_positive()
            )
            if use_view and self._long_kernel:
                n = 1 + (length - c.frame_size) // c.hop_size

                def impl(sig, st):
                    x = jnp.asarray(sig, jnp.float32)
                    rows = x[: (n + 1) * c.hop_size].reshape(
                        n + 1, c.hop_size
                    )
                    feats = self._long_kernel_feats(rows, n)
                    # full-length parallel-prefix VAD in GSPMD land (the
                    # same shared tail as the single-chip signal paths)
                    return self.pipe._vad_full_length(feats, st, n)

            elif use_view:
                n = 1 + (length - c.frame_size) // c.hop_size

                def impl(sig, st):
                    sig = jax.lax.with_sharding_constraint(sig, sharding)
                    # force_full_vad: the exact-length conv trailing-sum
                    # fallback is mis-partitioned by GSPMD at some sharded
                    # frame counts (see _process_signal_view_impl)
                    return self.pipe._process_signal_view_impl(
                        sig, st, n, force_full_vad=True
                    )

            else:

                def impl(sig, st):
                    frames = self.pipe._device_stream_frames(sig)
                    frames = jax.lax.with_sharding_constraint(
                        frames,
                        NamedSharding(self.mesh, P(("data", "seq"), None)),
                    )
                    # same GSPMD conv-fallback hazard as the view route:
                    # run the padded blocked VAD tail, not _vad_stage
                    feats = self.pipe._features(frames)
                    return self.pipe._vad_full_length(
                        feats, st, int(frames.shape[0])
                    )

            self._batch_jit[key] = jax.jit(impl)
        return self._batch_jit[key](signal, state)
