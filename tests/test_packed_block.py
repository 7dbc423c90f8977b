#!/usr/bin/env python3
"""Packed single-buffer streaming I/O (process_block_packed): the engine's
remote-client-friendly path must be bit-identical to the unpacked
process_block path — features, VAD decisions, and carried state — under
chunking, bucket padding, and state round-trips. The int32 scalars in the
packed state travel as bitcast f32, so exactness must hold even for the
``-(2**30)``-magnitude cold-start ``last_voiced``."""

import numpy as np
import jax
import jax.numpy as jnp

from sspv_tpu.ops import vad as vad_ops
from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline


def synth_signal(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    seg = (t * 2).astype(int) % 4
    sig = rng.normal(0, 40, n)
    sig = np.where(seg == 1, 6000 * np.sin(2 * np.pi * 130 * t), sig)
    sig = np.where(seg == 2, rng.normal(0, 2000, n), sig)
    return sig.astype(np.float32)


def test_pack_unpack_state_roundtrip_exact():
    # include the extreme cold-start last_voiced and a mid-stream value
    for count, last in [(0, -4), (256, -1), (17, -(2**30) - 1234), (3, -(2**30))]:
        st = vad_ops.VadState(
            energy_buf=jnp.asarray(np.random.default_rng(0).normal(0, 1e6, 256), jnp.float32),
            zcr_buf=jnp.asarray(np.random.default_rng(1).random(256), jnp.float32),
            count=jnp.int32(count),
            last_voiced=jnp.int32(last),
        )
        rt = vad_ops.unpack_state(vad_ops.pack_state(st), 256)
        np.testing.assert_array_equal(np.asarray(rt.energy_buf), np.asarray(st.energy_buf))
        np.testing.assert_array_equal(np.asarray(rt.zcr_buf), np.asarray(st.zcr_buf))
        assert int(rt.count) == count
        assert int(rt.last_voiced) == last


def test_initial_packed_state_matches_initial_state():
    pipe = FeaturePipeline(FeatureConfig())
    packed = jnp.asarray(pipe.initial_packed_state())
    st = vad_ops.unpack_state(packed, pipe.cfg.history_len)
    want = pipe.initial_state()
    np.testing.assert_array_equal(np.asarray(st.energy_buf), np.asarray(want.energy_buf))
    assert int(st.count) == int(want.count)
    assert int(st.last_voiced) == int(want.last_voiced)


def test_packed_block_bit_identical_to_unpacked():
    pipe = FeaturePipeline(FeatureConfig())
    frames = pipe.stream_frames(synth_signal(16000 * 2))
    n = frames.shape[0]

    state = pipe.initial_state()
    valid = jnp.arange(n) < n
    want, _ = pipe.process_block(frames, state, valid=valid)

    packed, _ = pipe.process_block_packed(frames, pipe.initial_packed_state(), n)
    got = pipe.split_packed_block(jax.device_get(packed), n)

    np.testing.assert_array_equal(np.asarray(got.energy), np.asarray(want.energy))
    np.testing.assert_array_equal(np.asarray(got.zcr), np.asarray(want.zcr))
    np.testing.assert_array_equal(np.asarray(got.entropy), np.asarray(want.entropy))
    np.testing.assert_array_equal(np.asarray(got.mfcc), np.asarray(want.mfcc))
    np.testing.assert_array_equal(np.asarray(got.vad), np.asarray(want.vad))
    np.testing.assert_array_equal(np.asarray(got.vad_adaptive), np.asarray(want.vad_adaptive))


def test_packed_chunked_with_bucket_padding_equals_unpacked():
    """Random chunk sizes through padded buckets: the packed path (state
    carried on device as one buffer) must be bit-identical to the unpacked
    process_block path over the identical bucket sequence — features, VAD,
    and the final carried state. (Unpacked-chunked == one-shot VAD exactness
    is covered by test_vad_streaming / test_engine_buckets; features across
    *different* batch shapes may legitimately differ by float tiling.)"""
    pipe = FeaturePipeline(FeatureConfig())
    sig = synth_signal(16000 * 3, seed=5)
    frames = pipe.stream_frames(sig)
    total = frames.shape[0]

    buckets = (8, 32, 128)
    rng = np.random.default_rng(11)
    parts = []
    lo = 0
    while lo < total:
        n = min(int(rng.integers(1, 100)), total - lo)
        part = frames[lo : lo + n]
        bucket = next((b for b in buckets if n <= b), buckets[-1])
        if bucket != n:
            part = np.pad(part, ((0, bucket - n), (0, 0)))
        parts.append((part, n))
        lo += n

    state_u = pipe.initial_state()
    state_p = pipe.initial_packed_state()
    for part, n in parts:
        valid = jnp.arange(part.shape[0]) < n
        want, state_u = pipe.process_block(part, state_u, valid=valid)
        packed, state_p = pipe.process_block_packed(part, state_p, n)
        got = pipe.split_packed_block(jax.device_get(packed), n)
        for field in ("energy", "zcr", "entropy", "mfcc", "vad", "vad_adaptive"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, field)),
                np.asarray(getattr(want, field))[:n],
                err_msg=f"{field} n={n}",
            )

    final_p = vad_ops.unpack_state(jnp.asarray(state_p), pipe.cfg.history_len)
    np.testing.assert_array_equal(
        np.asarray(final_p.energy_buf), np.asarray(state_u.energy_buf)
    )
    np.testing.assert_array_equal(
        np.asarray(final_p.zcr_buf), np.asarray(state_u.zcr_buf)
    )
    assert int(final_p.count) == int(state_u.count)
    assert int(final_p.last_voiced) == int(state_u.last_voiced)


def test_packed_fuzz_nondefault_geometry():
    """Packed == unpacked under non-default configs: the packed column
    layout must track num_ceps, and the packed state must track
    history_len/hangover_on."""
    import pytest

    for seed, (ceps, hist, on, off) in enumerate(
        [(20, 64, 1, 4), (7, 16, 0, 0), (13, 300, 5, 1)]
    ):
        cfg = FeatureConfig(
            num_ceps=ceps, history_len=hist, hangover_on=on, release_off=off
        )
        pipe = FeaturePipeline(cfg)
        frames = pipe.stream_frames(synth_signal(16000, seed=seed))
        rng = np.random.default_rng(seed)
        state_u = pipe.initial_state()
        state_p = pipe.initial_packed_state()
        lo = 0
        while lo < frames.shape[0]:
            n = min(int(rng.integers(1, 40)), frames.shape[0] - lo)
            part = frames[lo : lo + n]
            pad = int(rng.integers(0, 9))
            if pad:
                part = np.pad(part, ((0, pad), (0, 0)))
            valid = jnp.arange(part.shape[0]) < n
            want, state_u = pipe.process_block(part, state_u, valid=valid)
            packed, state_p = pipe.process_block_packed(part, state_p, n)
            got = pipe.split_packed_block(jax.device_get(packed), n)
            assert got.mfcc.shape == (n, ceps)
            for field in ("energy", "zcr", "entropy", "mfcc", "vad", "vad_adaptive"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, field)),
                    np.asarray(getattr(want, field))[:n],
                    err_msg=f"seed={seed} {field} n={n} pad={pad}",
                )
            lo += n


def test_engine_reset_preserves_last_voiced_bits():
    """set_audio_source resets history but keeps the hangover distance; with
    the packed state this is a raw-bit copy of the last_voiced slot."""
    pipe = FeaturePipeline(FeatureConfig())
    frames = pipe.stream_frames(synth_signal(16000, seed=3))
    n = frames.shape[0]
    packed, state = pipe.process_block_packed(frames, pipe.initial_packed_state(), n)
    # simulate the engine's source-swap reset
    fresh = pipe.initial_packed_state()
    fresh[-1] = np.asarray(state)[-1]
    st = vad_ops.unpack_state(jnp.asarray(fresh), pipe.cfg.history_len)
    full = vad_ops.unpack_state(jnp.asarray(state), pipe.cfg.history_len)
    assert int(st.last_voiced) == int(full.last_voiced)
    assert int(st.count) == 0
    assert float(np.abs(np.asarray(st.energy_buf)).max()) == 0.0
