#!/usr/bin/env python3
"""Streaming composite-VAD semantics: the parallel prefix formulation must
reproduce the reference engine's sequential per-frame automaton exactly —
one-shot, chunked with carried state, and with bucketed tail padding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sspv_tpu.ops import vad as vad_ops
from sspv_tpu.ops.pipeline import FeaturePipeline, FeatureConfig

import oracle


def synth_features(n=400, seed=0):
    """Per-frame features with realistic voiced/silence structure."""
    rng = np.random.default_rng(seed)
    voiced = rng.random(n) < 0.35
    # runs of voice: smear the mask so hangover paths are exercised
    for i in range(1, n):
        if voiced[i - 1] and rng.random() < 0.6:
            voiced[i] = True
    energy = np.where(voiced, rng.uniform(2e3, 1e7, n), rng.uniform(0, 900, n)).astype(np.float32)
    zcr = np.where(voiced, rng.uniform(0.01, 0.25, n), rng.uniform(0.2, 0.5, n)).astype(np.float32)
    entropy = np.where(voiced, rng.uniform(0.2, 0.6, n), rng.uniform(0.6, 1.0, n)).astype(np.float32)
    return energy, zcr, entropy


def test_hangover_parallel_equals_scan():
    rng = np.random.default_rng(3)
    for on, off in [(3, 2), (1, 1), (5, 3), (2, 7), (3, 0), (0, 2), (0, 0), (4, 1)]:
        v = jnp.asarray(rng.random(300) < 0.3)
        par, _ = vad_ops.hangover_smooth(v, jnp.int32(-(on + 1)), on, off)
        seq, _ = vad_ops.hangover_smooth_scan(
            v, jnp.int32(0), jnp.int32(0), on, off
        )
        np.testing.assert_array_equal(np.asarray(par), np.asarray(seq), err_msg=f"on={on} off={off}")


def test_blocked_cummax_bitidentical_to_flat_scan():
    # the two-level blocked cummax (engaged for long 256-multiples — every
    # padded full-length VAD pass) must equal the flat associative_scan
    # exactly; max is associative so this is bit-exact, and the boundary
    # lengths pin the engagement gate itself.
    rng = np.random.default_rng(7)
    for f in (256, 768, 1024, 1280, 4096, 1023, 1025, 300):
        seeds = jnp.asarray(
            np.where(
                rng.random(f) < 0.25,
                np.arange(f, dtype=np.int32),
                np.int32(-(2**30)),
            )
        )
        got = np.asarray(vad_ops._cummax(seeds))
        want = np.asarray(jax.lax.associative_scan(jnp.maximum, seeds))
        np.testing.assert_array_equal(got, want, err_msg=f"f={f}")


def test_hangover_long_block_equals_scan():
    # lengths that engage the blocked cummax inside hangover_smooth
    rng = np.random.default_rng(11)
    for f, on, off in [(1024, 3, 2), (2048, 5, 3), (4096, 0, 0)]:
        v = jnp.asarray(rng.random(f) < 0.2)
        par, last_p = vad_ops.hangover_smooth(v, jnp.int32(-(on + 1)), on, off)
        seq, _ = vad_ops.hangover_smooth_scan(
            v, jnp.int32(0), jnp.int32(0), on, off
        )
        np.testing.assert_array_equal(
            np.asarray(par), np.asarray(seq), err_msg=f"f={f} on={on} off={off}"
        )


def test_streaming_vad_matches_engine_oracle():
    energy, zcr, entropy = synth_features(500)
    ref = oracle.EngineVadOracle()
    want_vad, want_adp = ref.run_all(energy, zcr, entropy)

    state = vad_ops.initial_vad_state()
    got_vad, got_adp, _ = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy), state,
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=3.0,
    )
    np.testing.assert_array_equal(np.asarray(got_adp), want_adp)
    np.testing.assert_array_equal(np.asarray(got_vad), want_vad)


def test_streaming_vad_chunked_equals_oneshot():
    energy, zcr, entropy = synth_features(600, seed=7)
    kwargs = dict(
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=3.0,
    )
    state = vad_ops.initial_vad_state()
    one_vad, one_adp, _ = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy), state, **kwargs
    )
    # history window (256) straddles chunk boundaries of every size here
    for sizes in [[600], [100] * 6, [7, 250, 343], [1] * 20 + [580]]:
        state = vad_ops.initial_vad_state()
        outs_v, outs_a = [], []
        pos = 0
        for s in sizes:
            v, a, state = vad_ops.streaming_vad(
                jnp.asarray(energy[pos:pos + s]),
                jnp.asarray(zcr[pos:pos + s]),
                jnp.asarray(entropy[pos:pos + s]),
                state, **kwargs,
            )
            outs_v.append(np.asarray(v))
            outs_a.append(np.asarray(a))
            pos += s
        np.testing.assert_array_equal(np.concatenate(outs_v), np.asarray(one_vad), err_msg=str(sizes))
        np.testing.assert_array_equal(np.concatenate(outs_a), np.asarray(one_adp))


def test_streaming_vad_padded_tail_equals_unpadded():
    energy, zcr, entropy = synth_features(300, seed=11)
    kwargs = dict(
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=3.0,
    )
    state = vad_ops.initial_vad_state()
    want_v, want_a, want_state = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy), state, **kwargs
    )
    # process in two bucketed blocks with padded tails
    state = vad_ops.initial_vad_state()
    split = 137
    got_v, got_a = [], []
    for lo, hi, bucket in [(0, split, 160), (split, 300, 256)]:
        n = hi - lo
        pad = bucket - n
        e = np.pad(energy[lo:hi], (0, pad))
        z = np.pad(zcr[lo:hi], (0, pad))
        h = np.pad(entropy[lo:hi], (0, pad))
        valid = np.arange(bucket) < n
        v, a, state = vad_ops.streaming_vad(
            jnp.asarray(e), jnp.asarray(z), jnp.asarray(h), state,
            valid=jnp.asarray(valid), **kwargs,
        )
        got_v.append(np.asarray(v)[:n])
        got_a.append(np.asarray(a)[:n])
    np.testing.assert_array_equal(np.concatenate(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.concatenate(got_a), np.asarray(want_a))
    # carried state must match the unpadded run
    np.testing.assert_allclose(
        np.asarray(state.energy_buf), np.asarray(want_state.energy_buf)
    )
    assert int(state.count) == int(want_state.count)
    assert int(state.last_voiced) == int(want_state.last_voiced)


def test_blocked_trailing_sums_unit():
    """_blocked_trailing_sums == direct per-window sums (f64 tolerance)."""
    rng = np.random.default_rng(21)
    for f, h in [(256, 256), (512, 256), (96, 32), (1024, 128)]:
        ext = rng.uniform(0, 1e6, h + f).astype(np.float32)
        got = np.asarray(vad_ops._blocked_trailing_sums(jnp.asarray(ext), f, h))
        want = np.array(
            [ext[t : t + h].astype(np.float64).sum() for t in range(f)]
        )
        np.testing.assert_allclose(got, want, rtol=2e-6)


def test_blocked_trailing_sums_high_dynamic_range():
    """Loud-audio-then-near-silence inside one block: subtractive suffix/prefix
    formulations cancel catastrophically here (error scales with the block
    total, 20%+ observed); the direct-cumsum form must track the exact window
    sums at float32 summation accuracy even when the window sum is ~1e-10 of
    the block total."""
    rng = np.random.default_rng(23)
    for f, h in [(512, 256), (1024, 128)]:
        ext = rng.uniform(1e9, 3e9, h + f).astype(np.float32)
        quiet = slice(h + f // 4, h + 3 * f // 4)
        ext[quiet] = rng.uniform(0.005, 0.02, ext[quiet].shape).astype(np.float32)
        got = np.asarray(vad_ops._blocked_trailing_sums(jnp.asarray(ext), f, h))
        want = np.array(
            [ext[t : t + h].astype(np.float64).sum() for t in range(f)]
        )
        # windows fully inside the quiet span have sums ~h*0.01 — billions of
        # times below the loud block totals; relative accuracy must hold there
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_padded_tail_blocked_loud_quiet_equals_unpadded():
    """Bucketed padded-tail processing with the blocked impl on a
    loud-then-quiet stream must match the unpadded one-shot run exactly
    (padding zeros next to huge energies is itself a dynamic-range case)."""
    rng = np.random.default_rng(31)
    n = 300
    energy = np.empty(n, np.float32)
    energy[:150] = rng.uniform(1e9, 3e9, 150)
    energy[150:] = rng.uniform(0.005, 0.02, n - 150)
    zcr = rng.uniform(0, 0.5, n).astype(np.float32)
    entropy = rng.uniform(0, 1, n).astype(np.float32)
    kwargs = dict(
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=0.9, trailing_impl="blocked",
    )
    state = vad_ops.initial_vad_state()
    want_v, want_a, _ = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy), state, **kwargs
    )
    state = vad_ops.initial_vad_state()
    got_v, got_a = [], []
    for lo, hi, bucket in [(0, 137, 256), (137, 300, 256)]:
        m = hi - lo
        pad = bucket - m
        v, a, state = vad_ops.streaming_vad(
            jnp.asarray(np.pad(energy[lo:hi], (0, pad))),
            jnp.asarray(np.pad(zcr[lo:hi], (0, pad))),
            jnp.asarray(np.pad(entropy[lo:hi], (0, pad))),
            state, valid=jnp.asarray(np.arange(bucket) < m), **kwargs,
        )
        got_v.append(np.asarray(v)[:m])
        got_a.append(np.asarray(a)[:m])
    np.testing.assert_array_equal(np.concatenate(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.concatenate(got_a), np.asarray(want_a))


def test_streaming_vad_blocked_equals_conv_on_loud_quiet_transitions():
    """Decision parity between trailing impls on a signal engineered to sit
    near the adaptive threshold right after a loud passage — the regime where
    the cancellation defect flipped 56/512 decisions."""
    rng = np.random.default_rng(29)
    n = 512
    energy = np.empty(n, np.float32)
    energy[:200] = rng.uniform(1e9, 3e9, 200)
    energy[200:] = rng.uniform(0.005, 0.02, n - 200)
    zcr = rng.uniform(0.0, 0.5, n).astype(np.float32)
    entropy = rng.uniform(0.0, 1.0, n).astype(np.float32)
    kwargs = dict(
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=0.9,
    )
    outs = {}
    for impl in ("conv", "blocked"):
        st = vad_ops.initial_vad_state()
        v, a, _ = vad_ops.streaming_vad(
            jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy), st,
            trailing_impl=impl, **kwargs,
        )
        outs[impl] = (np.asarray(v), np.asarray(a))
    np.testing.assert_array_equal(outs["blocked"][0], outs["conv"][0])
    np.testing.assert_array_equal(outs["blocked"][1], outs["conv"][1])


def test_streaming_vad_blocked_trailing_impl_matches_oracle():
    """trailing_impl="blocked" (two-level block cumsums) must reproduce the
    sequential oracle's decisions exactly, one-shot and chunked, including
    chunk sizes that fall back to the conv path (non-multiples of 256)."""
    energy, zcr, entropy = synth_features(1024, seed=13)
    ref = oracle.EngineVadOracle()
    want_vad, want_adp = ref.run_all(energy, zcr, entropy)
    kwargs = dict(
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=3.0, trailing_impl="blocked",
    )
    state = vad_ops.initial_vad_state()
    one_vad, one_adp, one_state = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy), state, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(one_vad), want_vad)
    np.testing.assert_array_equal(np.asarray(one_adp), want_adp)

    for sizes in [[256, 512, 256], [512] * 2, [100, 412, 512], [768, 256]]:
        state = vad_ops.initial_vad_state()
        outs_v, outs_a = [], []
        pos = 0
        for s in sizes:
            v, a, state = vad_ops.streaming_vad(
                jnp.asarray(energy[pos:pos + s]),
                jnp.asarray(zcr[pos:pos + s]),
                jnp.asarray(entropy[pos:pos + s]),
                state, **kwargs,
            )
            outs_v.append(np.asarray(v))
            outs_a.append(np.asarray(a))
            pos += s
        np.testing.assert_array_equal(
            np.concatenate(outs_v), want_vad, err_msg=str(sizes)
        )
        np.testing.assert_array_equal(np.concatenate(outs_a), want_adp)
    # carried state identical to the conv implementation (same ext window)
    conv_state = vad_ops.initial_vad_state()
    _, _, conv_state = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy),
        conv_state, **{**kwargs, "trailing_impl": "conv"},
    )
    np.testing.assert_array_equal(
        np.asarray(one_state.energy_buf), np.asarray(conv_state.energy_buf)
    )
    assert int(one_state.last_voiced) == int(conv_state.last_voiced)


def test_scan_blocks_with_blocked_trailing_matches_oracle():
    """The blocked trailing sums inside the lax.scan long-signal path (block
    size a multiple of history_len, state carried across scan steps) must
    stay decision-identical to the sequential oracle. CI's other scan tests
    shrink SCAN_BLOCK_FRAMES below 256 and so fall back to conv; this one
    uses 256-frame scan blocks to engage the blocked path inside the scan."""
    rng = np.random.default_rng(17)
    sr = 16000
    n_frames = 1024  # 4 scan blocks of 256
    length = 320 + (n_frames - 1) * 160
    t = np.arange(length) / sr
    sig = rng.normal(0, 40, length).astype(np.float32)
    seg = (t * 2).astype(int) % 4
    sig = np.where(seg == 1, 6000 * np.sin(2 * np.pi * 130 * t), sig).astype(np.float32)
    sig = np.where(seg == 2, rng.normal(0, 2000, length), sig).astype(np.float32)

    pipe = FeaturePipeline(FeatureConfig(vad_trailing_impl="blocked"))
    old = FeaturePipeline.SCAN_BLOCK_FRAMES
    FeaturePipeline.SCAN_BLOCK_FRAMES = 256
    try:
        pipe2 = FeaturePipeline(FeatureConfig(vad_trailing_impl="blocked"))
        block, _ = pipe2.process_signal(sig)
    finally:
        FeaturePipeline.SCAN_BLOCK_FRAMES = old
    # one-shot (single 1024-frame block, no scan) as the reference run
    want_block, _ = pipe.process_signal(sig)
    np.testing.assert_array_equal(
        np.asarray(block.vad), np.asarray(want_block.vad)
    )
    # and both against the sequential oracle
    w = oracle.hamming(320)
    windowed = (pipe.stream_frames(sig) * w).astype(np.float32)
    ref = oracle.EngineVadOracle()
    want_vad, want_adp = ref.run_all(
        oracle.short_time_energy(windowed),
        oracle.zero_crossing_rate(windowed),
        oracle.spectral_entropy(windowed, 512),
    )
    np.testing.assert_array_equal(np.asarray(block.vad), want_vad)
    np.testing.assert_array_equal(np.asarray(block.vad_adaptive), want_adp)


def test_full_pipeline_signal_matches_sequential_oracle():
    """End-to-end: synthesize a signal, run the fused pipeline, and compare
    the smoothed VAD stream against a frame-by-frame oracle using oracle
    features (demo.py-style silence→tone→noise→silence layout)."""
    rng = np.random.default_rng(5)
    sr = 16000
    t = np.arange(sr) / sr
    sig = np.zeros_like(t, dtype=np.float32)
    tone = (np.sin(2 * np.pi * 150 * t) * 6000).astype(np.float32)
    sig[4000:8000] = tone[4000:8000]
    sig[8000:12000] = rng.normal(0, 2000, 4000).astype(np.float32)

    pipe = FeaturePipeline(FeatureConfig())
    block, _ = pipe.process_signal(sig)

    w = oracle.hamming(320)
    raw = pipe.stream_frames(sig)
    windowed = (raw * w).astype(np.float32)
    e = oracle.short_time_energy(windowed)
    z = oracle.zero_crossing_rate(windowed)
    h = oracle.spectral_entropy(windowed, 512)
    ref = oracle.EngineVadOracle()
    want_vad, want_adp = ref.run_all(e, z, h)

    np.testing.assert_array_equal(np.asarray(block.vad), want_vad)
    np.testing.assert_array_equal(np.asarray(block.vad_adaptive), want_adp)


def test_streaming_vad_empty_masked_block():
    """A zero-frame block with a valid mask must not crash the masked
    state-correction (empty jnp.max reduction) and must leave state
    unchanged."""
    import jax.numpy as jnp

    from sspv_tpu.ops.vad import initial_vad_state, streaming_vad

    state = initial_vad_state(history_len=8, hangover_on=3)
    empty = jnp.zeros((0,), jnp.float32)
    vad, vad_a, new_state = streaming_vad(
        empty, empty, empty, state,
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=0.95, history_len=8,
        valid=jnp.zeros((0,), bool),
    )
    assert vad.shape == (0,)
    assert int(new_state.count) == int(state.count)
    assert int(new_state.last_voiced) == int(state.last_voiced)


def test_adaptive_margin_optin_releases_under_stationary_noise():
    """Opt-in ``adaptive_margin`` (Config.VAD_ADAPTIVE_ENERGY_MARGIN):
    under stationary sub-fixed-threshold noise the reference-exact adaptive
    gate fires on ~half the frames (its energy threshold tracks the noise
    mean) and the composite never releases; a margin > 1 releases.
    margin=1.0 must be the reference-exact no-op path."""
    rng = np.random.default_rng(11)
    f = 512
    # steady "hum": below the fixed energy gate (1000), low ZCR (passes the
    # zcr gate), high entropy is irrelevant once the fixed gate fails
    energy = (500 + 5 * rng.standard_normal(f)).astype(np.float32)
    # zcr must FLUCTUATE around its mean: the adaptive zcr threshold tracks
    # the trailing mean, so a constant zcr sits exactly ON the threshold
    # (z < th false) and the adaptive gate never fires at all
    zcr = (0.1 + 0.02 * rng.standard_normal(f)).astype(np.float32)
    entropy = np.full(f, 0.9, np.float32)
    kw = dict(
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=3.0,
    )

    state = vad_ops.initial_vad_state()
    vad_ref, _, _ = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy),
        state, **kw,
    )
    vad_one, _, _ = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy),
        state, adaptive_margin=1.0, **kw,
    )
    vad_m, _, _ = vad_ops.streaming_vad(
        jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy),
        state, adaptive_margin=2.0, **kw,
    )
    # explicit 1.0 == default (bit-identical: the multiply is not traced)
    np.testing.assert_array_equal(np.asarray(vad_one), np.asarray(vad_ref))
    # reference semantics: mostly stuck voiced on stationary noise (the
    # adaptive gate fires on ~1/4 of frames — E and Z each beat their
    # tracking thresholds ~half the time — and the 5-frame hangover bridges
    # most gaps)
    assert float(np.asarray(vad_ref)[64:].mean()) > 0.5
    # margin 2.0: threshold 2x the trailing mean -> releases completely
    assert float(np.asarray(vad_m)[64:].mean()) == 0.0


def test_composite_and_mode_releases_under_tonal_noise():
    """Opt-in ``composite_mode="and"`` (Config.VAD_COMPOSITE_MODE): tonal
    noise passes every FIXED gate (energy above the absolute threshold, low
    zcr, low entropy — the babble collapse measured in
    docs/vad_eval_r4.jsonl), so reference semantics stay voiced forever;
    requiring the relative-energy adaptive gate releases, while genuinely
    loud bursts (energy above the trailing mean) still fire."""
    rng = np.random.default_rng(5)
    f = 768
    # sustained tonal noise: loud in absolute terms. Periodic louder
    # "speech" bursts inflate the trailing mean the adaptive threshold
    # tracks (as real speech does in the eval audio), so noise frames sit
    # well below it — on a PURE noise stream the adaptive gate fires on
    # ~25% of frames (E and Z each beat their own tracking threshold ~half
    # the time) and "and" would only partially release.
    energy = (50000 + 500 * rng.standard_normal(f)).astype(np.float32)
    zcr = (0.05 + 0.01 * rng.standard_normal(f)).astype(np.float32)
    bursts = [(100, 110), (250, 260), (400, 420), (550, 560)]
    for lo, hi in bursts:
        energy[lo:hi] *= 8.0
        zcr[lo:hi] = 0.02  # voiced-like, clearly under the tracking mean
    entropy = np.full(f, 0.3, np.float32)  # low entropy == tonal
    kw = dict(
        energy_threshold=1000.0, zcr_threshold=0.3, entropy_voice_max=0.65,
        use_adaptive=True, adaptive_alpha=3.0,
    )
    state = vad_ops.initial_vad_state()
    args = (jnp.asarray(energy), jnp.asarray(zcr), jnp.asarray(entropy), state)
    vad_ref, _, _ = vad_ops.streaming_vad(*args, **kw)
    vad_and, _, _ = vad_ops.streaming_vad(*args, composite_mode="and", **kw)
    # reference: every fixed gate passes the noise -> voiced throughout
    assert float(np.asarray(vad_ref).mean()) == 1.0
    # "and": released during flat noise spans (away from bursts+hangover)...
    flat = np.concatenate([
        np.asarray(vad_and)[150:245],
        np.asarray(vad_and)[300:395],
        np.asarray(vad_and)[450:545],
    ])
    assert float(flat.mean()) < 0.1
    # ...but the loud bursts still fire
    assert float(np.asarray(vad_and)[402:418].mean()) > 0.9
