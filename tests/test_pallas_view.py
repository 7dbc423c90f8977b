#!/usr/bin/env python3
"""Fused signal-view Pallas kernel parity (interpreter mode on CPU) against
the XLA hop-phase view path and the NumPy oracle.

The kernel's matmuls run a MANUAL 3-pass bf16 split (ops/pallas_view.py), so
parity vs the float64 oracle is gated at the same order the XLA "high"
(bf16_3x) path measures on chip (~1e-8 NMSE), well inside the 1e-5 contract.
"""

import numpy as np

from sspv_tpu.ops import bases
from sspv_tpu.ops.pallas_view import fused_view_features
from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
from sspv_tpu.ops.windows import hamming_window

import oracle


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return np.mean((got - want) ** 2) / max(np.mean(want**2), 1e-12)


def _rows(signal: np.ndarray, hop: int = 160) -> np.ndarray:
    n = 1 + (len(signal) - 2 * hop) // hop
    return signal[: (n + 1) * hop].astype(np.float32).reshape(n + 1, hop)


def _kernel_kwargs(frame_size=320, n_fft=512):
    wm, wnyq = bases.merged_windowed_dft_bases(frame_size, n_fft, "hamming")
    return dict(
        wm=wm,
        wnyq=wnyq,
        fb_t=bases.mel_filterbank_np(26, n_fft, 16000).T.copy(),
        dct=bases.dct_ortho_matrix(26, 13),
        lifter=bases.lifter_vector(13, 22),
        window=hamming_window(frame_size),
    )


def test_view_kernel_matches_oracle():
    rng = np.random.default_rng(7)
    sig = rng.normal(0, 3000, 160 * 801).astype(np.float32)  # 800 frames
    rows = _rows(sig)
    out = fused_view_features(rows, **_kernel_kwargs())

    w = hamming_window(320)
    frames = oracle.framing(sig[: 160 * 801], 320, 160, w)[: rows.shape[0] - 1]
    assert out["energy"].shape == (800,)
    assert out["mfcc"].shape == (800, 13)
    assert _nmse(out["energy"], oracle.short_time_energy(frames)) < 1e-7
    np.testing.assert_allclose(
        np.asarray(out["zcr"]), oracle.zero_crossing_rate(frames), atol=1e-6
    )
    # 3-pass bf16 DFT/mel/DCT: same order as the on-chip "high" path
    assert _nmse(out["mfcc"], oracle.mfcc(frames, 16000, lifter=22)) < 1e-7
    assert _nmse(out["entropy"], oracle.spectral_entropy(frames, 512)) < 1e-7


def test_view_kernel_matches_xla_view_path():
    """Same rows through the kernel and through the shipped XLA hop-phase
    path; both approximate f32 with 3-pass bf16 matmuls, so they agree to
    the split's reconstruction error."""
    rng = np.random.default_rng(13)
    sig = rng.normal(0, 500, 160 * 513).astype(np.float32)
    rows = _rows(sig)
    got = fused_view_features(rows, **_kernel_kwargs())
    pipe = FeaturePipeline(FeatureConfig(precision="high"))
    want = pipe._features_from_rows(rows)
    for k in ("energy", "zcr", "entropy", "mfcc"):
        assert _nmse(got[k], want[k]) < 1e-7, k


def test_view_kernel_small_and_padded_batches():
    rng = np.random.default_rng(21)
    for n_frames in (1, 3, 511, 513):
        sig = rng.normal(0, 1000, 160 * (n_frames + 1)).astype(np.float32)
        out = fused_view_features(_rows(sig), **_kernel_kwargs())
        assert out["energy"].shape == (n_frames,)
        assert np.all(np.isfinite(np.asarray(out["mfcc"])))


def test_pipeline_integration_and_vad_agreement():
    """The full signal pipeline with the view kernel forced on (the CPU
    backend gate is bypassed to exercise interpreter mode) must agree with
    the shipped XLA pipeline on features and VAD decisions."""
    from sspv_tpu.config import Config

    sr = Config.SAMPLE_RATE
    t = np.arange(12 * sr) / sr
    rng = np.random.default_rng(3)
    sig = rng.normal(0, 40, t.size).astype(np.float32)
    voiced = ((t * 2).astype(int) % 4) == 1
    sig = np.where(voiced, 6000 * np.sin(2 * np.pi * 130 * t), sig).astype(
        np.float32
    )

    ref_pipe = FeaturePipeline(FeatureConfig())
    want, _ = ref_pipe.process_signal(sig)

    pipe = FeaturePipeline(FeatureConfig(view_kernel=True))
    # CPU backend: _use_view_kernel gates on TPU; force it so the suite
    # exercises the kernel in interpreter mode end-to-end.
    pipe._use_view_kernel = True
    got, _ = pipe.process_signal(sig)

    for k in ("energy", "zcr", "entropy", "mfcc"):
        assert _nmse(getattr(got, k), getattr(want, k)) < 1e-7, k
    # decisions: identical except possibly at sub-f32 threshold ties
    agree = np.mean(np.asarray(got.vad) == np.asarray(want.vad))
    assert agree >= 0.999, agree
    agree_a = np.mean(
        np.asarray(got.vad_adaptive) == np.asarray(want.vad_adaptive)
    )
    assert agree_a >= 0.999, agree_a


def test_view_kernel_other_geometries():
    """The kernel is parametric in n_fft / mel filters / cepstra; fuzz a few
    non-default shapes against the oracle (n_fft >= frame_size and even —
    the merged-basis contract)."""
    rng = np.random.default_rng(31)
    sr = 16000
    for n_fft, n_filt, n_ceps in ((320, 26, 13), (1024, 40, 20), (512, 20, 8)):
        sig = rng.normal(0, 2500, 160 * 65).astype(np.float32)
        rows = _rows(sig)
        wm, wnyq = bases.merged_windowed_dft_bases(320, n_fft, "hamming")
        out = fused_view_features(
            rows,
            wm=wm,
            wnyq=wnyq,
            fb_t=bases.mel_filterbank_np(n_filt, n_fft, sr).T.copy(),
            dct=bases.dct_ortho_matrix(n_filt, n_ceps),
            lifter=bases.lifter_vector(n_ceps, 22),
            window=hamming_window(320),
        )
        w = hamming_window(320)
        frames = oracle.framing(sig[: 160 * 65], 320, 160, w)[: rows.shape[0] - 1]
        want = oracle.mfcc(
            frames, sr, n_fft=n_fft, num_filters=n_filt, num_ceps=n_ceps,
            lifter=22,
        )
        key = (n_fft, n_filt, n_ceps)
        assert out["mfcc"].shape == (64, n_ceps), key
        assert _nmse(out["mfcc"], want) < 1e-7, key
        assert _nmse(
            out["entropy"], oracle.spectral_entropy(frames, n_fft)
        ) < 1e-7, key


def test_view_kernel_gated_off_for_hanning():
    """hanning has zero endpoints (not strictly positive), so the raw-sign
    ZCR identity fails and the kernel must stay off."""
    p = FeaturePipeline(
        FeatureConfig(view_kernel=True, window_type="hanning")
    )
    assert p._use_view_kernel is False


def test_pitch_kernel_matches_xla_track():
    """fused_view_pitch (via pitch_track_signal(use_kernel=True)) must agree
    with the shipped XLA track: identical F0 decisions away from ACF ties,
    confidence at the 3-pass split error."""
    from sspv_tpu.ops.pitch import pitch_track_signal

    sr = 16000
    t = np.arange(4 * sr) / sr
    rng = np.random.default_rng(5)
    sig = rng.normal(0, 40, t.size)
    voiced = ((t * 2).astype(int) % 4) == 1
    sig = np.where(
        voiced, 5000 * np.sin(2 * np.pi * 130 * t), sig
    ).astype(np.float32)
    n = 1 + (sig.size - 320) // 160
    vad = np.ones(n, np.int32)

    f0_x, conf_x = pitch_track_signal(sig, vad)
    f0_k, conf_k = pitch_track_signal(sig, vad, use_kernel=True)
    f0_x, f0_k = np.asarray(f0_x), np.asarray(f0_k)
    assert np.mean(f0_x == f0_k) >= 0.999
    assert _nmse(conf_k, conf_x) < 1e-7
    # and the truth: voiced frames track the 130 Hz tone
    got = f0_k[f0_k > 0]
    assert got.size > 0 and abs(np.median(got) - 130.0) < 5.0


def test_view_kernel_geometry_gating():
    """Unsupported geometries must leave the kernel off (XLA fallback), even
    with the knob set."""
    import jax

    on_tpu = jax.default_backend() == "tpu"
    # 50%-overlap geometry violated
    p = FeaturePipeline(
        FeatureConfig(view_kernel=True, frame_size=300, hop_size=160)
    )
    assert p._use_view_kernel is False
    # distinct entropy spectrum
    p = FeaturePipeline(FeatureConfig(view_kernel=True, entropy_n_fft=256))
    assert p._use_view_kernel is False
    # supported geometry: on only when the backend is TPU
    p = FeaturePipeline(FeatureConfig(view_kernel=True))
    assert p._use_view_kernel is on_tpu


def test_pitch_kernel_scan_blocked_matches_unscanned():
    """The fused Pallas pitch kernel inside the lax.scan-blocked path must
    equal the kernel's unscanned output bitwise (the kernel already pads its
    own frame axis internally; scan blocking adds an outer split only)."""
    from sspv_tpu.ops.pitch import pitch_track_signal

    sr = 16000
    t = np.arange(3 * sr) / sr
    rng = np.random.default_rng(11)
    sig = np.where(
        ((t * 2).astype(int) % 4) == 1,
        5000 * np.sin(2 * np.pi * 130 * t),
        rng.normal(0, 40, t.size),
    ).astype(np.float32)
    n = 1 + (sig.size - 320) // 160
    vad = np.ones(n, np.int32)

    f0_u, conf_u = pitch_track_signal(sig, vad, use_kernel=True, scan_block=0)
    f0_s, conf_s = pitch_track_signal(sig, vad, use_kernel=True, scan_block=96)
    np.testing.assert_array_equal(np.asarray(f0_s), np.asarray(f0_u))
    np.testing.assert_array_equal(np.asarray(conf_s), np.asarray(conf_u))


def test_view_block_frames_knob_multi_grid_step():
    """``Config.TPU_VIEW_BLOCK_FRAMES`` governs the kernels' per-grid-step
    frame count (r3 sweep default 1024). Shrinking it must split the same
    input across multiple grid steps and reproduce the one-step output —
    grid steps are frame-independent; only weight-DMA amortization changes.
    Guards coverage the 512→1024 default flip removed: at the shipped
    default every suite-sized input fits a single grid step."""
    from sspv_tpu.config import Config
    from sspv_tpu.ops.pallas_view import _pick_block_frames

    rng = np.random.default_rng(41)
    sig = rng.normal(0, 2000, 160 * 514).astype(np.float32)  # 513 frames
    rows = _rows(sig)
    kw = _kernel_kwargs()
    base = Config.TPU_VIEW_BLOCK_FRAMES
    try:
        Config.TPU_VIEW_BLOCK_FRAMES = 2048
        # oversized knob shrinks to the /8-padded input frame count
        assert _pick_block_frames(513) == 520
        one = fused_view_features(rows, **kw)

        Config.TPU_VIEW_BLOCK_FRAMES = 100
        # non-multiple-of-8 knob rounds up; 513 frames -> 5 grid steps
        assert _pick_block_frames(513) == 104
        many = fused_view_features(rows, **kw)

        # grid partitioning changes XLA's reduction vectorization, so
        # compare at NMSE (observed ~1e-12; values agree to ~3e-5 relative)
        for k in ("energy", "zcr", "entropy", "mfcc"):
            assert _nmse(many[k], one[k]) < 1e-9, k

        # pitch kernel reads the same knob: F0 decisions must agree with a
        # single-step run away from ACF ties. Call fused_view_pitch DIRECTLY
        # (like the features half above): pitch_track_signal is @jax.jit'd
        # and reads the knob at trace time, so a second call at a new knob
        # value would be a jit-cache hit reusing the old grid step — the
        # r3 version of this assertion was vacuous for exactly that reason
        # (ADVICE r3). _fused_pitch_call keys on block_frames (static), so
        # each direct call compiles its own grid partitioning.
        from sspv_tpu.ops.pallas_view import fused_view_pitch
        from sspv_tpu.ops.pitch import _lag_band
        from sspv_tpu.ops.time_features import _acf_dft_bases_merged

        t = np.arange(3 * 16000) / 16000
        psig = np.where(
            ((t * 2).astype(int) % 4) == 1,
            5000 * np.sin(2 * np.pi * 130 * t),
            rng.normal(0, 40, t.size),
        ).astype(np.float32)
        lag_min, lag_max = _lag_band(16000, 50.0, 400.0, 320)
        merged, nyq_b, inv_live, inv_nyq = _acf_dft_bases_merged(320, lag_max)
        pkw = dict(
            merged=merged, nyq_b=nyq_b, inv_live=inv_live, inv_nyq=inv_nyq,
            lag_min=lag_min, lag_max=lag_max, sample_rate=16000,
        )
        prows = _rows(psig)
        n = prows.shape[0] - 1
        assert _pick_block_frames(n) == 104  # knob still 100: 3 grid steps
        f0_m, conf_m = fused_view_pitch(prows, **pkw)
        Config.TPU_VIEW_BLOCK_FRAMES = 2048
        assert _pick_block_frames(n) == 304  # single grid step
        f0_1, conf_1 = fused_view_pitch(prows, **pkw)
        assert np.mean(np.asarray(f0_m) == np.asarray(f0_1)) >= 0.999
        assert _nmse(np.asarray(conf_m), np.asarray(conf_1)) < 1e-9
    finally:
        Config.TPU_VIEW_BLOCK_FRAMES = base


def test_transposed_gate_boundaries():
    """_use_transposed's engagement gate (ops/pallas_view.py): the 128-lane
    seam tile makes Mosaic's block clamping safe only when every multiple
    of bf that is <= f is also <= f+1-128, i.e. f % bf >= 127."""
    from sspv_tpu.config import Config
    from sspv_tpu.ops.pallas_view import _use_transposed

    assert _use_transposed(1024 + 127, 1024)       # r == 127: minimal safe
    assert not _use_transposed(1024 + 126, 1024)   # r == 126: clamp unsafe
    assert not _use_transposed(2048, 1024)         # r == 0: exact multiple
    assert not _use_transposed(1000, 1024)         # f < bf
    assert not _use_transposed(2000, 1000)         # bf not 128-aligned
    orig = Config.TPU_VIEW_ORIENT
    try:
        Config.TPU_VIEW_ORIENT = "rows"
        assert not _use_transposed(1024 + 200, 1024)  # escape hatch
    finally:
        Config.TPU_VIEW_ORIENT = orig


def test_transposed_kernel_matches_rows_kernel_and_oracle():
    """The transposed-orientation kernel at an engaging shape must match
    the rows-direct kernel (same products, reduction trees along the other
    axis) and the float64 oracle at the 3-pass-bf16 order."""
    from sspv_tpu.config import Config
    from sspv_tpu.ops.pallas_view import _use_transposed

    rng = np.random.default_rng(31)
    f = 1024 + 200
    assert _use_transposed(f, 1024)
    sig = rng.normal(0, 3000, 160 * (f + 1)).astype(np.float32)
    rows = _rows(sig)
    kw = _kernel_kwargs()
    got_t = fused_view_features(rows, **kw)
    orig = Config.TPU_VIEW_ORIENT
    try:
        Config.TPU_VIEW_ORIENT = "rows"
        got_r = fused_view_features(rows, **kw)
    finally:
        Config.TPU_VIEW_ORIENT = orig
    for k in ("energy", "zcr", "entropy", "mfcc"):
        assert got_t[k].shape == got_r[k].shape, k
        assert _nmse(got_t[k], got_r[k]) < 1e-12, k

    w = hamming_window(320)
    frames = oracle.framing(sig[: 160 * (f + 1)], 320, 160, w)[:f]
    assert _nmse(got_t["energy"], oracle.short_time_energy(frames)) < 1e-7
    np.testing.assert_allclose(
        np.asarray(got_t["zcr"]), oracle.zero_crossing_rate(frames),
        atol=1e-6,
    )
    assert _nmse(got_t["mfcc"], oracle.mfcc(frames, 16000, lifter=22)) < 1e-7
    assert (
        _nmse(got_t["entropy"], oracle.spectral_entropy(frames, 512)) < 1e-7
    )


def test_transposed_kernel_minimal_safe_remainder():
    """f % bf == 127 is the smallest remainder the transposed kernel
    serves; the clamped final seam tile must feed only masked tail frames
    (wrong values here would corrupt the LAST real frame)."""
    from sspv_tpu.config import Config
    from sspv_tpu.ops.pallas_view import _use_transposed

    rng = np.random.default_rng(37)
    f = 2 * 1024 + 127
    assert _use_transposed(f, 1024)
    sig = rng.normal(0, 3000, 160 * (f + 1)).astype(np.float32)
    rows = _rows(sig)
    kw = _kernel_kwargs()
    got_t = fused_view_features(rows, **kw)
    orig = Config.TPU_VIEW_ORIENT
    try:
        Config.TPU_VIEW_ORIENT = "rows"
        got_r = fused_view_features(rows, **kw)
    finally:
        Config.TPU_VIEW_ORIENT = orig
    # the final frames are exactly where a clamping bug would surface
    for k in ("energy", "zcr", "entropy", "mfcc"):
        a = np.asarray(got_t[k])[-130:]
        b = np.asarray(got_r[k])[-130:]
        assert _nmse(a, b) < 1e-12, k


def test_transposed_pitch_matches_rows_kernel():
    from sspv_tpu.config import Config
    from sspv_tpu.ops.pallas_view import _use_transposed, fused_view_pitch
    from sspv_tpu.ops.pitch import _lag_band
    from sspv_tpu.ops.time_features import _acf_dft_bases_merged

    rng = np.random.default_rng(41)
    f = 1024 + 500
    assert _use_transposed(f, 1024)
    t = np.arange(160 * (f + 1)) / 16000
    sig = np.where(
        ((t * 2).astype(int) % 4) == 1,
        5000 * np.sin(2 * np.pi * 130 * t),
        rng.normal(0, 40, t.size),
    ).astype(np.float32)
    rows = _rows(sig)
    lag_min, lag_max = _lag_band(16000, 50.0, 400.0, 320)
    merged, nyq_b, inv_live, inv_nyq = _acf_dft_bases_merged(320, lag_max)
    pkw = dict(
        merged=merged, nyq_b=nyq_b, inv_live=inv_live, inv_nyq=inv_nyq,
        lag_min=lag_min, lag_max=lag_max, sample_rate=16000,
    )
    f0_t, conf_t = fused_view_pitch(rows, **pkw)
    orig = Config.TPU_VIEW_ORIENT
    try:
        Config.TPU_VIEW_ORIENT = "rows"
        f0_r, conf_r = fused_view_pitch(rows, **pkw)
    finally:
        Config.TPU_VIEW_ORIENT = orig
    assert f0_t.shape == f0_r.shape == (f,)
    assert np.mean(np.asarray(f0_t) == np.asarray(f0_r)) >= 0.999
    assert _nmse(np.asarray(conf_t), np.asarray(conf_r)) < 1e-9
