#!/usr/bin/env python3
"""The reference repo's unit-test gates, re-expressed as parametrized pytest
cases against the sspv_tpu facade.

Each case encodes a numerical property the reference suite asserts
(tests/test_signal_processing.py in the reference; see SURVEY.md §4) —
synthetic signals with analytically known behavior, no fixtures, no mocks.
One deviation is documented inline: the reference's adaptive-VAD "voiced"
case fails against the reference's own implementation, so the input here is
adjusted to one the implemented semantics actually accept.
"""

import numpy as np
import pytest

from sspv_tpu.config import Config
from sspv_tpu.signal_processing import SignalProcessing


FRAME = Config.FRAME_SIZE


def sine(freq, n=FRAME, amp=1.0):
    return np.sin(2 * np.pi * freq * np.arange(n) / Config.SAMPLE_RATE) * amp


@pytest.mark.parametrize(
    "maker,peak_is_one,all_ones",
    [
        (SignalProcessing.hamming_window, True, False),
        (SignalProcessing.hanning_window, True, False),
        (SignalProcessing.rectangular_window, False, True),
    ],
)
def test_window_properties(maker, peak_is_one, all_ones):
    w = maker(FRAME)
    assert len(w) == FRAME
    if peak_is_one:
        assert abs(float(np.max(w)) - 1.0) < 1e-4
    if all_ones:
        assert np.all(w == 1.0)


@pytest.mark.parametrize(
    "signal,expect_positive",
    [(np.random.randn(FRAME) * 1000, True), (np.zeros(FRAME), False)],
)
def test_short_time_energy_sign(signal, expect_positive):
    e = SignalProcessing.calculate_short_time_energy(signal)
    assert (e > 0) if expect_positive else np.isclose(e, 0)


def test_zcr_against_closed_form():
    freq = 100
    zcr = SignalProcessing.calculate_zero_crossing_rate(sine(freq, amp=1000))
    theoretical = 2 * freq / Config.SAMPLE_RATE  # crossings-per-sample
    assert abs(zcr - theoretical) < 0.01
    assert np.isclose(SignalProcessing.calculate_zero_crossing_rate(np.zeros(FRAME)), 0)


def test_single_frame_acf_contract():
    acf = SignalProcessing.calculate_short_time_autocorrelation(sine(100), max_lag=100)
    assert len(acf) == 100  # historical API: length == max_lag
    assert np.isclose(acf[0], 1.0)  # normalized


@pytest.mark.parametrize("energy,zcr,expect", [(10000, 0.2, 1), (500, 0.05, 0)])
def test_fixed_vad_truth_table(energy, zcr, expect):
    assert SignalProcessing.voice_activity_detection(energy, zcr) == expect


def test_framing_count_formula():
    length = 1000
    frames = SignalProcessing.framing(
        np.random.randn(length), Config.FRAME_SIZE, Config.HOP_SIZE
    )
    expected = 1 + int(np.ceil((length - Config.FRAME_SIZE) / Config.HOP_SIZE))
    assert frames.shape == (expected, Config.FRAME_SIZE)


def test_entropy_ordering_and_mfcc_shape():
    w = SignalProcessing.hamming_window(FRAME)
    tone = sine(440).astype(np.float32) * w
    noise = np.random.randn(FRAME).astype(np.float32) * w

    ent_tone = SignalProcessing.calculate_spectral_entropy(
        tone, n_fft=Config.SPECTRAL_ENTROPY_N_FFT
    )
    ent_noise = SignalProcessing.calculate_spectral_entropy(
        noise, n_fft=Config.SPECTRAL_ENTROPY_N_FFT
    )
    for ent in (ent_tone, ent_noise):
        assert 0.0 <= ent <= 1.0
    # a flat (noise) spectrum carries more entropy than a tonal one
    assert ent_noise > ent_tone

    mfcc = SignalProcessing.compute_mfcc(
        tone,
        sample_rate=Config.SAMPLE_RATE,
        num_ceps=Config.NUM_MFCC,
        n_fft=Config.MFCC_N_FFT,
        n_filters=Config.MEL_FILTERS,
        lifter=Config.MFCC_LIFTER,
    )
    assert mfcc.shape == (Config.NUM_MFCC,)
    assert np.all(np.isfinite(mfcc)) and np.any(np.abs(mfcc) > 1e-6)


@pytest.mark.parametrize(
    "cur_energy,cur_zcr,expect",
    [
        # NOTE: the reference suite uses cur_zcr=0.2 for the voiced case and
        # FAILS against its own implementation (alpha=energy_k=3.0 clamps to
        # 0.99, pinning the zcr threshold to the ~0.03 history mean). We use
        # a zcr the implemented semantics accept; the silence case is as-is.
        # (the reference also probes 200.0 against a history averaging ~200 —
        # a coin flip against the 0.99-blended threshold; 50.0 is decisively
        # below any possible blend of the 100..300 history)
        (5000.0, 0.02, True),
        (50.0, 0.03, False),
    ],
)
def test_adaptive_vad_history_blend(cur_energy, cur_zcr, expect):
    rng = np.random.default_rng(6)
    energy_hist = rng.uniform(100.0, 300.0, size=50)
    zcr_hist = rng.uniform(0.01, 0.05, size=50)
    got = SignalProcessing.adaptive_voice_activity_detection(
        cur_energy,
        cur_zcr,
        energy_hist,
        zcr_hist,
        energy_k=Config.ADAPTIVE_VAD_ENERGY_K,
        zcr_k=Config.ADAPTIVE_VAD_ZCR_K,
        min_history=Config.ADAPTIVE_VAD_HISTORY_MIN,
        fallback_energy_threshold=Config.ENERGY_THRESHOLD,
        fallback_zcr_threshold=Config.ZCR_THRESHOLD,
    )
    assert bool(got) is expect
