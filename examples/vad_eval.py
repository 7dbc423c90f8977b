#!/usr/bin/env python3
"""VAD quality evaluation across noise conditions.

The reference publishes VAD accuracy/recall/F1 for quiet/normal/noisy
environments measured on live recordings (BASELINE.md). This harness
reproduces that evaluation protocol on synthetic labeled audio so the
composite VAD (engine semantics: gates + adaptive + hangover) can be scored
reproducibly at controlled SNRs:

    python examples/vad_eval.py

Two speech proxies, scored side by side:

- ``harmonic`` (r2): voiced bursts of 3 stacked partials (f0 120-250 Hz)
  with an amplitude envelope, 0.3-1.5 s, separated by pauses.
- ``formant`` (r3, the headline protocol): Klatt-style synthesis — a
  jittered glottal pulse train with spectral tilt driven through two
  cascaded second-order formant resonators (F1/F2 drawn per syllable and
  ramped across the nucleus), syllable onsets/codas as high-passed
  fricative noise bursts that are *labeled speech but unvoiced* — the
  realistic failure case for any energy+periodicity gate — grouped into
  multi-syllable utterances with natural pause structure.

Noise types: white Gaussian, "babble" (a sum of wandering low-frequency
tones — spectrally speech-like, the adversarial case for the entropy
gate), and "hum" (mains 50 Hz + harmonics, strongly periodic). Prints one
JSON line per (proxy, condition).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def make_noise(kind: str, n: int, sr: int, rng) -> np.ndarray:
    """Unit-power noise of the given character."""
    if kind == "white":
        return rng.normal(0, 1.0, n)
    if kind == "babble":
        # 12 amplitude- and frequency-wandering tones between 100 and 800 Hz:
        # concentrated low-frequency energy -> low spectral entropy, which
        # stresses the (zcr | entropy) gate exactly where white noise cannot
        t = np.arange(n) / sr
        out = np.zeros(n)
        for _ in range(12):
            f = rng.uniform(100, 800)
            drift = rng.uniform(-30, 30)
            am = 0.5 + 0.5 * np.sin(
                2 * np.pi * rng.uniform(0.3, 3.0) * t + rng.uniform(0, 6.28)
            )
            out += am * np.sin(2 * np.pi * (f + drift * t) * t + rng.uniform(0, 6.28))
        return out / np.sqrt(np.mean(out**2))
    if kind == "hum":
        t = np.arange(n) / sr
        out = (
            np.sin(2 * np.pi * 50 * t)
            + 0.5 * np.sin(2 * np.pi * 100 * t + 0.3)
            + 0.25 * np.sin(2 * np.pi * 150 * t + 0.9)
        )
        out += 0.05 * rng.normal(0, 1.0, n)  # sensor floor
        return out / np.sqrt(np.mean(out**2))
    raise ValueError(kind)


def synth_labeled(duration_s: float, sr: int, snr_db: float, seed: int,
                  noise: str = "white"):
    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    sig = np.zeros(n, dtype=np.float64)
    labels = np.zeros(n, dtype=bool)
    t = 0
    while t < n:
        pause = int(rng.uniform(0.2, 0.8) * sr)
        t += pause
        if t >= n:
            break
        burst = int(rng.uniform(0.3, 1.5) * sr)
        end = min(n, t + burst)
        dur = end - t
        f0 = rng.uniform(120, 250)
        tt = np.arange(dur) / sr
        voiced = (
            np.sin(2 * np.pi * f0 * tt)
            + 0.5 * np.sin(2 * np.pi * 2 * f0 * tt + 0.7)
            + 0.25 * np.sin(2 * np.pi * 3 * f0 * tt + 1.3)
        )
        env = np.minimum(1.0, np.minimum(tt, (dur / sr) - tt) / 0.05 + 0.05)
        sig[t:end] = voiced * env * 8000
        labels[t:end] = True
        t = end
    speech_power = np.mean(sig[labels] ** 2) if labels.any() else 1.0
    noise_power = speech_power / (10 ** (snr_db / 10))
    sig += np.sqrt(noise_power) * make_noise(noise, n, sr, rng)
    return np.clip(sig, -32768, 32767).astype(np.float32), labels


def _resonator(x: np.ndarray, freq: float, bw: float, sr: int) -> np.ndarray:
    """Second-order all-pole formant section (digital resonator): poles at
    ``r·e^{±jθ}`` with ``r = exp(−π·bw/sr)``, ``θ = 2π·freq/sr``, unity gain
    at the pole frequency."""
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * freq / sr
    a = [1.0, -2 * r * np.cos(theta), r * r]
    b = [(1 - r) * np.sqrt(1 - 2 * r * np.cos(2 * theta) + r * r)]
    return lfilter(b, a, x)


def _glottal_train(dur: int, f0_start: float, f0_end: float, sr: int,
                   rng) -> np.ndarray:
    """Jittered impulse train following an F0 ramp, through a leaky
    integrator for the glottal −12 dB/oct spectral tilt."""
    f0 = np.linspace(f0_start, f0_end, dur)
    phase = np.cumsum(f0) / sr
    # one pulse per phase wraparound, ±3% period jitter via phase noise
    phase += rng.normal(0, 0.01, dur).cumsum() * (f0.mean() / sr)
    pulses = np.diff(np.floor(phase), prepend=0.0) > 0
    src = pulses.astype(np.float64)
    # leaky integrator x2 ~ glottal flow tilt
    from scipy.signal import lfilter

    src = lfilter([1.0], [1.0, -0.96], src)
    return src


def synth_formant_speech(duration_s: float, sr: int, snr_db: float,
                         seed: int, noise: str = "white"):
    """Formant-synthesized pseudo-speech with ground-truth labels.

    Utterances of 2-8 syllables; each syllable is an optional unvoiced
    fricative onset (30-80 ms of high-passed noise, labeled speech), a
    voiced nucleus (90-250 ms glottal train through two formant
    resonators with per-syllable F1/F2 targets ramped from the previous
    syllable — crude coarticulation), and an amplitude envelope. Pauses
    of 0.25-0.9 s separate utterances."""
    from scipy.signal import lfilter

    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    sig = np.zeros(n, dtype=np.float64)
    labels = np.zeros(n, dtype=bool)
    t = 0
    f1_prev, f2_prev = 500.0, 1500.0
    while t < n:
        t += int(rng.uniform(0.25, 0.9) * sr)  # inter-utterance pause
        n_syll = int(rng.integers(2, 9))
        for _ in range(n_syll):
            if t >= n:
                break
            # unvoiced fricative onset (~40% of syllables)
            if rng.random() < 0.4:
                dur = int(rng.uniform(0.03, 0.08) * sr)
                end = min(n, t + dur)
                fric = rng.normal(0, 1.0, end - t)
                fric = lfilter([1.0, -0.97], [1.0], fric)  # high-pass
                env = np.linspace(0.3, 1.0, end - t)
                sig[t:end] = fric * env * 1200
                labels[t:end] = True
                t = end
            if t >= n:
                break
            # voiced nucleus through two formant resonators
            dur = int(rng.uniform(0.09, 0.25) * sr)
            end = min(n, t + dur)
            f0a = rng.uniform(90, 220)
            f0b = f0a * rng.uniform(0.85, 1.15)
            src = _glottal_train(end - t, f0a, f0b, sr, rng)
            f1, f2 = rng.uniform(300, 800), rng.uniform(900, 2200)
            # coarticulation: start at the previous syllable's targets
            mid = (end - t) // 3 or 1
            v = _resonator(src, (f1_prev + f1) / 2, 80.0, sr)
            v = _resonator(v, (f2_prev + f2) / 2, 120.0, sr)
            f1_prev, f2_prev = f1, f2
            tt = np.arange(end - t) / sr
            env = np.minimum(1.0, np.minimum(tt, tt[::-1]) / 0.03 + 0.1)
            rms = np.sqrt(np.mean(v**2)) or 1.0
            sig[t:end] = v / rms * env * rng.uniform(4000, 9000)
            labels[t:end] = True
            t = end
            t += int(rng.uniform(0.01, 0.06) * sr)  # intra-word gap
    speech_power = np.mean(sig[labels] ** 2) if labels.any() else 1.0
    noise_power = speech_power / (10 ** (snr_db / 10))
    sig += np.sqrt(noise_power) * make_noise(noise, n, sr, rng)
    return np.clip(sig, -32768, 32767).astype(np.float32), labels


def frame_labels(labels: np.ndarray, frame: int, hop: int) -> np.ndarray:
    n = 1 + (len(labels) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    return labels[idx].mean(axis=1) > 0.5


def score(pred: np.ndarray, truth: np.ndarray) -> dict:
    tp = int(np.sum(pred & truth))
    fp = int(np.sum(pred & ~truth))
    fn = int(np.sum(~pred & truth))
    tn = int(np.sum(~pred & ~truth))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    accuracy = (tp + tn) / max(1, tp + tn + fp + fn)
    return {
        "accuracy": round(accuracy * 100, 1),
        "recall": round(recall * 100, 1),
        "precision": round(precision * 100, 1),
        "f1": round(f1 * 100, 1),
    }


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from sspv_tpu.config import Config
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
    from sspv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    pipe = FeaturePipeline(FeatureConfig.from_config(Config))
    conditions = [
        ("quiet", 30.0, "white"),
        ("normal", 15.0, "white"),
        ("noisy", 5.0, "white"),
        ("babble_15dB", 15.0, "babble"),
        ("babble_5dB", 5.0, "babble"),
        ("hum_15dB", 15.0, "hum"),
        ("hum_5dB", 5.0, "hum"),
    ]
    for proxy, synth in (("formant", synth_formant_speech),
                         ("harmonic", synth_labeled)):
        for name, snr, noise in conditions:
            sig, labels = synth(
                60.0, Config.SAMPLE_RATE, snr, seed=7, noise=noise
            )
            block, _ = pipe.process_signal_auto(sig)
            jax.block_until_ready(block)
            pred = np.asarray(block.vad).astype(bool)
            truth = frame_labels(labels, Config.FRAME_SIZE, Config.HOP_SIZE)
            result = {
                "proxy": proxy, "condition": name, "snr_db": snr,
                "noise": noise, **score(pred, truth),
            }
            print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
