#!/usr/bin/env python3
"""VAD quality evaluation across noise conditions.

The reference publishes VAD accuracy/recall/F1 for quiet/normal/noisy
environments measured on live recordings (BASELINE.md). This harness
reproduces that evaluation protocol on synthetic labeled audio so the
composite VAD (engine semantics: gates + adaptive + hangover) can be scored
reproducibly at controlled SNRs:

    python examples/vad_eval.py

Speech proxy: harmonic voiced bursts (f0 120-250 Hz with 3 partials and an
amplitude envelope) of 0.3-1.5 s separated by pauses. Noise types: white
Gaussian, "babble" (a sum of wandering low-frequency tones — spectrally
speech-like, the adversarial case for the entropy gate), and "hum" (mains
50 Hz + harmonics, strongly periodic). Prints one JSON line per condition.
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
    for name, snr, noise in conditions:
        sig, labels = synth_labeled(
            60.0, Config.SAMPLE_RATE, snr, seed=7, noise=noise
        )
        block, _ = pipe.process_signal_auto(sig)
        jax.block_until_ready(block)
        pred = np.asarray(block.vad).astype(bool)
        truth = frame_labels(labels, Config.FRAME_SIZE, Config.HOP_SIZE)
        result = {
            "condition": name, "snr_db": snr, "noise": noise,
            **score(pred, truth),
        }
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
