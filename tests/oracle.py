"""NumPy/SciPy oracle encoding the reference algorithms' exact semantics.

Each function is a from-the-formula NumPy transliteration of the behavior
documented in SURVEY.md §2 (with reference file:line citations), used as the
golden model for the <=1e-5 (normalized) MSE parity gate. Kept independent of
the sspv_tpu package so a bug can't hide in shared code.
"""

from __future__ import annotations

import numpy as np
from scipy.fftpack import dct as scipy_dct


def hamming(length: int) -> np.ndarray:
    n = np.arange(length)
    return (0.54 - 0.46 * np.cos(2 * np.pi * n / (length - 1))).astype(np.float32)


def preemphasis(x: np.ndarray, alpha: float = 0.97) -> np.ndarray:
    x = x.astype(np.float32)
    return np.append(x[0], x[1:] - alpha * x[:-1]).astype(np.float32)


def framing(signal: np.ndarray, frame_size: int, hop: int, window: np.ndarray) -> np.ndarray:
    # preprocessing.py:69-92 semantics
    signal = signal.astype(np.float32)
    length = signal.size
    if frame_size <= 0 or hop <= 0 or length == 0:
        return np.zeros((0, max(frame_size, 0)), dtype=np.float32)
    num = 1 + int(np.ceil((length - frame_size) / hop))
    if num <= 0:
        return np.zeros((0, frame_size), dtype=np.float32)
    pad_len = (num - 1) * hop + frame_size
    padded = np.pad(signal, (0, max(0, pad_len - length)))
    idx = np.arange(frame_size)[None, :] + hop * np.arange(num)[:, None]
    return (padded[idx] * window).astype(np.float32)


def short_time_energy(frames: np.ndarray) -> np.ndarray:
    return np.sum(frames.astype(np.float32) ** 2, axis=1).astype(np.float32)


def zero_crossing_rate(frames: np.ndarray) -> np.ndarray:
    signs = np.sign(frames.astype(np.float32))
    crossings = np.sum(np.abs(np.diff(signs, axis=1)) > 0, axis=1)
    return crossings.astype(np.float32) / frames.shape[1]


def autocorrelation(frames: np.ndarray, max_lag: int) -> np.ndarray:
    frames = frames.astype(np.float32)
    n, _ = frames.shape
    out = np.zeros((n, max_lag + 1), dtype=np.float32)
    for lag in range(max_lag + 1):
        out[:, lag] = np.sum(frames[:, : -lag or None] * frames[:, lag:], axis=1)
    return out


def amdf(frames: np.ndarray, max_lag: int) -> np.ndarray:
    frames = frames.astype(np.float32)
    n, _ = frames.shape
    out = np.zeros((n, max_lag), dtype=np.float32)
    for lag in range(1, max_lag + 1):
        out[:, lag - 1] = np.mean(np.abs(frames[:, :-lag] - frames[:, lag:]), axis=1)
    return out


def mel_filterbank(num_filters: int, n_fft: int, sr: int, fmin=0.0, fmax=None) -> np.ndarray:
    if fmax is None:
        fmax = sr / 2
    m = lambda f: 2595 * np.log10(1 + np.asarray(f, dtype=float) / 700.0)
    inv = lambda v: 700 * (10 ** (v / 2595.0) - 1)
    pts = inv(np.linspace(m(fmin), m(fmax), num_filters + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(int)
    fb = np.zeros((num_filters, n_fft // 2 + 1), dtype=np.float32)
    for i in range(1, num_filters + 1):
        left, center, right = bins[i - 1], bins[i], bins[i + 1]
        if center == left:
            center += 1
        if right == center:
            right += 1
        fb[i - 1, left:center] = (np.arange(left, center) - left) / (center - left)
        fb[i - 1, center:right] = (right - np.arange(center, right)) / (right - center)
    return fb


def mfcc(frames: np.ndarray, sr: int, n_fft=512, num_filters=26, num_ceps=13,
         lifter=None) -> np.ndarray:
    frames = np.atleast_2d(frames).astype(np.float32)
    spectrum = np.abs(np.fft.rfft(frames, n=n_fft)) ** 2
    fb = mel_filterbank(num_filters, n_fft, sr)
    energy = np.maximum(spectrum @ fb.T, 1e-10)
    out = scipy_dct(np.log(energy), type=2, axis=1, norm="ortho")[:, :num_ceps]
    if lifter:
        n = np.arange(num_ceps)
        out = out * (1.0 + (lifter / 2.0) * np.sin(np.pi * n / lifter))
    return out.astype(np.float32)


def spectral_entropy(frames: np.ndarray, n_fft=512) -> np.ndarray:
    frames = np.atleast_2d(frames).astype(np.float32)
    psd = np.abs(np.fft.rfft(frames, n=n_fft)) ** 2
    s = psd.sum(axis=1, keepdims=True)
    norm = np.divide(psd, s, out=np.zeros_like(psd), where=s > 0)
    norm = np.maximum(norm, 1e-12)
    ent = -np.sum(norm * np.log(norm), axis=1)
    return (ent / np.log(psd.shape[1])).astype(np.float32)


def fixed_vad(energy, zcr, e_th, z_th):
    return (np.asarray(energy) > e_th) & (np.asarray(zcr) < z_th)


def adaptive_vad(energy, zcr, e_hist, z_hist, alpha=0.8, min_e=1e-6, max_z=0.5):
    energy = np.atleast_1d(np.asarray(energy, np.float32))
    zcr = np.atleast_1d(np.asarray(zcr, np.float32))
    cur_e = float(energy.mean()) if energy.size else 0.0
    cur_z = float(zcr.mean()) if zcr.size else 0.0
    hist_e = float(np.mean(e_hist)) if len(e_hist) else cur_e
    hist_z = float(np.mean(z_hist)) if len(z_hist) else cur_z
    alpha = max(0.0, min(float(alpha), 0.99))
    e_th = max(min_e, alpha * hist_e + (1 - alpha) * cur_e)
    z_th = min(max_z, alpha * hist_z + (1 - alpha) * cur_z)
    return (energy > e_th) & (zcr < z_th)


class EngineVadOracle:
    """Sequential transliteration of the engine's per-frame composite VAD
    (engine.py:253-311): gates, adaptive VAD on trailing history deques,
    hangover/release automaton."""

    def __init__(self, energy_threshold=1000.0, zcr_threshold=0.3,
                 entropy_voice_max=0.65, use_adaptive=True, alpha_raw=3.0,
                 hangover_on=3, release_off=2, history_len=256):
        from collections import deque

        self.e_th = energy_threshold
        self.z_th = zcr_threshold
        self.h_max = entropy_voice_max
        self.use_adaptive = use_adaptive
        self.alpha_raw = alpha_raw
        self.on = hangover_on
        self.off = release_off
        self.e_hist = deque(maxlen=history_len)
        self.z_hist = deque(maxlen=history_len)
        self.hold = 0
        self.run = 0

    def step(self, energy: float, zcr: float, entropy: float):
        vad_initial = bool(
            energy > self.e_th and (zcr < self.z_th or entropy < self.h_max)
        )
        vad_adaptive = bool(
            adaptive_vad(
                energy, zcr, list(self.e_hist), list(self.z_hist),
                alpha=self.alpha_raw,
            )[0]
        )
        if self.use_adaptive:
            vad_initial = vad_initial or vad_adaptive
        if vad_initial:
            self.hold = max(self.hold, self.on)
            self.run = 0
            vad = 1
        else:
            if self.hold > 0:
                self.hold -= 1
                vad = 1
                self.run = 0
            else:
                self.run += 1
                vad = 0 if self.run >= self.off else 1
        self.e_hist.append(float(energy))
        self.z_hist.append(float(zcr))
        return vad, int(vad_adaptive)

    def run_all(self, energies, zcrs, entropies):
        vads, adaptives = [], []
        for e, z, h in zip(energies, zcrs, entropies):
            v, a = self.step(float(e), float(z), float(h))
            vads.append(v)
            adaptives.append(a)
        return np.array(vads, np.int32), np.array(adaptives, np.int32)
