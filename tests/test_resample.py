#!/usr/bin/env python3
"""Parity tests for the on-device polyphase resampler (ops/resample.py)
against SciPy's ``resample_poly`` — the exact call the reference makes
host-side (rtvp/runtime/audio_source.py:285-298)."""

import math

import numpy as np
import pytest

from sspv_tpu.ops.resample import (
    _BUCKET_MIN,
    _bucket_len,
    resample_batch_device,
    resample_output_len,
    resample_poly_device,
    resample_to_rate_device,
)
from sspv_tpu.runtime.audio_source import _resample_to

RATE_PAIRS = [
    (8000, 16000),
    (11025, 16000),
    (22050, 16000),
    (44100, 16000),
    (48000, 16000),
    (16000, 8000),
    (16000, 44100),
]


def _ratio(src, dst):
    g = math.gcd(src, dst)
    return dst // g, src // g


def test_bucket_len_grid():
    """{2^k, 1.5*2^k} grid: monotone, >= n, <= 1.5x waste, bounded set."""
    assert _bucket_len(1) == _BUCKET_MIN
    assert _bucket_len(_BUCKET_MIN) == _BUCKET_MIN
    for n in (
        _BUCKET_MIN + 1, 20000, 24576, 24577, 30000, 32768, 32769,
        100000, 16000 * 3600, 16000 * 86400,
    ):
        b = _bucket_len(n)
        assert b >= n
        assert b < 1.5 * n + 1, (n, b)
        # grid membership: b is 2^k or 3*2^(k-1)
        assert b & (b - 1) == 0 or (b % 3 == 0 and (b // 3) & (b // 3 - 1) == 0)
    # program count across 1 s .. 24 h of 16 kHz audio stays tiny
    lens = {_bucket_len(n) for n in range(16000, 16000 * 86400, 99991)}
    assert len(lens) <= 32


def test_bucketed_wrapper_bit_equals_exact_shape():
    """Padding to the bucket grid must not change a single output sample:
    zero padding == SciPy's constant-zero extension, and each output's f32
    contraction order is independent of the row count."""
    rng = np.random.default_rng(21)
    for n in (4097, 30000, 24577):
        x = rng.normal(0, 8000, n).clip(-32768, 32767).astype(np.int16)
        for src, dst in ((22050, 16000), (48000, 16000), (8000, 16000)):
            bucketed = resample_to_rate_device(x, src, dst)
            exact = resample_to_rate_device(x, src, dst, bucket=False)
            np.testing.assert_array_equal(bucketed, exact, err_msg=f"{src}->{dst} n={n}")
            assert bucketed.shape[0] == resample_output_len(
                n, *_ratio(src, dst)
            )


def test_unreadable_config_warns_and_falls_back(monkeypatch, caplog):
    """An uncoercible TPU_DEVICE_RESAMPLE_MIN_SECONDS must not silently
    disable device routing — the host fallback logs a warning."""
    import logging

    from sspv_tpu.config import Config

    monkeypatch.setattr(Config, "TPU_DEVICE_RESAMPLE", True, raising=False)
    monkeypatch.setattr(
        Config, "TPU_DEVICE_RESAMPLE_MIN_SECONDS", "50ms", raising=False
    )
    x = np.ones(4000, np.int16)
    with caplog.at_level(logging.WARNING, logger="sspv_tpu.runtime.audio_source"):
        out = _resample_to(x, 22050, 16000)
    assert out.dtype == np.int16
    assert any("config unreadable" in r.message for r in caplog.records)


@pytest.mark.parametrize("src,dst", RATE_PAIRS)
@pytest.mark.parametrize("n", [1, 7, 317, 4096, 40000])
def test_float_parity_vs_scipy(src, dst, n):
    from scipy.signal import resample_poly

    rng = np.random.default_rng(n * 31 + src % 97)
    x = rng.normal(0, 3000, n).astype(np.float32)
    up, down = _ratio(src, dst)
    ref = resample_poly(x, up, down)
    out = np.asarray(resample_poly_device(x, up, down))
    assert out.shape == ref.shape == (resample_output_len(n, up, down),)
    assert out.dtype == np.float32
    # f32-accurate matmul vs scipy's f32 FIR: rounding-level differences
    # only, on +-32768-scale data.
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0)
    denom = float(np.sum(ref.astype(np.float64) ** 2)) or 1.0
    nmse = float(np.sum((out.astype(np.float64) - ref) ** 2)) / denom
    assert nmse <= 1e-10, nmse


def test_unreduced_ratio_and_identity():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1000, 500).astype(np.float32)
    a = np.asarray(resample_poly_device(x, 32000, 16000))
    b = np.asarray(resample_poly_device(x, 2, 1))
    np.testing.assert_array_equal(a, b)
    ident = np.asarray(resample_poly_device(x, 3, 3))
    np.testing.assert_array_equal(ident, x)
    assert np.asarray(resample_poly_device(x[:0], 2, 1)).shape == (0,)


def test_row_block_invariance():
    """The scan-blocked path must be bit-identical to the single-block one."""
    rng = np.random.default_rng(9)
    x = rng.normal(0, 3000, 50000).astype(np.float32)
    big = np.asarray(resample_poly_device(x, 160, 441, row_block=1 << 20))
    small = np.asarray(resample_poly_device(x, 160, 441, row_block=64))
    np.testing.assert_array_equal(big, small)


def test_int16_wrapper_parity():
    rng = np.random.default_rng(3)
    x = (rng.normal(0, 8000, 30000)).clip(-32768, 32767).astype(np.int16)
    for src, dst in RATE_PAIRS:
        ref = _resample_to(x, src, dst)
        out = resample_to_rate_device(x, src, dst)
        assert out.dtype == np.int16 and out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, (src, dst, diff.max())
        frac = float((diff > 0).mean())
        assert frac < 1e-3, (src, dst, frac)
    same = resample_to_rate_device(x, 16000, 16000)
    np.testing.assert_array_equal(same, x)


def test_batch_matches_per_row_and_masking():
    rng = np.random.default_rng(11)
    up, down = _ratio(22050, 16000)
    batch = rng.normal(0, 3000, (4, 6000)).astype(np.float32)
    out = np.asarray(resample_batch_device(batch, up, down))
    for i in range(batch.shape[0]):
        row = np.asarray(resample_poly_device(batch[i], up, down))
        # vmap turns the banded matmul into a batched matmul whose f32
        # accumulation order may differ: rounding-level equality only.
        np.testing.assert_allclose(out[i], row, atol=0.05, rtol=0)
    # Zero-padded rows: the first resample_output_len(l) samples must equal
    # the unpadded row's resample (zero extension == constant-0 padtype).
    true_len = 3210
    padded = batch[0].copy()
    padded[true_len:] = 0.0
    out_pad = np.asarray(resample_poly_device(padded, up, down))
    out_true = np.asarray(resample_poly_device(batch[0][:true_len], up, down))
    keep = resample_output_len(true_len, up, down)
    # Semantically identical (zero terms add nothing); the gemm's f32
    # accumulation order still shifts with the matrix shape.
    np.testing.assert_allclose(out_pad[:keep], out_true, atol=0.05, rtol=0)


def test_config_knob_routes_long_arrays_to_device(monkeypatch):
    """TPU_DEVICE_RESAMPLE routes whole-file arrays through the device path
    and leaves short chunks on host SciPy."""
    import sspv_tpu.ops.resample as dev_mod
    from sspv_tpu.config import Config

    calls = []
    real = dev_mod.resample_to_rate_device

    def spy(arr, src, dst):
        calls.append(arr.shape)
        return real(arr, src, dst)

    monkeypatch.setattr(dev_mod, "resample_to_rate_device", spy)
    monkeypatch.setattr(Config, "TPU_DEVICE_RESAMPLE", True, raising=False)
    monkeypatch.setattr(
        Config, "TPU_DEVICE_RESAMPLE_MIN_SECONDS", 1.0, raising=False
    )
    rng = np.random.default_rng(7)
    long_arr = rng.normal(0, 5000, 22050 * 2).astype(np.int16)
    out = _resample_to(long_arr, 22050, 16000)
    assert calls == [long_arr.shape]
    ref = _resample_to_scipy(long_arr, 22050, 16000)
    assert np.abs(out.astype(np.int32) - ref.astype(np.int32)).max() <= 1

    short = long_arr[:1000]
    _resample_to(short, 22050, 16000)
    assert calls == [long_arr.shape]  # short chunk stayed on host


def _resample_to_scipy(arr, src_sr, dst_sr):
    from scipy.signal import resample_poly

    g = math.gcd(src_sr, dst_sr)
    y = resample_poly(arr.astype(np.float32), dst_sr // g, src_sr // g)
    return np.clip(y, -32768.0, 32767.0).astype(np.int16)


def test_validation_errors():
    with pytest.raises(ValueError):
        resample_poly_device(np.zeros(10, np.float32), 0, 3)
    with pytest.raises(ValueError):
        resample_poly_device(np.zeros((2, 10), np.float32), 2, 1)
    with pytest.raises(ValueError):
        resample_batch_device(np.zeros(10, np.float32), 2, 1)
