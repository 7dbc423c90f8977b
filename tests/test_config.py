#!/usr/bin/env python3
"""Config override layers: env-var casting and YAML loading (untested in the
reference; the behavior is part of the compatibility contract)."""

import numpy as np

from sspv_tpu.config import Config


def _restore(attr, value):
    setattr(Config, attr, value)


def test_env_override_casting(monkeypatch):
    orig = {
        "SAMPLE_RATE": Config.SAMPLE_RATE,
        "PREEMPHASIS_ALPHA": Config.PREEMPHASIS_ALPHA,
        "USE_ADAPTIVE_VAD": Config.USE_ADAPTIVE_VAD,
        "WINDOW_TYPE": Config.WINDOW_TYPE,
        "ENERGY_THRESHOLD": Config.ENERGY_THRESHOLD,
    }
    try:
        monkeypatch.setenv("RTP_SAMPLE_RATE", "8000")
        monkeypatch.setenv("RTP_PREEMPHASIS_ALPHA", "0.9")
        monkeypatch.setenv("RTP_USE_ADAPTIVE_VAD", "false")
        monkeypatch.setenv("RTP_WINDOW_TYPE", "hanning")
        monkeypatch.setenv("RTP_ENERGY_THRESHOLD", "bogus")  # cast fails
        monkeypatch.setenv("RTP_NO_SUCH_ATTR", "1")  # unknown: ignored
        Config.load_from_env("RTP_")
        assert Config.SAMPLE_RATE == 8000 and isinstance(Config.SAMPLE_RATE, int)
        assert Config.PREEMPHASIS_ALPHA == 0.9
        assert Config.USE_ADAPTIVE_VAD is False
        assert Config.WINDOW_TYPE == "hanning"
        # failed cast keeps the default (reference config.py:215-216)
        assert Config.ENERGY_THRESHOLD == orig["ENERGY_THRESHOLD"]
        assert not hasattr(Config, "NO_SUCH_ATTR")
    finally:
        for k, v in orig.items():
            _restore(k, v)


def test_yaml_override(tmp_path):
    orig = (Config.ZCR_THRESHOLD, Config.MEL_FILTERS)
    p = tmp_path / "cfg.yaml"
    p.write_text("ZCR_THRESHOLD: 0.25\nMEL_FILTERS: 40\nUNKNOWN_KEY: 1\n")
    try:
        assert Config.load_from_yaml(str(p)) is True
        assert Config.ZCR_THRESHOLD == 0.25
        assert Config.MEL_FILTERS == 40
        assert not hasattr(Config, "UNKNOWN_KEY")
    finally:
        Config.ZCR_THRESHOLD, Config.MEL_FILTERS = orig


def test_yaml_rejects_non_mapping(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("- just\n- a\n- list\n")
    assert Config.load_from_yaml(str(p)) is False
    assert Config.load_from_yaml(str(tmp_path / "missing.yaml")) is False


def test_derived_frame_geometry():
    assert Config.FRAME_SIZE == int(Config.SAMPLE_RATE * Config.FRAME_DURATION / 1000)
    assert Config.HOP_SIZE == Config.FRAME_SIZE // 2


def test_setup_logging_and_print_config(caplog):
    import logging

    Config.setup_logging()
    with caplog.at_level(logging.INFO):
        Config.print_config()
    assert any("16000" in r.message or "8000" in r.message for r in caplog.records)


def test_matmul_precision_knob():
    """TPU_MATMUL_PRECISION maps through FeatureConfig to a lax.Precision."""
    import jax

    from sspv_tpu.config import Config
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline

    assert FeatureConfig.from_config(Config).precision == "highest"
    for name, want in [
        ("highest", jax.lax.Precision.HIGHEST),
        ("high", jax.lax.Precision.HIGH),
        ("default", jax.lax.Precision.DEFAULT),
        ("garbage", jax.lax.Precision.HIGHEST),  # unknown -> safe default
    ]:
        assert FeaturePipeline(FeatureConfig(precision=name))._precision == want
