#!/usr/bin/env python3
"""sspv_tpu — TPU-native speech signal processing and visualization.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``qingxuandaoming/Speech-Signal-Processing-and-Visualization`` (mounted at
``/root/reference``): real-time 16 kHz speech capture, per-frame time/frequency
features (short-time energy, ZCR, autocorrelation, AMDF, Mel/MFCC, spectral
entropy), fixed + adaptive voice-activity detection with hangover smoothing,
live visualization, and ``.npz`` export — with the compute path redesigned as
batched, fused TPU kernels instead of a per-frame Python loop.

Public top-level surface matches the reference package
(``real_time_voice_processing/__init__.py``): ``Config`` and
``SignalProcessing``.
"""

from .config import Config
from .signal_processing import SignalProcessing

__version__ = "0.1.0"

__all__ = ["Config", "SignalProcessing"]
