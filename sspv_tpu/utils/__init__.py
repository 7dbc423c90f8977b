#!/usr/bin/env python3
"""Utilities: compilation cache, profiling helpers."""

from .cache import enable_persistent_cache
from .npz_io import SessionData, load_session, validate_session
from .profiling import RealTimeFactor, device_trace

__all__ = [
    "enable_persistent_cache",
    "SessionData",
    "load_session",
    "validate_session",
    "RealTimeFactor",
    "device_trace",
]
