#!/usr/bin/env python3
"""ctypes bindings for the native host kernels (native/sspv_host.cpp).

Loads ``libsspv_host.so`` from the repo's ``native/`` directory, building it
with g++ on first use if missing. Every entry point has a NumPy fallback so
the package works without a toolchain; callers use :func:`frame_i16_to_f32`
and never see which path ran.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["native_available", "frame_i16_to_f32"]

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        d = _native_dir()
        so = os.path.join(d, "libsspv_host.so")
        if not os.path.exists(so):
            src = os.path.join(d, "sspv_host.cpp")
            if os.path.exists(src):
                try:
                    subprocess.run(
                        ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                         "-o", so, src],
                        check=True, capture_output=True, timeout=120,
                    )
                except Exception as e:  # no toolchain / build failure
                    logger.debug("native build skipped: %s", e)
                    return None
            else:
                return None
        try:
            lib = ctypes.CDLL(so)
            lib.sspv_frame_i16_to_f32.restype = ctypes.c_int64
            lib.sspv_frame_i16_to_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p,
            ]
            lib.sspv_frame_i16_to_f32_windowed.restype = ctypes.c_int64
            lib.sspv_frame_i16_to_f32_windowed.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover
            logger.debug("native load failed: %s", e)
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def frame_i16_to_f32(
    samples: np.ndarray, frame_size: int, hop: int, window: np.ndarray | None = None
) -> np.ndarray:
    """Overlapping int16 → float32 framing (optionally windowed).

    Streaming semantics: full frames only, no tail padding. Uses the native
    fused kernel when available, NumPy otherwise.
    """
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if window is not None and np.shape(window) != (frame_size,):
        # the native kernel reads window[0..frame_size) unconditionally —
        # validate up front so both paths fail identically instead of the
        # native one reading past the buffer.
        raise ValueError(
            f"window shape {np.shape(window)} != ({frame_size},)"
        )
    n = samples.shape[0]
    if n < frame_size:
        return np.zeros((0, frame_size), dtype=np.float32)
    num = 1 + (n - frame_size) // hop
    lib = _load()
    if lib is not None:
        out = np.empty((num, frame_size), dtype=np.float32)
        if window is not None:
            w = np.ascontiguousarray(window, dtype=np.float32)
            wrote = lib.sspv_frame_i16_to_f32_windowed(
                samples.ctypes.data, n, frame_size, hop, w.ctypes.data,
                out.ctypes.data,
            )
        else:
            wrote = lib.sspv_frame_i16_to_f32(
                samples.ctypes.data, n, frame_size, hop, out.ctypes.data
            )
        assert wrote == num, (wrote, num)
        return out
    idx = np.arange(frame_size)[None, :] + hop * np.arange(num)[:, None]
    out = samples[idx].astype(np.float32)
    if window is not None:
        out *= np.asarray(window, dtype=np.float32)
    return out
