#!/usr/bin/env python3
"""Runtime layer: streaming engine + audio input sources."""

from .audio_source import (
    SUPPORTED_EXTENSIONS,
    AudioSource,
    FileAudioSource,
    PlaylistAudioSource,
    PyAudioSource,
)
from .engine import AudioRuntime

__all__ = [
    "SUPPORTED_EXTENSIONS",
    "AudioSource",
    "FileAudioSource",
    "PlaylistAudioSource",
    "PyAudioSource",
    "AudioRuntime",
]
