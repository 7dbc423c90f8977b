#!/usr/bin/env python3
"""Utilities: compilation cache, profiling helpers."""

from .cache import enable_persistent_cache

__all__ = ["enable_persistent_cache"]
