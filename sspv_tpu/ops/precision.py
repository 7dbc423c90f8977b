#!/usr/bin/env python3
"""Shared matmul-precision name resolution.

One map from the public precision knob names (``Config.TPU_MATMUL_PRECISION``,
``FeatureConfig.precision``, the pitch/pipeline ``precision=`` arguments) to
``jax.lax.Precision`` values, so every matmul path resolves the knob
identically. Semantics on TPU:

- ``"highest"``: f32-accurate (6 bf16 passes on current MXUs);
- ``"high"``: bf16_3x — the shipped pipeline default (see CLAUDE.md);
- ``"default"``: one bf16 pass — fails the 1e-5 parity gate, opt-in only.

Unknown names resolve to HIGHEST (the safe end), matching the historical
behavior of the inlined maps this module replaces.
"""

from __future__ import annotations

import jax

__all__ = ["resolve"]

_NAME_TO_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def resolve(name: str) -> jax.lax.Precision:
    """Map a precision knob name to ``jax.lax.Precision`` (unknown → HIGHEST,
    case-insensitive)."""
    return _NAME_TO_PRECISION.get(
        str(name).strip().lower(), jax.lax.Precision.HIGHEST
    )
