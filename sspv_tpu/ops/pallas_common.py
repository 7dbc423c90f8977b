#!/usr/bin/env python3
"""Shared Pallas-call scaffolding for the fused TPU kernels.

One definition of the TPU memory-space probe and the BlockSpec helper trio
used by every fused call site (``pallas_kernels._fused_call``,
``pallas_view._fused_view_call``, ``pallas_view._fused_pitch_call``) so a
memory-space or interpret-mode fix lands everywhere at once.
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on some builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["block_specs"]


def block_specs():
    """Return ``(interpret, vmem_spec, const)`` for a fused ``pallas_call``:
    interpreter mode off-TPU (so the CPU suite exercises the same kernel
    code), BlockSpecs pinned to VMEM on real TPU hardware, and ``const`` for
    grid-invariant operands (every grid step maps to block (0, 0))."""
    interpret = jax.default_backend() != "tpu"

    def vmem_spec(block_shape, index_map):
        if _VMEM is not None and not interpret:
            return pl.BlockSpec(block_shape, index_map, memory_space=_VMEM)
        return pl.BlockSpec(block_shape, index_map)

    def const(shape):
        return vmem_spec(shape, lambda i: (0, 0))

    return interpret, vmem_spec, const
