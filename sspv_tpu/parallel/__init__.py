#!/usr/bin/env python3
"""Multi-device scale-out (data/sequence parallelism over a jax Mesh)."""

from .mesh import make_mesh, BatchPipeline

__all__ = ["make_mesh", "BatchPipeline"]
