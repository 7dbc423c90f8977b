#!/usr/bin/env python3
"""Persistent XLA compilation cache management.

On hardware where compilation is served by a remote compile service, the
first compile of the fused pipeline takes minutes; with the persistent cache
it reloads in seconds. Safe to call multiple times.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

__all__ = ["enable_persistent_cache", "host_isa_fingerprint"]


def host_isa_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU ISA (arch + feature
    flags). XLA:CPU persistent-cache entries embed AOT machine code whose
    required features (AVX512 etc.) are NOT part of the cache key, so an
    entry written on one host type deserializes on another with "could lead
    to execution errors such as SIGILL" warnings (seen in the r3 multichip
    dryrun tail). CPU caches are scoped per fingerprint to rule that out."""
    import hashlib
    import platform

    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feat = platform.processor()
    h = hashlib.sha1(f"{platform.machine()}|{feat}".encode()).hexdigest()
    return f"{platform.machine()}-{h[:10]}"


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax at a persistent compilation cache directory and lower the
    store threshold to zero. Order of precedence: explicit arg >
    ``JAX_COMPILATION_CACHE_DIR`` env > a repo-checkout-local ``.jax_cache``
    (so every tool/bench/CLI in a checkout shares ONE warm cache — on
    remote-compile hardware a cache split costs minutes per program) >
    ``~/.cache/sspv_tpu/jax``."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        )))
        repo_cache = os.path.join(repo_root, ".jax_cache")
        # Prefer the checkout-local cache whenever we're running from a dev
        # checkout (not just when .jax_cache already exists): a fresh clone
        # must not warm ~/.cache first and then split the cache once
        # .jax_cache appears — on remote-compile hardware a split costs
        # minutes per program. A pip-installed package (no .git/pyproject
        # next to it) keeps using the user cache.
        in_checkout = os.path.isdir(repo_cache) or (
            os.path.exists(os.path.join(repo_root, "pyproject.toml"))
            or os.path.isdir(os.path.join(repo_root, ".git"))
        )
        cache_dir = (
            repo_cache
            if in_checkout
            else os.path.join(os.path.expanduser("~"), ".cache", "sspv_tpu", "jax")
        )
    # CPU-backend processes get an ISA-scoped SUBdirectory: XLA:CPU AOT
    # executables are host-feature-specific but the cache key is not, so a
    # shared dir reused across host types can deserialize wrong-ISA code
    # (SIGILL risk — VERDICT r3 #6). TPU/accelerator processes keep the
    # shared dir: their executables target the same remote chip regardless
    # of which host compiled them. Reading jax.config is a pure host check
    # (never initializes a backend — that can block for minutes during
    # tunnel outages).
    try:
        configured = (jax.config.jax_platforms or "").split(",")[0]
    except Exception:
        configured = ""
    if configured == "cpu":
        cache_dir = os.path.join(cache_dir, f"cpu-{host_isa_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    logger.debug("persistent compilation cache at %s", cache_dir)
    return cache_dir
