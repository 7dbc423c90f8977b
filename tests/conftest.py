"""Test harness configuration: force JAX onto a CPU backend with 8 virtual
devices so sharding/pjit tests exercise a multi-device mesh without TPU
hardware (the driver separately dry-runs the real multi-chip path via
__graft_entry__.dryrun_multichip).

In this environment a sitecustomize module pre-imports jax and registers a
remote TPU PJRT plugin before conftest runs, so setting JAX_PLATFORMS in
os.environ is too late — we must update jax.config and drop the
already-initialized backend. Falling back to remote TPU would make every
first-compile a network round-trip and the suite ~100x slower.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()
except Exception:  # pragma: no cover - best effort; env may already be clean
    pass

assert jax.default_backend() == "cpu", jax.default_backend()
