#!/usr/bin/env python3
"""Import hygiene: ``import sspv_tpu`` must not initialize a JAX backend.

A module-level ``jnp`` constant forces device/backend initialization at
import time, which makes the whole package unimportable when the device is
unavailable (observed: tools crashing with ``Unable to initialize backend
'axon'`` during TPU-tunnel outages instead of blocking and retrying at the
first real device call). Importing must stay a pure-host operation.
"""

import subprocess
import sys


def test_import_does_not_initialize_backend():
    # A fresh subprocess with a clean PYTHONPATH (so the environment's
    # sitecustomize cannot pre-import jax) is the only reliable probe.
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import sspv_tpu\n"
        "import sspv_tpu.ops, sspv_tpu.runtime, sspv_tpu.parallel\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'backends initialized: {list(xb._backends)}'\n"
        "print('clean')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={"PYTHONPATH": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/opt/venv/bin"},
    )
    assert out.returncode == 0, out.stderr
    assert "clean" in out.stdout
