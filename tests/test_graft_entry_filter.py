"""The dryrun's stderr filter must drop ONLY the XLA:CPU AOT loader's
false-positive machine-feature lines (the +prefer-no-scatter/+prefer-no-gather
TUNING flags — see __graft_entry__._filter_spurious_aot_lines) and pass
every other line through byte-for-byte, including GENUINE feature-mismatch
lines that name real CPUID features."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import __graft_entry__ as g

SPURIOUS = (
    b"E0000 00:00:00.0 1 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
    b"Target machine feature +prefer-no-scatter is not  supported on the "
    b"host machine.\n"
)
SPURIOUS2 = SPURIOUS.replace(b"+prefer-no-scatter", b"+prefer-no-gather")
GENUINE = SPURIOUS.replace(b"+prefer-no-scatter", b"+avx512f")
OTHER = b"some ordinary stderr line\n"

with g._filter_spurious_aot_lines():
    os.write(2, SPURIOUS)
    os.write(2, GENUINE)
    os.write(2, SPURIOUS2)
    os.write(2, OTHER)
print("BODY DONE")
"""


def test_filter_drops_only_tuning_flag_lines():
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER % {"repo": REPO}],
        capture_output=True,
        timeout=120,
        env={**os.environ, "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr.decode()
    err = proc.stderr.decode()
    # both tuning-flag lines dropped, with the self-describing drop report
    assert "+prefer-no-scatter is not" not in err
    assert "+prefer-no-gather is not" not in err
    assert "filtered 2 spurious XLA:CPU AOT loader lines" in err
    # the genuine mismatch and ordinary traffic pass through untouched
    assert "+avx512f is not  supported" in err
    assert "some ordinary stderr line" in err
    assert "BODY DONE" in proc.stdout.decode()


def test_filter_restores_stderr_after_exit():
    code = _DRIVER + "\nos.write(2, b'AFTER EXIT LINE +prefer-no-scatter\\n')\n"
    proc = subprocess.run(
        [sys.executable, "-c", code % {"repo": REPO}],
        capture_output=True,
        timeout=120,
        env={**os.environ, "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr.decode()
    # once the context exits, fd 2 is the real stderr again — no filtering
    assert "AFTER EXIT LINE +prefer-no-scatter" in proc.stderr.decode()
