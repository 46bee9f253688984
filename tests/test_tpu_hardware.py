"""Hardware-gated tests: run only when a real TPU is attached.

The in-process suite is pinned to a virtual CPU mesh (tests/conftest.py),
so hardware checks spawn a subprocess with the environment's native
platform. Skipped (exit code 42) when no TPU is present."""

import os
import subprocess
import sys

import pytest


def test_pallas_equals_xla_on_tpu():
    worker = os.path.join(os.path.dirname(__file__), "tpu_pallas_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    try:
        r = subprocess.run(
            [sys.executable, worker],
            capture_output=True,
            text=True,
            timeout=2400,
            env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.fail("TPU pallas worker timed out")
    if r.returncode == 42:
        pytest.skip(r.stdout.strip())
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK: pallas == xla" in r.stdout
