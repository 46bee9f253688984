"""Test configuration: force CPU with a virtual 8-device mesh and f64.

Must mutate the environment before JAX is imported anywhere, hence this
lives at the top of conftest (pytest imports conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's AVX codegen contracts mul+add into FMA inside fusions, which
# silently breaks double-single error-free transforms (ops/ds.py) —
# degrading ds to f32 precision. SSE4.2 has no FMA, so this pins CPU
# tests to contraction-free codegen. XLA:TPU does not contract (verified
# on hardware: ds matvec error 1e-10 vs f64).
if "xla_cpu_max_isa" not in _flags:
    _flags = (_flags + " --xla_cpu_max_isa=SSE4_2").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# The environment's TPU plugin (axon) force-selects itself via
# jax.config at import time; override AFTER import so tests run on the
# virtual 8-device CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite's large jitted programs cost
# minutes of XLA:CPU compile time per cold run; repeat runs (and the
# per-file isolated processes of run_tests.py) skip them entirely.
# ISA-DEDICATED directory: the cache does not key on --xla_cpu_max_isa,
# and a cache shared with FMA-ISA CPU processes can hand this suite an
# executable whose contracted FMA code corrupts ds arithmetic (observed
# r5: a poisoned entry made 1/1024 instances stall at 3e-6).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("FCCQP_XLA_CACHE", "/tmp/fccqp_xla_cache_sse42"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
