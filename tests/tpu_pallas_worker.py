"""Worker for the on-hardware Pallas equivalence test.

Runs OUTSIDE the CPU-pinned pytest environment (tests/conftest.py
forces JAX_PLATFORMS=cpu for every in-process test, so hardware checks
must live in a subprocess with a clean environment). Exits 42 when no
TPU is attached (the parent skips), 0 on pass.

Asserts that the COMPILED Pallas ADMM kernel path produces the same
per-instance iteration counts and solutions as the XLA ds engine on the
actual TPU — closing the gap where kernel correctness on hardware was
only inferred from benchmark convergence statistics (interpret-mode
equivalence is covered on CPU by tests/test_ds_engine.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# persistent compilation cache: the two flagship programs cost minutes
# through the remote-compile relay on a cold cache
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("FCCQP_XLA_CACHE", "/tmp/fccqp_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

if jax.devices()[0].platform != "tpu":
    print(f"SKIP: no TPU attached (platform={jax.devices()[0].platform})")
    sys.exit(42)

import numpy as np  # noqa: E402

from fcc_qp_tpu import FCCQPOptions  # noqa: E402
from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch  # noqa: E402
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_batch  # noqa: E402
from fcc_qp_tpu.utils.io import stack_qp_dicts  # noqa: E402

bds = jax.device_put(
    to_ds_batch(stack_qp_dicts(generate_osc_batch(CASSIE, 128, seed=0)))
)
# flagship (bench.py) configuration: two-phase f32 approach (exercising
# the fused `admm_chunk_pallas32` kernel incl. polish round chunks) +
# PDAS polish + ds endgame (`admm_chunk_pallas`). polish_rounds=4
# matches the bench; at rounds=1 one straggler instance of this seed
# misses 1e-6 within the budget on both engines.
opts = FCCQPOptions(
    max_iter=2000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    polish=True, polish_rounds=4, polish_newton_steps=6,
)

ref, _ = solve_batched_ds(bds, CASSIE.shape, opts, timing=False)
got, _ = solve_batched_ds(
    bds, CASSIE.shape, opts, use_pallas=True, timing=False
)
jax.block_until_ready((ref.z, got.z))

np.testing.assert_array_equal(
    np.asarray(ref.details.n_iter), np.asarray(got.details.n_iter)
)
assert (np.asarray(got.details.solve_status) == 0).all()
assert (np.asarray(ref.details.solve_status) == 0).all()
err = float(np.max(np.abs(np.asarray(ref.z) - np.asarray(got.z))))
assert err < 1e-4, f"pallas-vs-xla on-TPU solution mismatch: {err}"
print(f"OK: pallas == xla on {jax.devices()[0]} (max |dz| = {err:.2e})")
