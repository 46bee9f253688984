"""Worker for the 2-process jax.distributed CPU test.

Spawned by tests/test_distributed.py as:
    python tests/distributed_worker.py <proc_id> <n_procs> <port>

Each process exposes 2 virtual CPU devices; the two processes form a
4-device global mesh through the distributed coordination service (the
CPU-simulated analog of a 2-host TPU pod slice). The full QP batch is
constructed identically on both hosts, placed as a global sharded array
(`jax.make_array_from_callback`), solved through the flagship ds
engine, and each process checks its ADDRESSABLE shards against a
host-local single-device reference solve — sharded == single-process,
without any cross-process result gather.

The reference has no distributed anything (SURVEY.md §2: single-thread
C++); this exercises the north-star multi-host path end to end.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 --xla_cpu_max_isa=SSE4_2"
)

import jax  # noqa: E402

try:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=proc_id,
    )
except Exception as e:  # pragma: no cover - environment-dependent
    print(f"SKIP: jax.distributed.initialize failed: {e}")
    sys.exit(42)

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from fcc_qp_tpu.config import FCCQPOptions  # noqa: E402
from fcc_qp_tpu.core.ds_engine import (  # noqa: E402
    constrained_indices,
    solve_batched_ds,
    to_ds_batch,
)
from fcc_qp_tpu.models.osc import QUADRUPED, generate_osc_batch  # noqa: E402
from fcc_qp_tpu.utils.io import stack_qp_dicts  # noqa: E402

assert len(jax.devices()) == 2 * n_procs, (
    f"expected {2 * n_procs} global devices, got {len(jax.devices())}"
)
assert len(jax.local_devices()) == 2

B = 8
qps = generate_osc_batch(QUADRUPED, B, seed=7)
stacked = stack_qp_dicts(qps)
bds_host = to_ds_batch(stacked)  # host-identical on both processes

# Flagship configuration (bench.py settings): PDAS polish with retry
# rounds + 6 re-linearization steps. max_iter matches the bench (3000):
# this seed includes a degenerate instance — a friction cone exactly at
# its apex boundary (f_z = 0 at the optimum) — on which even the
# reference algorithm needs ~2.4k ADMM iterations at rho=1 (verified
# against the f64 oracle; the reference's own default budget is 1000,
# `src/fcc_qp.hpp:30-35`). 100% convergence is asserted at this budget.
opts = FCCQPOptions(
    max_iter=3000, rho=1.0, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    polish=True, polish_rounds=4, polish_newton_steps=6,
)
shape = QUADRUPED.shape
con_idx = constrained_indices(bds_host, shape)

# --- local single-device reference (full batch, no sharding) ---------
ref_sol, _ = solve_batched_ds(
    bds_host, shape, opts, con_idx=con_idx, timing=False
)
ref_z = np.asarray(ref_sol.z)

# --- global sharded solve over the 2-process mesh ---------------------
mesh = Mesh(np.asarray(jax.devices()), ("batch",))


def _globalize(a):
    a = np.asarray(a)
    spec = P(*([None] * (a.ndim - 1) + ["batch"]))  # batch-last leaves
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


qp_g = jax.tree.map(_globalize, bds_host)
sol, _ = solve_batched_ds(
    qp_g, shape, opts, con_idx=con_idx, timing=False
)

# each process verifies the shards it can address (z is batch-leading)
n_checked = 0
for s in sol.z.addressable_shards:
    np.testing.assert_allclose(
        np.asarray(s.data), ref_z[s.index], rtol=0, atol=1e-7
    )
    n_checked += s.data.shape[0]
assert n_checked == B // n_procs, (n_checked, B, n_procs)

status = np.concatenate(
    [np.asarray(s.data) for s in sol.details.solve_status.addressable_shards]
)
assert (status == 0).all(), status

print(f"OK proc {proc_id}: checked {n_checked} instances")
