"""Reproduce the distributed-worker convergence failure standalone:
quadruped cold solve at the worker's exact config."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_cpu_max_isa=SSE4_2"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fccqp_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from fcc_qp_tpu.config import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import (
    constrained_indices, solve_batched_ds, to_ds_batch,
)
from fcc_qp_tpu.models.osc import QUADRUPED, generate_osc_batch
from fcc_qp_tpu.utils.io import stack_qp_dicts

B = 8
qps = generate_osc_batch(QUADRUPED, B, seed=7)
stacked = stack_qp_dicts(qps)
bds = to_ds_batch(stacked)

opts = FCCQPOptions(
    max_iter=3000, rho=1.0, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    polish=True, polish_rounds=4, polish_newton_steps=6,
)
shape = QUADRUPED.shape
con_idx = constrained_indices(bds, shape)
sol, _ = solve_batched_ds(bds, shape, opts, con_idx=con_idx, timing=False)
d = sol.details
print("status:", np.asarray(d.solve_status))
print("n_iter:", np.asarray(d.n_iter))
print("f32:", np.asarray(d.n_iter_f32), "ds:", np.asarray(d.n_iter_ds))
print("attempts:", np.asarray(d.polish_attempts),
      "accepted:", np.asarray(d.polish_accepted))
print("res_b:", np.asarray(d.admm_residual_bounds))
print("res_c:", np.asarray(d.admm_residual_friction_cone))
print("eq_viol:", np.asarray(d.equality_viol))
