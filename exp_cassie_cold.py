"""Cold Cassie B=128 at the tpu_pallas_worker config (XLA path, CPU):
how many instances fail, and with what residuals?"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_cpu_max_isa=SSE4_2"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fccqp_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_batch
from fcc_qp_tpu.utils.io import stack_qp_dicts

bds = to_ds_batch(stack_qp_dicts(generate_osc_batch(CASSIE, 128, seed=0)))
opts = FCCQPOptions(
    max_iter=2000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    polish=True, polish_rounds=4, polish_newton_steps=6,
)
sol, _ = solve_batched_ds(bds, CASSIE.shape, opts, timing=False)
d = sol.details
st = np.asarray(d.solve_status)
bad = np.where(st != 0)[0]
print("n_bad:", len(bad), "idx:", bad)
print("statuses:", np.unique(st, return_counts=True))
n = np.asarray(d.n_iter)
print("n_iter p50:", np.median(n), "max:", n.max())
try:
    print("f32:", np.asarray(d.n_iter_f32)[bad], "ds:",
          np.asarray(d.n_iter_ds)[bad],
          "att:", np.asarray(d.polish_attempts)[bad],
          "acc:", np.asarray(d.polish_accepted)[bad])
    acc = np.asarray(d.polish_accepted)
    print("accept%:", 100.0 * acc.mean())
except AttributeError:
    pass
print("res_b bad:", np.asarray(d.admm_residual_bounds)[bad])
print("res_c bad:", np.asarray(d.admm_residual_friction_cone)[bad])
