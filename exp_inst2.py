"""Microscope on quadruped instance 2/5: why does the PDAS polish
reject it (and the ds endgame converge slowly)?"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_cpu_max_isa=SSE4_2"
os.environ["FCCQP_POLISH_DEBUG"] = "1"

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
keep = [2, 5]
qps = [qps[i] for i in keep]
stacked = stack_qp_dicts(qps)
bds = to_ds_batch(stacked)

opts = FCCQPOptions(
    max_iter=2000, rho=1.0, eps_fcone=1e-6, eps_bound=1e-6,
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
print("res_b:", np.asarray(d.admm_residual_bounds))
print("res_c:", np.asarray(d.admm_residual_friction_cone))

# oracle: solve in f64 numpy and report the active set
import sys
sys.path.insert(0, "tests")
from oracle import OracleFCCQP

sh = QUADRUPED.shape
for i in range(len(keep)):
    ora = OracleFCCQP(sh.num_vars, sh.num_eq, sh.nc, sh.lambda_c_start)
    ora.max_iter, ora.rho = 20000, 1.0
    ora.eps_fcone, ora.eps_bound = 1e-8, 1e-8
    r = ora.solve(**{k: np.asarray(v[i]) for k, v in stacked.items()})
    z = r["z"]
    lb, ub = np.asarray(stacked["lb"][i]), np.asarray(stacked["ub"][i])
    fin = np.isfinite(lb) | np.isfinite(ub)
    at_lb = np.where(np.isfinite(lb) & (z - lb < 1e-6))[0]
    at_ub = np.where(np.isfinite(ub) & (ub - z < 1e-6))[0]
    near_lb = np.where(np.isfinite(lb) & (z - lb < 1e-2) & (z - lb >= 1e-6))[0]
    near_ub = np.where(np.isfinite(ub) & (ub - z < 1e-2) & (ub - z >= 1e-6))[0]
    nc3 = sh.nc // 3
    lam = z[sh.lambda_c_start:sh.lambda_c_start + sh.nc].reshape(nc3, 3)
    mu_c = np.asarray(stacked["friction_coeffs"][i])
    nxy = np.hypot(lam[:, 0], lam[:, 1])
    margin = mu_c * lam[:, 2] - nxy
    print(f"inst {keep[i]}: oracle n_iter={r['n_iter']} "
          f"at_lb={at_lb} at_ub={at_ub} near_lb={near_lb} near_ub={near_ub}")
    print(f"  cone margins={margin} fz={lam[:, 2]}")
    print(f"  z_solver_diff={np.abs(np.asarray(sol.z)[i] - z).max():.2e}")
