"""Compare isolated polish_reduced vs the integrated warm step (CPU)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_cpu_max_isa=SSE4_2"
os.environ["FCCQP_POLISH_DEBUG"] = "1"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fccqp_xla_cache")

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import (
    _gather0, _prepare_reduced_jit, _solve_ds_reduced_jit,
    constrained_indices, to_ds_batch,
)
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_sequence
from fcc_qp_tpu.ops.polish import polish_reduced
from fcc_qp_tpu.utils.io import stack_qp_dicts

B = 32
stacked = stack_qp_dicts(
    generate_osc_sequence(CASSIE, 2 * B, seed=0, smoothness=0.002)
)
qp_all = to_ds_batch(stacked)
step0 = jax.tree.map(lambda a: a[..., :B], qp_all)
step1 = jax.tree.map(lambda a: a[..., B:], qp_all)
shape = CASSIE.shape
opts = FCCQPOptions(
    max_iter=600, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    kkt_refine_steps=1, polish=True, polish_rounds=4,
    polish_newton_steps=4,
)
con_idx = constrained_indices(step0, shape)
ci_np = np.asarray(con_idx, np.int64)
kb_ = len(con_idx) - shape.nc

sol0, ws, cache = _solve_ds_reduced_jit(
    step0, None, shape, opts, False, con_idx, cache=None, with_cache=True
)
print("cold accept:", np.asarray(sol0.details.polish_accepted).mean())

sol1, ws1, cache1 = _solve_ds_reduced_jit(
    step1, ws, shape, opts, True, con_idx, cache=cache, with_cache=True
)
print("warm integrated accept:",
      np.asarray(sol1.details.polish_accepted).mean(),
      "n_iter p50:", np.median(np.asarray(sol1.details.n_iter)))

print("--- isolated ---")
prep1 = _prepare_reduced_jit(
    step1, ws, shape, opts, True, con_idx, kkt_seed=cache.kkt_seed
)
qps1 = prep1.qps
wk1 = prep1.d[ci_np]
lbc1 = _gather0(qps1.lb, ci_np[:kb_])
ubc1 = _gather0(qps1.ub, ci_np[:kb_])
xc0 = _gather0(prep1.x_init, ci_np)
p = polish_reduced(
    qps1, shape, ci_np, kb_, xc0, prep1.mu0, prep1.rho0, wk1, lbc1,
    ubc1, prep1.e, opts.eps_bound, opts.eps_fcone, opts.polish_act_tol,
    4, seed=cache.polish_seed, init_class=cache.polish_cls,
)
print("isolated accept:", np.asarray(p.accept).mean())
print("isolated x_res:", np.asarray(p.x_res)[:6])
print("isolated lam_res:", np.asarray(p.lam_res)[:6])
