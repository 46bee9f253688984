"""Diagnose the round-3 warm-replay iteration regression.

Runs a small-scale replay at the bench configuration (rho=0.05, eps=1e-6,
scaling+constrained+polish rounds=4) with the rounds/polish debug prints
on, and reports per-step iteration stats.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_cpu_max_isa=SSE4_2").strip()
os.environ["FCCQP_ROUNDS_DEBUG"] = "1"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fccqp_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from fcc_qp_tpu.config import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import replay_ds_streams, to_ds_batch
from fcc_qp_tpu.models.osc import MODELS, generate_osc_sequence
from fcc_qp_tpu.utils.io import stack_qp_dicts

S = 32
steps = 5
T = S * steps
model = MODELS["cassie"]
qps = generate_osc_sequence(model, T, seed=0, smoothness=0.002)
stacked = stack_qp_dicts(qps)
batch = to_ds_batch(stacked)

opts = FCCQPOptions(
    max_iter=600, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    adaptive_rho=False, presolve="operator",
    scaling=True, splitting="constrained", kkt_refine_steps=1,
    polish=True, polish_rounds=4, polish_newton_steps=4,
)

sols, _ = replay_ds_streams(batch, model.shape, opts, n_streams=S)
n = np.asarray(sols.details.n_iter).reshape(S, steps)
st = np.asarray(sols.details.solve_status).reshape(S, steps)
nf = np.asarray(sols.details.n_iter_f32).reshape(S, steps)
nd = np.asarray(sols.details.n_iter_ds).reshape(S, steps)
pa = np.asarray(sols.details.polish_attempts).reshape(S, steps)
pc = np.asarray(sols.details.polish_accepted).reshape(S, steps)
print("per-step n_iter p50:", np.median(n, axis=0))
print("per-step n_iter mean:", n.mean(axis=0))
print("per-step max:", n.max(axis=0))
print("per-step f32 p50:", np.median(nf, axis=0))
print("per-step ds p50:", np.median(nd, axis=0))
print("per-step attempts mean:", pa.mean(axis=0))
print("per-step accepted %:", 100.0 * pc.mean(axis=0))
print("statuses:", np.unique(st, return_counts=True))
warm = n[:, 1:]
print(f"warm p50={np.median(warm):.0f} mean={warm.mean():.0f} "
      f"accept%={100.0 * pc[:, 1:].mean():.1f}")
