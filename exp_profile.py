"""Round-3 perf investigation: where does warm-replay time go?

Measures, on the real chip:
  1. per-step iteration distribution (p50 / p90 / max) -> straggler cost
  2. factorization-phase vs iteration-phase wall time for a warm step
  3. end-to-end replay throughput at a small scale
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import (
    replay_ds_streams, solve_batched_ds, to_ds_batch,
    constrained_indices, _prepare_reduced_jit, _iterate_reduced_jit,
)
from fcc_qp_tpu.models.osc import MODELS, generate_osc_sequence
from fcc_qp_tpu.utils.io import stack_qp_dicts
from fcc_qp_tpu.utils.timing import sync

S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
T = S * steps
model = MODELS["cassie"]

t0 = time.perf_counter()
qps = generate_osc_sequence(model, T, seed=0, smoothness=0.002)
stacked = stack_qp_dicts(qps)
print(f"gen {T} QPs: {time.perf_counter()-t0:.1f}s", flush=True)

reps = jax.device_put(to_ds_batch(stacked))
opts = FCCQPOptions(
    max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    kkt_refine_steps=1, polish=True, polish_rounds=4,
    polish_newton_steps=4,
)
use_pallas = S % 128 == 0

t0 = time.perf_counter()
sols, _ = replay_ds_streams(reps, model.shape, opts, n_streams=S,
                            use_pallas=use_pallas)
sync(sols)
print(f"replay compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

for rep in range(2):
    t0 = time.perf_counter()
    sols, _ = replay_ds_streams(reps, model.shape, opts, n_streams=S,
                                use_pallas=use_pallas)
    sync(sols)
    t = time.perf_counter() - t0
    print(f"replay run: {t*1e3:.1f}ms -> {T/t:.0f} solves/s", flush=True)

n = np.asarray(sols.details.n_iter).reshape(S, steps)
st = np.asarray(sols.details.solve_status).reshape(S, steps)
print(f"converged: {(st==0).mean()*100:.1f}%")
for t_ in range(steps):
    col = n[:, t_]
    print(f"  step {t_}: iters p50={np.median(col):.0f} "
          f"p90={np.percentile(col,90):.0f} p99={np.percentile(col,99):.0f} "
          f"max={col.max()}")

# --- phase split on a warm step: prepare (factor) vs iterate ---
con_idx = constrained_indices(reps, model.shape)
step0 = {k: np.asarray(v[:S]) for k, v in stacked.items()}
step1 = {k: np.asarray(v[S:2*S]) for k, v in stacked.items()}
b0 = jax.device_put(to_ds_batch(step0))
b1 = jax.device_put(to_ds_batch(step1))
_, ws = solve_batched_ds(b0, model.shape, opts, con_idx=con_idx,
                         use_pallas=use_pallas, timing=False)
sync(ws)

prep = _prepare_reduced_jit(b1, ws, model.shape, opts, True, con_idx)
sync(prep)
t0 = time.perf_counter()
prep = _prepare_reduced_jit(b1, ws, model.shape, opts, True, con_idx)
sync(prep)
t_prep = time.perf_counter() - t0

sol, _ = _iterate_reduced_jit(b1, prep, model.shape, opts, con_idx,
                              use_pallas, False)
sync(sol)
t0 = time.perf_counter()
sol, _ = _iterate_reduced_jit(b1, prep, model.shape, opts, con_idx,
                              use_pallas, False)
sync(sol)
t_iter = time.perf_counter() - t0
ni = np.asarray(sol.details.n_iter)
print(f"warm step phase split: prepare={t_prep*1e3:.1f}ms "
      f"iterate={t_iter*1e3:.1f}ms  (iters p50={np.median(ni):.0f} "
      f"max={ni.max()})")
