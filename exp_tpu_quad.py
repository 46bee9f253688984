"""TPU-side cold Cassie B=128 at the tpu_pallas_worker config: which
instances fail on hardware (they all converge on CPU)?"""

import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("FCCQP_XLA_CACHE", "/tmp/fccqp_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
from fcc_qp_tpu.models.osc import QUADRUPED, generate_osc_batch
from fcc_qp_tpu.utils.io import stack_qp_dicts

print("device:", jax.devices()[0])
bds = jax.device_put(
    to_ds_batch(stack_qp_dicts(generate_osc_batch(QUADRUPED, 4096, seed=0)))
)
opts = FCCQPOptions(
    max_iter=2000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    polish=True, polish_rounds=4, polish_newton_steps=6,
)

opts = opts.replace(polish_newton_steps=6)
configs = [("flagship", opts)]
import time
from fcc_qp_tpu.utils.timing import sync
for name, o in configs:
    sol, _ = solve_batched_ds(
        bds, QUADRUPED.shape, o, use_pallas=True, timing=False
    )
    sync(sol.details.n_iter)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sol, _ = solve_batched_ds(
            bds, QUADRUPED.shape, o, use_pallas=True, timing=False
        )
        sync(sol.details.n_iter)
        ts.append(time.perf_counter() - t0)
    print(f"[{name}] time={min(ts)*1e3:.1f}ms")
    sol, _ = solve_batched_ds(
        bds, QUADRUPED.shape, o, use_pallas=True, timing=False
    )
    d = sol.details
    st = np.asarray(d.solve_status)
    bad = np.where(st != 0)[0]
    n = np.asarray(d.n_iter)
    print(f"[{name}] n_bad={len(bad)} idx={bad[:16]} "
          f"p50={np.median(n):.0f} max={n.max()}")
    if len(bad):
        print(f"  f32={np.asarray(d.n_iter_f32)[bad][:8]} "
              f"ds={np.asarray(d.n_iter_ds)[bad][:8]} "
              f"att={np.asarray(d.polish_attempts)[bad][:8]} "
              f"acc={np.asarray(d.polish_accepted)[bad][:8]}")
        print(f"  res_b={np.asarray(d.admm_residual_bounds)[bad][:8]}")
        print(f"  res_c={np.asarray(d.admm_residual_friction_cone)[bad][:8]}")
        print(f"  eq={np.asarray(d.equality_viol)[bad][:8]}")
    acc = np.asarray(d.polish_accepted)
    print(f"  accept%={100.0 * acc.mean():.1f}")
