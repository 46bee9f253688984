"""Device grid: replay throughput vs polish config at S streams x steps."""
import sys
import time

import numpy as np
import jax

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import replay_ds_streams, to_ds_batch
from fcc_qp_tpu.models.osc import MODELS, generate_osc_sequence
from fcc_qp_tpu.utils.io import stack_qp_dicts
from fcc_qp_tpu.utils.timing import sync

S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
T = S * steps
model = MODELS["cassie"]

stacked = stack_qp_dicts(
    generate_osc_sequence(model, T, seed=0, smoothness=0.002)
)
reps = jax.device_put(to_ds_batch(stacked))
base = FCCQPOptions(
    max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    kkt_refine_steps=1,
)
use_pallas = S % 128 == 0

import os
_names = os.environ.get("GRID", "nopolish,r1n4,r2n4").split(",")
_all = {
    "nopolish": base.replace(polish=False, phase1_tol=1e-2),
    "r1n1": base.replace(polish=True, polish_rounds=1, polish_newton_steps=1),
    "r1n4": base.replace(polish=True, polish_rounds=1, polish_newton_steps=4),
    "r2n4": base.replace(polish=True, polish_rounds=2, polish_newton_steps=4),
    "r4n4": base.replace(polish=True, polish_rounds=4, polish_newton_steps=4),
    "r2n4i32": base.replace(polish=True, polish_rounds=2,
                            polish_newton_steps=4, polish_interval=32),
}
CONFIGS = [(n, _all[n]) for n in _names]

for name, opts in CONFIGS:
    t0 = time.perf_counter()
    sols, _ = replay_ds_streams(reps, model.shape, opts, n_streams=S,
                                use_pallas=use_pallas)
    sync(sols)
    tc = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        sols, _ = replay_ds_streams(reps, model.shape, opts, n_streams=S,
                                    use_pallas=use_pallas)
        sync(sols)
        times.append(time.perf_counter() - t0)
    t = min(times)
    n = np.asarray(sols.details.n_iter).reshape(S, steps)
    st = np.asarray(sols.details.solve_status)
    warm = n[:, 1:]
    print(f"[{name}] {t*1e3:.0f}ms -> {T/t:.0f}/s (compile {tc:.0f}s) "
          f"conv={(st==0).mean()*100:.1f}% warm p50={np.median(warm):.0f} "
          f"p99={np.percentile(warm,99):.0f} max={warm.max()}",
          flush=True)
