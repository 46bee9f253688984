import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=SSE4_2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_sequence
from fcc_qp_tpu.utils.io import stack_qp_dicts

stacked = stack_qp_dicts(generate_osc_sequence(CASSIE, 32, seed=0))
b = to_ds_batch(stacked)
opts = FCCQPOptions(max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
                    presolve='operator', scaling=True, splitting='constrained',
                    kkt_refine_steps=1, polish=True, polish_rounds=4,
                    polish_newton_steps=4)
sol, ws = solve_batched_ds(b, CASSIE.shape, opts)
n = np.asarray(sol.details.n_iter); st = np.asarray(sol.details.solve_status)
print(f'conv={(st==0).mean()*100:.0f}% p50={np.median(n):.0f} '
      f'p90={np.percentile(n,90):.0f} max={n.max()}')
assert (st == 0).all()
print('SANITY OK')
