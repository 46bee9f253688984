"""Device breakdown: per-stage cost of a warm replay step at B=4096."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import (
    to_ds_batch, constrained_indices, _scale_reduced,
)
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_sequence
from fcc_qp_tpu.ops import ds
from fcc_qp_tpu.ops.ds_linalg import (
    assemble_kkt_ds, kkt_inverse_f32_seed, kkt_inverse_f32_refresh,
    refine_inverse_columns_ds, solve_from_seed_ds,
)
from fcc_qp_tpu.ops.scaling import ruiz_scaling, apply_scaling
from fcc_qp_tpu.utils.io import stack_qp_dicts
from fcc_qp_tpu.utils.timing import sync

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
stacked = stack_qp_dicts(
    generate_osc_sequence(CASSIE, B, seed=0, smoothness=0.002)
)
qp = jax.device_put(to_ds_batch(stacked))
shape = CASSIE.shape
opts = FCCQPOptions(
    max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
)
ci = np.asarray(constrained_indices(qp, shape), np.int64)
mask = np.zeros((shape.num_vars,), np.float32)
mask[ci] = 1.0
rho = jnp.full((B,), 0.05, jnp.float32)
rho_diag = rho[None, :] * jnp.asarray(mask)[:, None]


def bench(name, fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args); sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(*args); sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f}ms", flush=True)
    return out


# baseline dispatch floor
bench("dispatch floor (tiny)", lambda x: x + 1.0, jnp.zeros((8,)))

sc = bench("ruiz_scaling(8 iters)",
           lambda q, a, b: ruiz_scaling(q, a, b, shape, iters=8),
           qp.Q.hi, qp.A_eq.hi, qp.b.hi)
qps = bench("apply_scaling", lambda q: _scale_reduced(q, shape, opts)[0], qp)

M = bench("assemble_kkt_ds",
          lambda q: assemble_kkt_ds(q.Q, q.A_eq, rho_diag), qps)
X32, _ = bench("kkt_inverse_f32_seed",
               lambda q: kkt_inverse_f32_seed(q.Q, q.A_eq, rho_diag), qps)
bench("kkt_inverse_f32_refresh(3)",
      lambda x, q: kkt_inverse_f32_refresh(x, q.Q, q.A_eq, rho_diag), X32, qps)
bench("refine_inverse_columns_ds(p=2)",
      lambda x, m: refine_inverse_columns_ds(x, m, ci, passes=2), X32, M)
r = ds.DS(jnp.concatenate([-qps.b.hi, qps.b_eq.hi]),
          jnp.concatenate([-qps.b.lo, qps.b_eq.lo]))
bench("solve_from_seed_ds(p=2)",
      lambda x, m, rr: solve_from_seed_ds(x, m, rr, passes=2), X32, M, r)

# polish pieces
from fcc_qp_tpu.ops.polish import (
    _polish_seed_f32, _seed_refresh_or_rebuild, _assemble_m2_f32,
)
m_eq = shape.num_eq
k = len(ci)
N2 = shape.num_vars + m_eq + k
rng = np.random.default_rng(0)
Mb = jnp.asarray(rng.normal(size=(B, N2, N2)).astype(np.float32))
Mb = Mb + jnp.swapaxes(Mb, -1, -2) + 3 * N2 * jnp.eye(N2)
seed = bench("polish cold seed (48 NS)", _polish_seed_f32, Mb)
bench("polish seed refresh(2)",
      lambda s, m: _seed_refresh_or_rebuild(s, m, 2), seed, Mb)
