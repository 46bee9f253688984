"""Round-4 warm-step cost breakdown on the real chip.

The warm replay step is now ~1 polish solve (p50 iterations = 0) but
throughput dropped vs r3 — so the fixed per-step machinery dominates.
This times each jitted stage of a warm step at B=4096 to find it.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fccqp_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import (
    OperatorCache,
    _prepare_reduced_jit,
    _solve_ds_reduced_jit,
    constrained_indices,
    to_ds_batch,
)
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_sequence
from fcc_qp_tpu.ops.ds_linalg import (
    kkt_inverse_f32_refresh,
    matvec_ds,
)
from fcc_qp_tpu.ops.polish import _ns_refresh_guarded, _polish_seed_f32
from fcc_qp_tpu.utils.io import stack_qp_dicts
from fcc_qp_tpu.utils.timing import sync

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
stacked = stack_qp_dicts(
    generate_osc_sequence(CASSIE, B + 1, seed=0, smoothness=0.002)
)
qp_all = jax.device_put(to_ds_batch(stacked))
# TRUE warm pairing: instance i solves timestep i cold, then timestep
# i+1 warm (0.2% drift) — overlapping slices, like the replay streams
step0 = jax.tree.map(lambda a: a[..., :B], qp_all)
step1 = jax.tree.map(lambda a: a[..., 1:B + 1], qp_all)
shape = CASSIE.shape
opts = FCCQPOptions(
    max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    kkt_refine_steps=1, polish=True, polish_rounds=4,
    polish_newton_steps=4,
)
con_idx = constrained_indices(step0, shape)
print(f"B={B} device={jax.devices()[0]}", flush=True)


def bench(name, fn, reps=3):
    out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


# cold step -> warm state + cache
sol0, ws, cache = bench(
    "cold solve (with cache)",
    lambda: _solve_ds_reduced_jit(
        step0, None, shape, opts, False, con_idx, cache=None,
        with_cache=True,
    ),
)

# full warm step
bench(
    "warm step (full)",
    lambda: _solve_ds_reduced_jit(
        step1, ws, shape, opts, True, con_idx, cache=cache,
        with_cache=True,
    ),
)

# warm prepare stage only (kkt refresh + scaling + gather)
bench(
    "warm prepare stage",
    lambda: _prepare_reduced_jit(
        step1, ws, shape, opts, True, con_idx,
        kkt_seed=cache.kkt_seed,
    ),
)

# PDAS-loop ablation: newton_steps=1
o1 = opts.replace(polish_newton_steps=1)
_solve_ds_reduced_jit(
    step0, None, shape, o1, False, con_idx, cache=None, with_cache=True
)  # compile cold for cache types
bench(
    "warm step (newton_steps=1)",
    lambda: _solve_ds_reduced_jit(
        step1, ws, shape, o1, True, con_idx, cache=cache,
        with_cache=True,
    ),
)

# rounds ablation
o2 = opts.replace(polish_rounds=1)
bench(
    "warm step (rounds=1)",
    lambda: _solve_ds_reduced_jit(
        step1, ws, shape, o2, True, con_idx, cache=cache,
        with_cache=True,
    ),
)

# no polish at all (plain two-phase + endgame)
o3 = opts.replace(polish=False, phase1_tol=1e-2)
bench(
    "warm step (no polish)",
    lambda: _solve_ds_reduced_jit(
        step1, ws, shape, o3, True, con_idx, cache=None,
    ),
)

# micro: building blocks
from fcc_qp_tpu.core.ds_engine import _scale_reduced

qps_s, sc = _scale_reduced(step1, shape, opts)
rho_diag = jnp.full((B,), 0.05, jnp.float32)

refresh_j = jax.jit(
    lambda X, Q, A: kkt_inverse_f32_refresh(X, Q, A, rho_diag)
)
bench(
    "kkt_inverse_f32_refresh (3 NS)",
    lambda: refresh_j(cache.kkt_seed, qps_s.Q, qps_s.A_eq),
)

Mb = jnp.swapaxes(jnp.moveaxis(
    jnp.zeros((102, 102, B), jnp.float32), -1, 0), 1, 2)
seed = cache.polish_seed
guard_j = jax.jit(lambda s, M: _ns_refresh_guarded(s, M, 2))
bench("_ns_refresh_guarded (2 steps)", lambda: guard_j(seed, seed))

seedb_j = jax.jit(_polish_seed_f32)
bench("_polish_seed_f32 (48 NS cold)", lambda: seedb_j(seed))

mv_j = jax.jit(lambda F, v: matvec_ds(F, v))
bench(
    "matvec_ds (60x60xB fori chain)",
    lambda: mv_j(qps_s.Q, qps_s.b),
)

# --- isolate attempt0: polish_reduced alone on the warm state ---
from functools import partial as _partial

import fcc_qp_tpu.ops.ds as _ds
from fcc_qp_tpu.core.ds_engine import _gather0, _prepare_reduced
from fcc_qp_tpu.ops.polish import polish_reduced

ci_np = np.asarray(con_idx, np.int64)
kb_ = len(con_idx) - shape.nc

prep1 = _prepare_reduced_jit(
    step1, ws, shape, opts, True, con_idx, kkt_seed=cache.kkt_seed
)
qps1 = prep1.qps
d1 = prep1.d
wk1 = d1[ci_np]
lbc1 = _gather0(qps1.lb, ci_np[:kb_])
ubc1 = _gather0(qps1.ub, ci_np[:kb_])
xc0 = _gather0(prep1.x_init, ci_np)
mu0 = prep1.mu0


def attempt0(ns):
    @jax.jit
    def f(qps_, xc0_, mu0_, rho_, wk_, lbc_, ubc_, e_, seed_, cls_):
        return polish_reduced(
            qps_, shape, ci_np, kb_, xc0_, mu0_, rho_, wk_, lbc_, ubc_,
            e_, opts.eps_bound, opts.eps_fcone, opts.polish_act_tol,
            ns, seed=seed_, init_class=cls_,
        )

    return lambda: f(qps1, xc0, mu0, prep1.rho0, wk1, lbc1, ubc1,
                     prep1.e, cache.polish_seed, cache.polish_cls)


for ns in (1, 2, 4):
    try:
        bench(f"polish_reduced warm ns={ns}", attempt0(ns))
    except Exception as e:
        print(f"polish_reduced warm ns={ns}: FAILED {type(e).__name__}")

# prepare WITHOUT the kkt refresh (cold-build compare)
bench(
    "prepare (no carried seed)",
    lambda: _prepare_reduced_jit(step1, ws, shape, opts, True, con_idx),
)

# acceptance-vs-steps distribution on warm data
for ns in (1, 2, 3, 4):
    try:
        p = attempt0(ns)()
        sync(p.accept)
        acc = float(np.asarray(p.accept).mean())
        sc_ = np.asarray(p.x_res)
        print(f"ns={ns}: accept={acc*100:.2f}%")
    except Exception as e:
        print(f"ns={ns}: FAILED {type(e).__name__}")
