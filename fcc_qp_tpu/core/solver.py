"""Functional ADMM solver core: presolve + masked while-loop ADMM.

This is the TPU-native re-design of `FCCQP::Solve` / `FCCQP::DoADMM`
(`/root/reference/src/fcc_qp.cpp:57-191`). Differences from the reference
that are deliberate, hardware-driven design choices (results agree to
solver tolerance):

  * Pure functions over fixed-shape pytrees instead of a stateful class —
    warm-start state is an explicit `WarmStart` pytree threaded by the
    caller (or by `replay`'s `lax.scan`).
  * The once-per-solve LDLT factorization becomes the explicit KKT inverse
    blocks (see `fcc_qp_tpu.ops.kkt`); each ADMM iteration is then one
    batched mat-vec on the MXU plus fused elementwise projections, instead
    of a sequential triangular back-substitution.
  * Early exit: `lax.while_loop` with a per-instance `done` mask. Masked
    (frozen) updates make `vmap` semantics identical to running each
    instance serially with the reference's `break`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from fcc_qp_tpu.config import FCCQPOptions, ProblemShape
from fcc_qp_tpu.ops.kkt import admm_operator, kkt_solve
from fcc_qp_tpu.ops.projections import (
    calc_bound_violation,
    calc_friction_cone_violation,
    project_to_bounds,
    project_to_friction_cone,
)
from fcc_qp_tpu.types import (
    FCCQPDetails,
    FCCQPSolution,
    FCCQPSolveStatus,
    QPBatch,
    WarmStart,
)


class _AdmmState(NamedTuple):
    it: Array
    x: Array
    x_bar: Array
    lam_bar: Array
    mu_x: Array
    mu_lam: Array
    x_res_norm: Array
    lam_res_norm: Array
    n_iter: Array
    done: Array


def _presolve(qp: QPBatch, shape: ProblemShape) -> Array:
    """Equality-constrained QP solve for the initial guess
    (`fcc_qp.cpp:141-178`): solve [[Q, A'],[A, 0]] s = [-b; b_eq]."""
    del shape
    dtype = qp.Q.dtype
    return kkt_solve(qp.Q, qp.A_eq, jnp.zeros((), dtype), -qp.b, qp.b_eq)


def _admm(
    qp: QPBatch,
    x0: Array,
    mu_x0: Array,
    mu_lam0: Array,
    shape: ProblemShape,
    opts: FCCQPOptions,
    rho: Array,
    eps_fcone: Array,
    eps_bound: Array,
    operator=None,
):
    """Single-instance ADMM loop (`fcc_qp.cpp:57-112`), masked for vmap."""
    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    dtype = qp.Q.dtype
    zero = jnp.zeros((), dtype)

    # "Factorization": build the primal-update operator once per solve
    # (analog of the per-solve LDLT at fcc_qp.cpp:62-71). Callers that
    # time the factorization phase (FCCQP.Solve) pass the operator in so
    # it is built exactly once.
    if operator is None:
        F, x_const = admm_operator(qp.Q, qp.b, qp.A_eq, qp.b_eq, rho)
    else:
        F, x_const = operator

    def seg(v):
        return jax.lax.slice_in_dim(v, ls, ls + nc, axis=-1)

    init = _AdmmState(
        it=jnp.zeros((), jnp.int32),
        x=x0,
        x_bar=x0,
        lam_bar=seg(x0),
        mu_x=mu_x0,
        mu_lam=mu_lam0,
        x_res_norm=zero,
        lam_res_norm=zero,
        n_iter=jnp.full((), opts.max_iter, jnp.int32),
        done=jnp.zeros((), jnp.bool_),
    )

    def cond(st: _AdmmState):
        return (st.it < opts.max_iter) & ~st.done

    def body(st: _AdmmState):
        # v = slack - dual, with the contact segment using the cone pair
        # (the q_rho override at fcc_qp.cpp:81-82).
        if nc > 0:
            s = jax.lax.dynamic_update_slice_in_dim(st.x_bar, st.lam_bar, ls, -1)
            u = jax.lax.dynamic_update_slice_in_dim(st.mu_x, st.mu_lam, ls, -1)
        else:
            s, u = st.x_bar, st.mu_x
        v = s - u

        # Primal update: one mat-vec against the cached KKT inverse block
        # (== the back-substitution at fcc_qp.cpp:86-87).
        x = x_const + rho * (F @ v)

        # Slack update: fused projections (fcc_qp.cpp:90-92).
        x_bar = project_to_bounds(x + st.mu_x, qp.lb, qp.ub)
        lam_bar = project_to_friction_cone(seg(x) + st.mu_lam, qp.friction_coeffs)

        # Residuals in the infinity norm (fcc_qp.cpp:95-98).
        x_res = x - x_bar
        lam_res = seg(x) - lam_bar
        x_res_norm = jnp.max(jnp.abs(x_res)) if nv > 0 else zero
        lam_res_norm = jnp.max(jnp.abs(lam_res)) if nc > 0 else zero

        # Scaled dual ascent (fcc_qp.cpp:101-102).
        mu_x = st.mu_x + x_res
        mu_lam = st.mu_lam + lam_res

        conv = (lam_res_norm < eps_fcone) & (x_res_norm < eps_bound)
        if opts.presolve == "operator":
            # primal-increment gate: with the rho-regularized operator
            # init (instead of the reference's exact presolve,
            # fcc_qp.cpp:159-178), zero projection residual does not
            # imply the primal has finished contracting toward the
            # optimum — see core/ds_engine.py `iteration` for the full
            # rationale. Exact-presolve runs keep reference semantics.
            dx = jnp.abs(x - st.x)
            x_inc = jnp.max(dx) if nv > 0 else zero
            lam_inc = jnp.max(jnp.abs(seg(dx))) if nc > 0 else zero
            conv = conv & (x_inc < eps_bound) & (lam_inc < eps_fcone)
        n_iter = jnp.where(conv, st.it, st.n_iter)

        # Masked commit: instances already done keep their state frozen,
        # which makes vmap bit-identical to per-instance early exit.
        def commit(new, old):
            return jnp.where(st.done, old, new)

        return _AdmmState(
            it=st.it + 1,
            x=commit(x, st.x),
            x_bar=commit(x_bar, st.x_bar),
            lam_bar=commit(lam_bar, st.lam_bar),
            mu_x=commit(mu_x, st.mu_x),
            mu_lam=commit(mu_lam, st.mu_lam),
            x_res_norm=commit(x_res_norm, st.x_res_norm),
            lam_res_norm=commit(lam_res_norm, st.lam_res_norm),
            n_iter=commit(n_iter, st.n_iter),
            done=st.done | conv,
        )

    final = jax.lax.while_loop(cond, body, init)
    return final


def _details(
    x: Array,
    qp: QPBatch,
    shape: ProblemShape,
    n_iter: Array,
    x_res_norm: Array,
    lam_res_norm: Array,
    max_iter: int,
):
    nc, ls = shape.nc, shape.lambda_c_start
    lam = jax.lax.slice_in_dim(x, ls, ls + nc, axis=-1)
    dtype = x.dtype
    if qp.A_eq.shape[-2]:
        eq_viol = jnp.max(
            jnp.abs(
                jnp.einsum("...mn,...n->...m", qp.A_eq, x) - qp.b_eq
            ),
            axis=-1,
        )
    else:
        eq_viol = jnp.zeros(x.shape[:-1], dtype)
    zeros_i = jnp.zeros_like(n_iter)
    return FCCQPDetails(
        equality_viol=eq_viol,
        n_iter=n_iter,
        admm_residual_bounds=x_res_norm,
        admm_residual_friction_cone=lam_res_norm,
        solve_time=jnp.zeros((), dtype),
        factorization_time=jnp.zeros((), dtype),
        bounds_viol=calc_bound_violation(x, qp.lb, qp.ub),
        friction_cone_viol=calc_friction_cone_violation(lam, qp.friction_coeffs),
        solve_status=jnp.where(
            n_iter == max_iter,
            jnp.int32(FCCQPSolveStatus.kMaxIterations),
            jnp.int32(FCCQPSolveStatus.kSuccess),
        ),
        n_iter_f32=zeros_i,
        n_iter_ds=zeros_i,
        polish_attempts=zeros_i,
        polish_accepted=zeros_i,
    )


def solve(
    qp: QPBatch,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    warm: Optional[WarmStart] = None,
    warm_start: bool = False,
    rho: Optional[Array] = None,
    operator=None,
) -> tuple[FCCQPSolution, WarmStart]:
    """Solve one QP instance. Pure; jit/vmap/scan-compatible.

    Control-flow parity with `FCCQP::Solve` (`fcc_qp.cpp:114-191`):
      * duals reset to zero unless ``warm_start`` (`:136-139`)
      * presolve runs when ``equality_constrained or not warm_start``
        (`:159-178`), otherwise ``x`` carries over from ``warm``
      * ADMM runs unless the problem is purely equality-constrained
        (`:132-133,180-182`).

    ``warm_start`` is a static Python bool (two traces); ``rho`` may be a
    traced scalar to support penalty adaptation without retracing.
    ``operator``: optional prebuilt ``(F, x_const)`` ADMM operator from
    `ops.kkt.admm_operator` (must match ``rho``) so a timing wrapper can
    measure the factorization phase without building it twice.
    """
    dtype = qp.Q.dtype
    nv, nc = shape.num_vars, shape.nc
    if rho is None:
        rho = jnp.asarray(opts.rho, dtype)
    eps_fcone = jnp.asarray(opts.eps_fcone, dtype)
    eps_bound = jnp.asarray(opts.eps_bound, dtype)

    if warm is None:
        warm = WarmStart.zeros(shape, batch_shape=qp.batch_shape, dtype=dtype)

    if warm_start:
        mu_x0, mu_lam0 = warm.mu_x, warm.mu_lambda_c
    else:
        mu_x0 = jnp.zeros_like(warm.mu_x)
        mu_lam0 = jnp.zeros_like(warm.mu_lambda_c)

    # equality_constrained fast path is only reachable when nc == 0
    # (a static shape property), so it costs nothing otherwise.
    if nc == 0:
        eq_constrained = jnp.all(jnp.isinf(qp.lb)) & jnp.all(jnp.isinf(qp.ub))
    else:
        eq_constrained = None  # statically false

    if warm_start:
        if eq_constrained is None:
            x_init = warm.x
        else:
            x_init = jax.lax.cond(
                eq_constrained, lambda: _presolve(qp, shape), lambda: warm.x
            )
    else:
        x_init = _presolve(qp, shape)

    def run_admm(x0):
        st = _admm(
            qp, x0, mu_x0, mu_lam0, shape, opts, rho, eps_fcone,
            eps_bound, operator=operator,
        )
        return (
            st.x, st.mu_x, st.mu_lam, st.n_iter, st.x_res_norm, st.lam_res_norm,
        )

    def skip_admm(x0):
        zero = jnp.zeros((), dtype)
        return (x0, mu_x0, mu_lam0, jnp.zeros((), jnp.int32), zero, zero)

    if eq_constrained is None:
        x, mu_x, mu_lam, n_iter, xrn, lrn = run_admm(x_init)
    else:
        x, mu_x, mu_lam, n_iter, xrn, lrn = jax.lax.cond(
            eq_constrained, skip_admm, run_admm, x_init
        )

    details = _details(x, qp, shape, n_iter, xrn, lrn, opts.max_iter)
    solution = FCCQPSolution(details=details, z=x)
    new_warm = WarmStart(x=x, mu_x=mu_x, mu_lambda_c=mu_lam)
    return solution, new_warm


@partial(jax.jit, static_argnames=("shape", "opts", "warm_start"))
def _solve_batched_jit(qp, shape, opts, warm, warm_start, operator=None):
    fn = partial(solve, shape=shape, opts=opts, warm_start=warm_start)
    if operator is None:
        return jax.vmap(lambda q, w: fn(q, warm=w))(qp, warm)
    return jax.vmap(lambda q, w, op: fn(q, warm=w, operator=op))(
        qp, warm, operator
    )


@jax.jit
def _operator_batched_jit(Q, b, A_eq, b_eq, rho):
    return jax.vmap(
        lambda q_, b_, a_, e_: admm_operator(q_, b_, a_, e_, rho)
    )(Q, b, A_eq, b_eq)


def solve_batched(
    qp: QPBatch,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    warm: Optional[WarmStart] = None,
    warm_start: bool = False,
    timing: bool = True,
) -> tuple[FCCQPSolution, WarmStart]:
    """Solve a batch of independent QP instances (leading batch dim).

    The TPU-native replacement for looping `Solve` calls: one jitted
    program, batch-parallel on-chip, shardable across a mesh (see
    `fcc_qp_tpu.parallel`).

    When called eagerly with ``timing=True`` (default), the ADMM
    operator build and the solve run as two chained dispatches and
    ``details.solve_time`` / ``details.factorization_time`` carry true
    wall-clock phase spans (batch-level broadcast, reference parity
    `src/fcc_qp.cpp:67-71,120,188-190`).
    """
    dtype = qp.Q.dtype
    if warm is None:
        warm = WarmStart.zeros(shape, batch_shape=qp.batch_shape, dtype=dtype)
    if isinstance(qp.Q, jax.core.Tracer) or not timing or qp.Q.ndim != 3:
        return _solve_batched_jit(qp, shape, opts, warm, warm_start)

    import time

    from fcc_qp_tpu.utils.timing import stamp_solution_times, sync

    rho = jnp.asarray(opts.rho, dtype)
    t0 = time.perf_counter()
    operator = _operator_batched_jit(qp.Q, qp.b, qp.A_eq, qp.b_eq, rho)
    sol, ws = _solve_batched_jit(
        qp, shape, opts, warm, warm_start, operator
    )
    sync(operator)
    t1 = time.perf_counter()
    sync(sol)
    t2 = time.perf_counter()
    return stamp_solution_times(sol, t2 - t0, t1 - t0), ws


@partial(jax.jit, static_argnames=("shape", "opts"))
def replay(
    qps: QPBatch,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
) -> tuple[FCCQPSolution, WarmStart]:
    """Sequential warm-started replay of a logged QP sequence.

    The TPU-native form of the reference benchmark loop
    (`/root/reference/fcc_qp_test.py:85-89`): step 0 solves cold, then a
    `lax.scan` threads the `WarmStart` pytree through the remaining steps
    with `warm_start=True` — exactly `solver.set_warm_start(i > 0)`.

    Args:
      qps: QPBatch with a leading time dimension T (optionally extra batch
        dims after it, handled by vmap at the caller).

    Returns:
      (solutions stacked over T, final warm state).
    """
    qp0 = jax.tree.map(lambda a: a[0], qps)
    rest = jax.tree.map(lambda a: a[1:], qps)

    sol0, ws = solve(qp0, shape, opts, warm_start=False)

    def step(ws, qp):
        sol, ws = solve(qp, shape, opts, warm=ws, warm_start=True)
        return ws, sol

    ws, sols = jax.lax.scan(step, ws, rest)
    stacked = jax.tree.map(
        lambda a0, arest: jnp.concatenate([a0[None], arest], axis=0), sol0, sols
    )
    return stacked, ws
