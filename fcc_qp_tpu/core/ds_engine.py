"""Double-single batched ADMM engine — the TPU performance path.

Same algorithm and control flow as `core.batched.solve_batched_fast`
(reference semantics per `/root/reference/src/fcc_qp.cpp:57-191`, plus
the adaptive-rho/over-relaxation extensions), but all state, problem
data, and linear algebra are double-single f32 pairs in batch-last
layout (`ops/ds.py`, `ops/ds_linalg.py`). Rationale: TPU has no f64
ALU — XLA's emulated f64 costs 20-50x f32 for these shapes, while ds
delivers ~2^-48 precision at f32-class speed, comfortably resolving the
1e-6-absolute convergence tolerance on O(100)-scale WBC solutions.

Host data enters via `to_ds_batch` (numpy hi/lo split, batch moved
last); results exit as f64 when x64 is enabled (hi+lo reconstruction).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

import fcc_qp_tpu.ops.ds as ds
from fcc_qp_tpu.config import FCCQPOptions, ProblemShape
from fcc_qp_tpu.ops.ds import DS
from fcc_qp_tpu.ops.ds_linalg import (
    kkt_inverse_blocks_refined_ds,
    kkt_solve_refined_ds,
    matvec_ds,
    transpose_ds,
)
from fcc_qp_tpu.types import FCCQPDetails, FCCQPSolution, FCCQPSolveStatus


class QPBatchDS(NamedTuple):
    """QP batch in ds, batch-last: Q (n,n,B), b (n,B), A_eq (m,n,B),
    b_eq (m,B), friction_coeffs (nc/3,B), lb/ub (n,B)."""

    Q: DS
    b: DS
    A_eq: DS
    b_eq: DS
    friction_coeffs: DS
    lb: DS
    ub: DS

    @property
    def batch(self) -> int:
        return self.b.hi.shape[-1]


class WarmStartDS(NamedTuple):
    x: DS
    mu_x: DS
    mu_lambda_c: DS
    rho: Array  # (B,) f32 — persisted so adaptive rho carries over


def _split64(a: np.ndarray) -> DS:
    hi = a.astype(np.float32)
    with np.errstate(invalid="ignore"):
        lo = (a - hi.astype(np.float64)).astype(np.float32)
    # +-inf (e.g. unbounded lb/ub) splits to (inf, nan); zero the lo so
    # downstream arithmetic stays NaN-free.
    lo = np.where(np.isfinite(a), lo, 0.0).astype(np.float32)
    return DS(jnp.asarray(hi), jnp.asarray(lo))


def to_ds_batch(stacked: dict) -> QPBatchDS:
    """Host-side conversion: stacked (T/B-leading) f64 dict with the
    reference npz schema -> batch-last ds pytree.

    Uses the native C++ fused transpose+split (fcc_qp_tpu/native) when
    available; falls back to numpy."""
    try:
        from fcc_qp_tpu.native import io_native

        def conv(key):
            hi, lo = io_native.ds_split_batch_last(
                np.asarray(stacked[key], np.float64)
            )
            return DS(jnp.asarray(hi), jnp.asarray(lo))
    except Exception:
        def conv(key):
            a = np.asarray(stacked[key], np.float64)
            return _split64(np.moveaxis(a, 0, -1))

    return QPBatchDS(
        Q=conv("Q"),
        b=conv("b"),
        A_eq=conv("A_eq"),
        b_eq=conv("b_eq"),
        friction_coeffs=conv("friction_coeffs"),
        lb=conv("lb"),
        ub=conv("ub"),
    )


def project_cone_ds(f: DS, mu: DS) -> DS:
    """ds friction-cone projection, batch-last: f (nc, B), mu (nc/3, B).

    Same branchless closed form as `ops.projections.project_to_friction_cone`
    (reference `constraint_utils.cpp:5-25`), evaluated in ds so boundary
    residuals resolve below 1e-6 on O(100)-N forces.
    """
    nc, B = f.hi.shape
    if nc == 0:
        return f
    ncones = nc // 3
    f3 = DS(f.hi.reshape(ncones, 3, B), f.lo.reshape(ncones, 3, B))
    fx = DS(f3.hi[:, 0], f3.lo[:, 0])
    fy = DS(f3.hi[:, 1], f3.lo[:, 1])
    fz = DS(f3.hi[:, 2], f3.lo[:, 2])

    norm2 = ds.add(ds.mul(fx, fx), ds.mul(fy, fy))
    norm = ds.sqrt(norm2)

    mu_fz = ds.mul(mu, fz)
    inside = ds.sub(mu_fz, norm).hi >= 0
    polar = ds.add(fz, ds.mul(mu, norm)).hi < 0

    one_plus_mu2 = ds.add_f32(ds.mul(mu, mu), jnp.ones_like(mu.hi))
    t = ds.div(ds.add(ds.mul(mu, norm), fz), one_plus_mu2)
    safe_norm = ds.where(norm.hi > 0, norm, ds.from_f32(jnp.ones_like(norm.hi)))
    scale = ds.div(ds.mul(t, mu), safe_norm)

    px = ds.mul(scale, fx)
    py = ds.mul(scale, fy)
    pz = t

    zero = ds.zeros(fx.hi.shape, fx.hi.dtype)

    def sel(surf, orig):
        return ds.where(inside, orig, ds.where(polar, zero, surf))

    ox, oy, oz = sel(px, fx), sel(py, fy), sel(pz, fz)
    out_hi = jnp.stack([ox.hi, oy.hi, oz.hi], axis=1).reshape(nc, B)
    out_lo = jnp.stack([ox.lo, oy.lo, oz.lo], axis=1).reshape(nc, B)
    return DS(out_hi, out_lo)


def _set_seg(v: DS, s: DS, ls: int, nc: int) -> DS:
    if nc == 0:
        return v
    return DS(
        jax.lax.dynamic_update_slice_in_dim(v.hi, s.hi, ls, axis=0),
        jax.lax.dynamic_update_slice_in_dim(v.lo, s.lo, ls, axis=0),
    )


def _seg(v: DS, ls: int, nc: int) -> DS:
    return DS(
        jax.lax.slice_in_dim(v.hi, ls, ls + nc, axis=0),
        jax.lax.slice_in_dim(v.lo, ls, ls + nc, axis=0),
    )


class _DsState(NamedTuple):
    it: Array
    next_adapt: Array
    n_refactor: Array
    x: DS
    x_bar: DS
    lam_bar: DS
    mu_x: DS
    mu_lam: DS
    rho: Array          # (B,) f32
    Fj: DS              # j-major KKT inverse block (n, n, B)
    x_const: DS         # (n, B)
    x_res_norm: Array   # (B,) f32
    lam_res_norm: Array
    prim_norm: Array
    dual_norm: Array
    n_iter: Array
    done: Array


def _factor(qp: QPBatchDS, rho: Array):
    """Batched ds factorization -> (Fj, x_const) with Fj j-major so the
    per-iteration primal update is `x = x_const + rho * Fj @ v`.

    Uses the Newton-Schulz-refined inverse blocks: the raw Schur route
    inherits kappa(S) >> kappa(KKT) error on realistic OSC data (the
    paper's rank-deficiency discussion, `fccqp.pdf` p.6 SS5.2, is the
    same phenomenon); one NS step restores ~kappa(KKT)-level accuracy
    so the ADMM fixed point lands within the 1e-6 tolerance."""
    F, G = kkt_inverse_blocks_refined_ds(qp.Q, qp.A_eq, rho, refine_steps=1)
    Fj = transpose_ds(F)
    Fb = matvec_ds(Fj, qp.b)                  # F b   (n, B)
    Gb = matvec_ds(transpose_ds(G), qp.b_eq)  # G b_eq (n, B)
    x_const = ds.sub(Gb, Fb)
    return Fj, x_const


def solve_batched_ds(
    qp: QPBatchDS,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    warm: Optional[WarmStartDS] = None,
    warm_start: bool = False,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """ds-precision batched solve (host wrapper: jit the inner fn).

    ``use_pallas`` runs the ADMM iteration chunks in the fused Pallas
    TPU kernel (`ops/pallas_admm.py`): operator resident in VMEM,
    per-tile early exit. Requires batch % 128 == 0 and alpha == 1.0.
    ``pallas_interpret`` runs the kernel in interpreter mode (CPU
    testing).
    """
    if use_pallas:
        assert opts.alpha == 1.0, "pallas path supports alpha=1.0 only"
        assert qp.batch % 128 == 0, "pallas path requires batch % 128 == 0"
    return _solve_batched_ds_jit(
        qp, warm, shape, opts, warm_start, use_pallas, pallas_interpret
    )


@partial(
    jax.jit,
    static_argnames=("shape", "opts", "warm_start", "use_pallas", "pallas_interpret"),
)
def _solve_batched_ds_jit(
    qp, warm, shape, opts, warm_start, use_pallas=False, pallas_interpret=False
):
    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    B = qp.batch
    f32 = qp.Q.hi.dtype
    alpha = jnp.asarray(opts.alpha, f32)
    use_alpha = opts.alpha != 1.0
    eps_fcone = jnp.asarray(opts.eps_fcone, f32)
    eps_bound = jnp.asarray(opts.eps_bound, f32)

    K = opts.adaptive_rho_interval if opts.adaptive_rho else opts.max_iter
    n_chunks = -(-opts.max_iter // K)

    if warm is None:
        zero_n = ds.zeros((nv, B), f32)
        zero_c = ds.zeros((nc, B), f32)
        warm = WarmStartDS(
            x=zero_n, mu_x=zero_n, mu_lambda_c=zero_c,
            rho=jnp.full((B,), opts.rho, f32),
        )

    if warm_start:
        mu_x0, mu_lam0 = warm.mu_x, warm.mu_lambda_c
        rho0 = warm.rho
        x_init = warm.x
    else:
        mu_x0 = ds.zeros((nv, B), f32)
        mu_lam0 = ds.zeros((nc, B), f32)
        rho0 = jnp.full((B,), opts.rho, f32)
        if opts.presolve == "exact":
            x_init = kkt_solve_refined_ds(
                qp.Q, qp.A_eq, ds.neg(qp.b), qp.b_eq
            )
        else:
            x_init = None  # filled from x_const after factorization

    # equality-constrained fast path (nc == 0, all-infinite bounds)
    if nc == 0:
        eq_c = jnp.all(jnp.isinf(qp.lb.hi), axis=0) & jnp.all(
            jnp.isinf(qp.ub.hi), axis=0
        )
        if warm_start:
            x_pre = kkt_solve_refined_ds(
                qp.Q, qp.A_eq, ds.neg(qp.b), qp.b_eq
            )
            x_init = ds.where(eq_c[None, :], x_pre, x_init)
    else:
        eq_c = jnp.zeros((B,), jnp.bool_)

    Fj0, x_const0 = _factor(qp, rho0)
    if x_init is None:
        # "operator" presolve: the rho-regularized equality-QP solution
        # (the v=0 primal update) as cold-start guess — saves the
        # dedicated unregularized factorization.
        x_init = x_const0

    zeros_b = jnp.zeros((B,), f32)
    init = _DsState(
        it=jnp.int32(0),
        next_adapt=jnp.int32(K),
        n_refactor=jnp.int32(0),
        x=x_init,
        x_bar=x_init,
        lam_bar=_seg(x_init, ls, nc),
        mu_x=mu_x0,
        mu_lam=mu_lam0,
        rho=rho0,
        Fj=Fj0,
        x_const=x_const0,
        x_res_norm=zeros_b,
        lam_res_norm=zeros_b,
        prim_norm=zeros_b,
        dual_norm=zeros_b,
        n_iter=jnp.full((B,), opts.max_iter, jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
    )

    def iteration(st: _DsState) -> _DsState:
        s_prev = _set_seg(st.x_bar, st.lam_bar, ls, nc)
        u = _set_seg(st.mu_x, st.mu_lam, ls, nc)
        v = ds.sub(s_prev, u)

        y = matvec_ds(st.Fj, v)
        x = ds.add(st.x_const, ds.mul_f32(y, st.rho[None, :]))

        if use_alpha:
            x_hat = ds.add(
                ds.mul_f32(x, alpha), ds.mul_f32(s_prev, 1.0 - alpha)
            )
        else:
            x_hat = x

        x_bar = ds.clip(ds.add(x_hat, st.mu_x), qp.lb, qp.ub)
        lam_bar = project_cone_ds(
            ds.add(_seg(x_hat, ls, nc), st.mu_lam), qp.friction_coeffs
        )

        s_now = _set_seg(x_bar, lam_bar, ls, nc)
        x_res = ds.sub(x, x_bar)
        lam_res = ds.sub(_seg(x, ls, nc), lam_bar)
        x_res_norm = jnp.max(jnp.abs(x_res.hi), axis=0) if nv else zeros_b
        lam_res_norm = jnp.max(jnp.abs(lam_res.hi), axis=0) if nc else zeros_b

        mu_x = ds.add(st.mu_x, ds.sub(x_hat, x_bar))
        mu_lam = ds.add(st.mu_lam, ds.sub(_seg(x_hat, ls, nc), lam_bar))

        dprim = ds.sub(x, s_now).hi
        dchange = ds.sub(s_now, s_prev).hi
        prim_norm = jnp.sqrt(jnp.sum(dprim * dprim, axis=0))
        dual_norm = st.rho * jnp.sqrt(jnp.sum(dchange * dchange, axis=0))

        conv = (lam_res_norm < eps_fcone) & (x_res_norm < eps_bound)
        active = ~st.done & (st.it < opts.max_iter)
        n_iter = jnp.where(conv & active, st.it, st.n_iter)

        def commit_ds(new: DS, old: DS) -> DS:
            return ds.where(active[None, :], new, old)

        def commit(new, old):
            return jnp.where(active, new, old)

        return st._replace(
            it=st.it + 1,
            x=commit_ds(x, st.x),
            x_bar=commit_ds(x_bar, st.x_bar),
            lam_bar=commit_ds(lam_bar, st.lam_bar),
            mu_x=commit_ds(mu_x, st.mu_x),
            mu_lam=commit_ds(mu_lam, st.mu_lam),
            x_res_norm=commit(x_res_norm, st.x_res_norm),
            lam_res_norm=commit(lam_res_norm, st.lam_res_norm),
            prim_norm=commit(prim_norm, st.prim_norm),
            dual_norm=commit(dual_norm, st.dual_norm),
            n_iter=n_iter,
            done=st.done | conv,
        )

    def adapt(st: _DsState) -> _DsState:
        due = (st.it >= st.next_adapt) & (
            st.n_refactor < opts.adaptive_rho_max_adaptations
        )
        tol = opts.adaptive_rho_tolerance
        safe = due & (st.prim_norm > 1e-30) & (st.dual_norm > 1e-30) & ~st.done
        ratio = jnp.sqrt(st.prim_norm / jnp.maximum(st.dual_norm, 1e-30))
        trigger = safe & ((ratio > tol) | (ratio < 1.0 / tol))
        new_rho = jnp.where(
            trigger,
            jnp.clip(st.rho * ratio, opts.rho_min, opts.rho_max),
            st.rho,
        )
        changed_mask = new_rho != st.rho
        changed = jnp.any(changed_mask)

        scale = jnp.where(changed_mask, st.rho / new_rho, 1.0)
        mu_x = ds.mul_f32(st.mu_x, scale[None, :])
        mu_lam = ds.mul_f32(st.mu_lam, scale[None, :]) if nc else st.mu_lam

        def refactor(_):
            Fj, x_const = _factor(qp, new_rho)
            return Fj, x_const, st.n_refactor + 1

        Fj, x_const, n_refactor = jax.lax.cond(
            changed,
            refactor,
            lambda _: (st.Fj, st.x_const, st.n_refactor),
            operand=None,
        )
        next_adapt = jnp.where(due, 2 * st.next_adapt, st.next_adapt)
        return st._replace(
            rho=new_rho, Fj=Fj, x_const=x_const, mu_x=mu_x, mu_lam=mu_lam,
            next_adapt=next_adapt, n_refactor=n_refactor,
        )

    def chunk_body_xla(st: _DsState) -> _DsState:
        st = jax.lax.fori_loop(0, K, lambda _, s: iteration(s), st)
        if opts.adaptive_rho:
            st = adapt(st)
        return st

    def chunk_body_pallas(st: _DsState) -> _DsState:
        from fcc_qp_tpu.ops.pallas_admm import admm_chunk_pallas

        (x, x_bar, lam_bar, mu_x, mu_lam, done, n_iter,
         xrn, lrn, prim, dual) = admm_chunk_pallas(
            st.Fj, st.x_const, qp.lb, qp.ub, qp.friction_coeffs,
            st.rho, eps_bound, eps_fcone,
            st.x, st.x_bar, st.lam_bar, st.mu_x, st.mu_lam,
            st.done, st.n_iter, st.it,
            shape=shape, K=K, max_iter=opts.max_iter,
            interpret=pallas_interpret,
        )
        st = st._replace(
            it=st.it + K,
            x=x, x_bar=x_bar, lam_bar=lam_bar, mu_x=mu_x, mu_lam=mu_lam,
            x_res_norm=xrn, lam_res_norm=lrn, prim_norm=prim,
            dual_norm=dual, n_iter=n_iter, done=done,
        )
        if opts.adaptive_rho:
            st = adapt(st)
        return st

    chunk_body = chunk_body_pallas if use_pallas else chunk_body_xla

    def chunk_cond(st: _DsState):
        return (st.it < n_chunks * K) & ~jnp.all(st.done)

    st = jax.lax.while_loop(chunk_cond, chunk_body, init)

    x = ds.where(eq_c[None, :], x_init, st.x)
    n_iter = jnp.where(eq_c, 0, st.n_iter)
    xrn = jnp.where(eq_c, zeros_b, st.x_res_norm)
    lrn = jnp.where(eq_c, zeros_b, st.lam_res_norm)

    # violations (reported in f32 from hi parts; reference metrics
    # calc_bound_violation / calc_friction_cone_violation)
    xh = x.hi
    d = xh - jnp.clip(xh, qp.lb.hi, qp.ub.hi)
    bounds_viol = jnp.sqrt(jnp.sum(d * d, axis=0))
    if nc:
        lam = jax.lax.slice_in_dim(xh, ls, ls + nc, axis=0)
        f3 = lam.reshape(nc // 3, 3, B)
        nxy = jnp.sqrt(f3[:, 0] ** 2 + f3[:, 1] ** 2)
        fcone_viol = jnp.sum(
            jnp.maximum(0.0, nxy - qp.friction_coeffs.hi * f3[:, 2]), axis=0
        )
    else:
        fcone_viol = zeros_b

    # batch-leading outputs; z reconstructed to f64 when x64 is on
    z = jnp.swapaxes(ds.to_f64(x), 0, 1)
    details = FCCQPDetails(
        n_iter=n_iter,
        admm_residual_bounds=xrn,
        admm_residual_friction_cone=lrn,
        solve_time=zeros_b,
        factorization_time=zeros_b,
        bounds_viol=bounds_viol,
        friction_cone_viol=fcone_viol,
        solve_status=jnp.where(
            n_iter == opts.max_iter,
            jnp.int32(FCCQPSolveStatus.kMaxIterations),
            jnp.int32(FCCQPSolveStatus.kSuccess),
        ),
    )
    sol = FCCQPSolution(details=details, z=z)
    new_warm = WarmStartDS(
        x=x,
        mu_x=ds.where(eq_c[None, :], mu_x0, st.mu_x),
        mu_lambda_c=st.mu_lam,
        rho=st.rho,
    )
    return sol, new_warm


def replay_ds(
    qps: QPBatchDS,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    use_pallas: bool = False,
):
    """Sequential warm-started replay in ds precision.

    The ds analog of `core.solver.replay` (reference loop,
    `fcc_qp_test.py:85-89`): step 0 cold, then `lax.scan` threads the
    `WarmStartDS` pytree with ``warm_start=True``. `qps` axes are
    (..., T): time is the TRAILING axis in batch-last layout; each scan
    step slices one instance as a batch of 1... for throughput prefer
    `solve_batched_ds`; this exists for control-loop-faithful replay
    semantics and latency measurement.
    """
    T = qps.batch

    def index_t(tree: QPBatchDS, t) -> QPBatchDS:
        return jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, t, 1, axis=a.ndim - 1),
            tree,
        )

    qp0 = index_t(qps, 0)
    sol0, ws = solve_batched_ds(qp0, shape, opts, warm_start=False)

    @partial(jax.jit, static_argnames=())
    def step(ws, t):
        qp = index_t(qps, t)
        sol, ws = solve_batched_ds(
            qp, shape, opts, warm=ws, warm_start=True,
            use_pallas=use_pallas,
        )
        return ws, sol

    ws, sols = jax.lax.scan(step, ws, jnp.arange(1, T))
    stacked = jax.tree.map(
        lambda a0, arest: jnp.concatenate(
            [a0[None] if a0.ndim + 1 == arest.ndim else a0, arest], axis=0
        ),
        sol0,
        sols,
    )
    return stacked, ws
