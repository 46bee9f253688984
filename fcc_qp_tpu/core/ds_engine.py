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

import os
import time
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
    assemble_kkt_ds,
    kkt_inverse_blocks_refined_ds,
    kkt_inverse_f32_refresh,
    kkt_inverse_f32_seed,
    kkt_solve_refined_ds,
    matvec_ds,
    refine_inverse_columns_ds,
    solve_from_seed_ds,
    transpose_ds,
)
from fcc_qp_tpu.ops.scaling import (
    apply_scaling,
    identity_scaling,
    ruiz_scaling,
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


class OperatorCache(NamedTuple):
    """Carried f32 operator seeds for sequential (replay) solves.

    A control-rate replay changes the QP data ~0.1%/step, so the
    expensive seed builds — the Schur KKT inverse
    (`ops.ds_linalg.kkt_inverse_f32_seed`, two SPD NS inversions) and
    the polish KKT inverse (`ops.polish._polish_seed_f32`, ~48 NS
    iterations) — are replaced by a few guarded Newton-Schulz refresh
    steps against the new step's data. Purely an accelerator: every
    refreshed seed is residual-checked and falls back to the cold build
    per instance, so results are identical up to the (checked)
    convergence tolerance.
    """

    kkt_seed: Optional[Array] = None     # (N, N, B) f32
    polish_seed: Optional[Array] = None  # (B, N2, N2) f32
    # packed active-set classification the polish seed was last
    # refreshed against (`ops.polish.pack_classification`); passed as
    # the next step's round-1 classification so the carried seed and
    # the assembled KKT rows always match (a fresh inflated
    # re-classification flips near-boundary rows every step, which
    # defeats the Newton-Schulz seed refresh)
    polish_cls: Optional[Array] = None   # (2*kb + 2*ncones, B) bool
    # carried Ruiz scale factors: scaling is an exact power-of-two
    # change of variables, so the previous step's factors equilibrate
    # 0.1%-drifted data just as well — reusing them both skips the
    # per-step Ruiz sweeps AND keeps the scaled KKT (and with it every
    # carried inverse seed) from jumping when a re-computed factor
    # crosses a power-of-two boundary
    scales: Optional[tuple] = None       # ops.scaling.Scaling


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


def _factor(qp: QPBatchDS, rho: Array, refine_steps: int = 1):
    """Batched ds factorization -> (Fj, x_const) with Fj j-major so the
    per-iteration primal update is `x = x_const + rho * Fj @ v`.

    Uses the Newton-Schulz-refined inverse blocks: the raw Schur route
    inherits kappa(S) >> kappa(KKT) error on realistic OSC data (the
    paper's rank-deficiency discussion, `fccqp.pdf` p.6 SS5.2, is the
    same phenomenon); one NS step restores ~kappa(KKT)-level accuracy
    so the ADMM fixed point lands within the 1e-6 tolerance."""
    F, G = kkt_inverse_blocks_refined_ds(
        qp.Q, qp.A_eq, rho, refine_steps=refine_steps
    )
    Fj = transpose_ds(F)
    Fb = matvec_ds(Fj, qp.b)                  # F b   (n, B)
    Gb = matvec_ds(transpose_ds(G), qp.b_eq)  # G b_eq (n, B)
    x_const = ds.sub(Gb, Fb)
    return Fj, x_const


def _gather0(x: DS, idx: np.ndarray) -> DS:
    return DS(x.hi[idx], x.lo[idx])


def _factor_reduced(
    qp: QPBatchDS, rho: Array, ci: np.ndarray, mask: np.ndarray,
    refine_steps: int,
):
    """Partial-splitting factorization: KKT with rho only on the
    constrained coordinates (`ci`), gathered for the reduced hot loop.

    Returns (Fcc, xc_const, Fcolj, x_const):
      Fcc    (k, k, B) — the hot-loop operator, j-major (F symmetric);
      xc_const (k, B)  — constrained rows of the constant term;
      Fcolj  (k, n, B) — constrained rows of F for final full-x
                         recovery (j-major over k);
      x_const (n, B).
    """
    B = qp.batch
    rho_diag = rho[None, :] * jnp.asarray(mask, qp.Q.hi.dtype)[:, None]
    F, G = kkt_inverse_blocks_refined_ds(
        qp.Q, qp.A_eq, rho_diag, refine_steps=refine_steps
    )
    Fb = matvec_ds(transpose_ds(F), qp.b)
    Gb = matvec_ds(transpose_ds(G), qp.b_eq)
    x_const = ds.sub(Gb, Fb)
    Fcolj = _gather0(F, ci)                    # rows ci: (k, n, B)
    Fcc = DS(Fcolj.hi[:, ci], Fcolj.lo[:, ci])  # (k, k, B)
    xc_const = _gather0(x_const, ci)
    return Fcc, xc_const, Fcolj, x_const


def _factor_reduced_hybrid(
    qp: QPBatchDS, rho: Array, ci: np.ndarray, mask: np.ndarray,
    passes: int, kkt_seed: Optional[Array] = None,
):
    """Hybrid factorization for the reduced hot loop: f32 XLA Schur
    inverse seed (batched Cholesky + MXU matmuls,
    `ops.ds_linalg.kkt_inverse_f32_seed`) + thin ds Newton-Schulz
    refinement of ONLY the needed inverse columns and the constant term
    — same outputs as `_factor_reduced` at a fraction of the latency
    (the all-ds Schur route is bound by O(n^2) sequential fori steps).

    ``kkt_seed``: optional carried f32 inverse from the previous replay
    step (`OperatorCache.kkt_seed`); when given, the Schur seed build
    is replaced by a guarded NS refresh against the current KKT.
    Returns ``(Fcc, xc_const, Fcolj, x_const, X32)``.
    """
    n = qp.Q.hi.shape[0]
    rho_diag = rho[None, :] * jnp.asarray(mask, qp.Q.hi.dtype)[:, None]
    M = assemble_kkt_ds(qp.Q, qp.A_eq, rho_diag)
    with jax.default_matmul_precision("highest"):
        if kkt_seed is None:
            X32, seed_res = kkt_inverse_f32_seed(qp.Q, qp.A_eq, rho_diag)
        else:
            X32, seed_res = kkt_inverse_f32_refresh(
                kkt_seed, qp.Q, qp.A_eq, rho_diag
            )
    C = refine_inverse_columns_ds(X32, M, ci, passes=passes)  # (N, k, B)
    # C[:, j] = M^{-1}[:, ci_j]; the loop needs F[:, ci] j-major over k
    Fci = DS(C.hi[:n], C.lo[:n])               # (n, k, B) = F[:, ci]
    Fcolj = transpose_ds(Fci)                  # (k, n, B): [j, i] = F[i, ci_j]
    Fcc = DS(Fci.hi[ci], Fci.lo[ci])           # (k, k, B): [j', j] = F[ci_j', ci_j]
    Fcc = transpose_ds(Fcc)                    # j-major over the contraction
    r = DS(
        jnp.concatenate([-qp.b.hi, qp.b_eq.hi], axis=0),
        jnp.concatenate([-qp.b.lo, qp.b_eq.lo], axis=0),
    )
    xfull = solve_from_seed_ds(X32, M, r, passes=passes)
    x_const = DS(xfull.hi[:n], xfull.lo[:n])
    xc_const = _gather0(x_const, ci)
    hyb = (Fcc, xc_const, Fcolj, x_const)

    # OUTPUT-level validation of the refined operator: residual of the
    # constant-term solve against the true KKT (M is symmetric, so it
    # is its own j-major form). The seed_res gate alone is not enough:
    # a marginal seed (res ~0.4, just under the 0.5 gate) leaves ~1e-2
    # relative error after the thin refinement, and the ADMM then
    # converges — residuals exactly zero — to the WRONG fixed point
    # (equality-feasible, ~10% suboptimal objective; observed r5 on
    # near-unloaded-gait Cassie instances, caught by the numpy oracle).
    # A healthy refined solve lands at ~1e-7 relative here.
    rres = ds.sub(matvec_ds(M, xfull), r)
    rel = jnp.max(jnp.abs(rres.hi), axis=0) / (
        1.0 + jnp.max(jnp.abs(r.hi), axis=0)
    )

    # instances whose seed did not contract (||I - X M|| too large for
    # the downstream thin refinement to converge — with a carried seed
    # also: the data jumped too far for a refresh), or whose refined
    # solve misses the output tolerance, are re-factorized on the
    # all-ds Schur route and selected per instance. lax.cond keeps the
    # fallback free on healthy batches (the common case).
    bad = (seed_res > 0.5) | (rel > 1e-5)

    def _sel(d_out: DS, h_out: DS) -> DS:
        m = bad.reshape((1,) * (d_out.hi.ndim - 1) + (-1,))
        return ds.where(m, d_out, h_out)

    def _with_fallback(hyb_in):
        ds_out = _factor_reduced(qp, rho, ci, mask, max(passes - 1, 1))
        return tuple(_sel(d_o, h_o) for d_o, h_o in zip(ds_out, hyb_in))

    def _passthrough(hyb_in):
        return tuple(hyb_in)

    out = jax.lax.cond(jnp.any(bad), _with_fallback, _passthrough, hyb)
    return out + (X32,)


def constrained_indices(
    qp: QPBatchDS, shape: ProblemShape, full: bool = False
) -> tuple:
    """Static coordinate ordering for the (reduced) ADMM splitting:
    box-constrained coordinates first, the cone segment last (so the
    reduced cone segment is the contiguous tail).

    ``full=True`` keeps every coordinate (reference `rho*I` splitting,
    `fcc_qp.cpp:62-64`, just permuted); otherwise only coordinates with
    a finite bound in ANY batch instance participate — free coordinates
    provably carry zero dual and identity projections, so excluding
    them leaves the fixed point unchanged while shrinking the hot-loop
    operator from n x n to k x k.
    """
    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    cone = tuple(range(ls, ls + nc))
    if full:
        non_cone = tuple(i for i in range(nv) if not (ls <= i < ls + nc))
        return non_cone + cone
    if isinstance(qp.lb.hi, jax.core.Tracer):
        raise ValueError(
            "constrained_indices needs concrete bounds; under jit pass "
            "con_idx explicitly to solve_batched_ds"
        )
    lb = np.asarray(qp.lb.hi)
    ub = np.asarray(qp.ub.hi)
    finite = np.isfinite(lb).any(axis=-1) | np.isfinite(ub).any(axis=-1)
    finite[ls : ls + nc] = False
    return tuple(int(i) for i in np.where(finite)[0]) + cone


def _eq_residual_inf(qp: QPBatchDS, x: DS) -> Array:
    """``max_i |A_eq x - b_eq|`` per instance in UNSCALED units (ds
    matvec, hi word out) — the observability hook for factorization
    failure: the reference's LDLT primal is equality-consistent by
    construction (`fcc_qp.cpp:86-87`), ours comes from a refined inverse
    operator, so a non-contracting refinement shows up here and nowhere
    else."""
    B = qp.batch
    if qp.A_eq.hi.shape[0] == 0:
        return jnp.zeros((B,), qp.Q.hi.dtype)
    r = ds.sub(matvec_ds(transpose_ds(qp.A_eq), x), qp.b_eq)
    return jnp.max(jnp.abs(r.hi), axis=0)


def pad_batch_last(tree, multiple: int):
    """Pad the TRAILING (batch) axis of every leaf up to a multiple by
    replicating the last instance; returns (padded_tree, original_B).
    The batch-last analog of `parallel.mesh.pad_batch`."""
    leaves = jax.tree.leaves(tree)
    b = leaves[0].shape[-1]
    pad = (-b) % multiple
    if pad == 0:
        return tree, b

    def _pad(a):
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, widths, mode="edge")

    return jax.tree.map(_pad, tree), b


def _unpad_solution(sol: FCCQPSolution, ws: WarmStartDS, b0: int):
    """Strip batch padding: solution is batch-LEADING, warm state
    batch-LAST."""
    sol = FCCQPSolution(
        details=jax.tree.map(lambda a: a[:b0], sol.details),
        z=sol.z[:b0],
    )
    ws = jax.tree.map(lambda a: a[..., :b0], ws)
    return sol, ws


def _status_checked(n_iter, max_iter: int, eq_viol: Array, qp: QPBatchDS):
    """Per-instance solve status with the factorization-failure check:
    an equality-infeasible primal (relative inf-norm residual above
    1e-3) can only come from a broken factorization chain, never from
    unconverged ADMM (the primal update is equality-consistent by
    construction), so it is reported as kFactorizationFailed rather
    than letting a garbage solution read kSuccess."""
    status = jnp.where(
        n_iter == max_iter,
        jnp.int32(FCCQPSolveStatus.kMaxIterations),
        jnp.int32(FCCQPSolveStatus.kSuccess),
    )
    if qp.A_eq.hi.shape[0] == 0:
        return status
    thresh = 1e-3 * (1.0 + jnp.max(jnp.abs(qp.b_eq.hi), axis=0))
    return jnp.where(
        eq_viol > thresh,
        jnp.int32(FCCQPSolveStatus.kFactorizationFailed),
        status,
    )


def _stamp_times(sol: FCCQPSolution, solve_time: float, factor_time: float):
    from fcc_qp_tpu.utils.timing import stamp_solution_times

    return stamp_solution_times(sol, solve_time, factor_time)


def solve_batched_ds(
    qp: QPBatchDS,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    warm: Optional[WarmStartDS] = None,
    warm_start: bool = False,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    con_idx: Optional[tuple] = None,
    timing: bool = True,
):
    """ds-precision batched solve (host wrapper: jit the inner fn).

    ``use_pallas`` runs the ADMM iteration chunks in the fused Pallas
    TPU kernel (`ops/pallas_admm.py`): operator resident in VMEM,
    per-tile early exit. Requires batch % 128 == 0 and alpha == 1.0.
    ``pallas_interpret`` runs the kernel in interpreter mode (CPU
    testing).

    With ``opts.scaling`` or ``opts.splitting == "constrained"`` the
    solve runs on the equilibrated, reduced-subspace path; ``con_idx``
    (static tuple from `constrained_indices`) may be passed explicitly
    when calling under jit.

    ``timing``: when called eagerly (not under an outer jit), dispatch
    the factorization and iteration stages as two chained programs and
    fill ``details.solve_time`` / ``details.factorization_time`` with
    true wall-clock phase spans (batch-level broadcast; the stages are
    queued back-to-back so the split costs one dispatch, not a stall).
    Under an outer trace the composed single program runs and the
    fields are zero — callers like `replay_ds_streams` stamp amortized
    times at their own boundary.
    """
    if use_pallas:
        assert opts.alpha == 1.0, "pallas path supports alpha=1.0 only"
        if qp.batch % 128 != 0:
            # auto-pad to the Pallas lane tile (replicating the last
            # instance), solve, and strip the padding on return
            qp_p, b0 = pad_batch_last(qp, 128)
            warm_p = (
                pad_batch_last(warm, 128)[0] if warm is not None else None
            )
            sol, ws = solve_batched_ds(
                qp_p, shape, opts, warm=warm_p, warm_start=warm_start,
                use_pallas=True, pallas_interpret=pallas_interpret,
                con_idx=con_idx, timing=timing,
            )
            return _unpad_solution(sol, ws, b0)
    reduced = (
        opts.scaling
        or opts.splitting == "constrained"
        or opts.polish
        or con_idx is not None
    )
    traced = isinstance(qp.Q.hi, jax.core.Tracer)
    if reduced:
        if con_idx is None:
            con_idx = constrained_indices(
                qp, shape, full=opts.splitting == "full"
            )
        if traced or not timing:
            return _solve_ds_reduced_jit(
                qp, warm, shape, opts, warm_start, con_idx,
                use_pallas, pallas_interpret,
            )
        if len(con_idx) == 0:
            # pure-equality: the whole solve IS one factorized solve
            t0 = time.perf_counter()
            sol, ws = _solve_ds_reduced_jit(
                qp, warm, shape, opts, warm_start, con_idx,
                use_pallas, pallas_interpret,
            )
            _sync_smallest(sol)
            t = time.perf_counter() - t0
            return _stamp_times(sol, t, t), ws
        t0 = time.perf_counter()
        prep = _prepare_reduced_jit(
            qp, warm, shape, opts, warm_start, con_idx
        )
        sol, ws = _iterate_reduced_jit(
            qp, prep, shape, opts, con_idx, use_pallas, pallas_interpret
        )
        _sync_smallest(prep.rho0)
        t1 = time.perf_counter()
        _sync_smallest(sol)
        t2 = time.perf_counter()
        return _stamp_times(sol, t2 - t0, t1 - t0), ws
    if traced or not timing:
        return _solve_batched_ds_jit(
            qp, warm, shape, opts, warm_start, use_pallas, pallas_interpret
        )
    t0 = time.perf_counter()
    prep = _prepare_full_jit(qp, warm, shape, opts, warm_start)
    sol, ws = _iterate_full_jit(
        qp, prep, shape, opts, use_pallas, pallas_interpret
    )
    _sync_smallest(prep.rho0)
    t1 = time.perf_counter()
    _sync_smallest(sol)
    t2 = time.perf_counter()
    return _stamp_times(sol, t2 - t0, t1 - t0), ws


def _sync_smallest(tree):
    from fcc_qp_tpu.utils.timing import sync

    sync(tree)


class _PrepFull(NamedTuple):
    """Factorization-phase outputs of the full-splitting engine."""

    mu_x0: DS
    mu_lam0: DS
    rho0: Array
    x_init: DS
    eq_c: Array
    Fj: DS
    x_const: DS


def _prepare_full(qp, warm, shape, opts, warm_start) -> _PrepFull:
    """Stage 1 (the "factorization" phase, reference
    `fcc_qp.cpp:62-71,159-178`): warm-state setup, optional exact
    presolve, and the batched KKT operator build."""
    nv, nc = shape.num_vars, shape.nc
    B = qp.batch
    f32 = qp.Q.hi.dtype

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

    Fj0, x_const0 = _factor(qp, rho0, opts.kkt_refine_steps)
    if x_init is None:
        # "operator" presolve: the rho-regularized equality-QP solution
        # (the v=0 primal update) as cold-start guess — saves the
        # dedicated unregularized factorization.
        x_init = x_const0
    return _PrepFull(
        mu_x0=mu_x0, mu_lam0=mu_lam0, rho0=rho0, x_init=x_init,
        eq_c=eq_c, Fj=Fj0, x_const=x_const0,
    )


def _iterate_full(
    qp, prep: _PrepFull, shape, opts, use_pallas=False,
    pallas_interpret=False,
):
    """Stage 2: the ADMM loop + finalization on prebuilt factors."""
    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    B = qp.batch
    f32 = qp.Q.hi.dtype
    alpha = jnp.asarray(opts.alpha, f32)
    use_alpha = opts.alpha != 1.0
    eps_fcone = jnp.asarray(opts.eps_fcone, f32)
    eps_bound = jnp.asarray(opts.eps_bound, f32)

    # chunked iteration (see _iterate_reduced: a chunk's fori runs its
    # full masked length; small chunks let the while_loop exit early)
    K = (
        opts.adaptive_rho_interval
        if opts.adaptive_rho
        else min(opts.max_iter, 64)
    )
    n_chunks = -(-opts.max_iter // K)

    mu_x0, mu_lam0 = prep.mu_x0, prep.mu_lam0
    rho0, x_init, eq_c = prep.rho0, prep.x_init, prep.eq_c
    Fj0, x_const0 = prep.Fj, prep.x_const

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
        if opts.presolve == "operator":
            # PRIMAL-INCREMENT gate (operator presolve only). The
            # projection residual equals -mu wherever no constraint is
            # active, so with released/zero duals it reads 0 while the
            # primal is still CONTRACTING toward the optimum from the
            # rho-biased operator init — the reference never sees this
            # because its cold init is the exact equality optimum
            # (fcc_qp.cpp:159-178); observed r5 as kSuccess at 10%
            # suboptimal objective on unloaded-gait instances. Exact-
            # presolve configs keep reference convergence semantics
            # bit-for-bit. Box term = non-cone rows; cone term = the
            # contact segment (mirrored exactly in the Pallas kernel).
            dx = jnp.abs(ds.sub(x, st.x).hi)
            parts = []
            if ls > 0:
                parts.append(jnp.max(dx[:ls], axis=0))
            if ls + nc < nv:
                parts.append(jnp.max(dx[ls + nc:], axis=0))
            x_inc = (
                parts[0] if len(parts) == 1
                else jnp.maximum(parts[0], parts[1])
            ) if parts else zeros_b
            lam_inc = (
                jnp.max(jax.lax.slice_in_dim(dx, ls, ls + nc, axis=0),
                        axis=0)
                if nc else zeros_b
            )
            conv = conv & (x_inc < eps_bound) & (lam_inc < eps_fcone)
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
            Fj, x_const = _factor(qp, new_rho, opts.kkt_refine_steps)
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

        v_in = ds.sub(
            _set_seg(st.x_bar, st.lam_bar, ls, nc),
            _set_seg(st.mu_x, st.mu_lam, ls, nc),
        )
        # per-instance counters == the global counter on this
        # single-phase path (frozen instances are done)
        itv_in = jnp.full((qp.batch,), st.it, jnp.int32)
        (x, x_bar, lam_bar, mu_x, mu_lam, _v, done, n_iter, _itv,
         xrn, lrn, prim, dual) = admm_chunk_pallas(
            st.Fj, st.x_const, qp.lb, qp.ub, qp.friction_coeffs,
            st.rho, eps_bound, eps_fcone,
            st.x, st.x_bar, st.lam_bar, st.mu_x, st.mu_lam, v_in,
            st.done, st.n_iter, itv_in,
            shape=shape, K=K, max_iter=opts.max_iter,
            interpret=pallas_interpret,
            inc_gate=opts.presolve == "operator",
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
    eq_viol = _eq_residual_inf(qp, x)
    zeros_i = jnp.zeros((B,), jnp.int32)
    details = FCCQPDetails(
        n_iter=n_iter,
        admm_residual_bounds=xrn,
        admm_residual_friction_cone=lrn,
        solve_time=zeros_b,
        factorization_time=zeros_b,
        bounds_viol=bounds_viol,
        friction_cone_viol=fcone_viol,
        solve_status=_status_checked(n_iter, opts.max_iter, eq_viol, qp),
        equality_viol=eq_viol,
        n_iter_f32=zeros_i,
        n_iter_ds=n_iter,  # full-splitting engine iterates in ds only
        polish_attempts=zeros_i,
        polish_accepted=zeros_i,
    )
    sol = FCCQPSolution(details=details, z=z)
    new_warm = WarmStartDS(
        x=x,
        mu_x=ds.where(eq_c[None, :], mu_x0, st.mu_x),
        mu_lambda_c=st.mu_lam,
        rho=st.rho,
    )
    return sol, new_warm


@partial(
    jax.jit,
    static_argnames=(
        "shape", "opts", "warm_start", "use_pallas", "pallas_interpret",
    ),
)
def _solve_batched_ds_jit(
    qp, warm, shape, opts, warm_start, use_pallas=False,
    pallas_interpret=False,
):
    prep = _prepare_full(qp, warm, shape, opts, warm_start)
    return _iterate_full(qp, prep, shape, opts, use_pallas, pallas_interpret)


_prepare_full_jit = partial(
    jax.jit, static_argnames=("shape", "opts", "warm_start")
)(_prepare_full)
_iterate_full_jit = partial(
    jax.jit,
    static_argnames=("shape", "opts", "use_pallas", "pallas_interpret"),
)(_iterate_full)


class _RState(NamedTuple):
    it: Array
    next_adapt: Array
    n_refactor: Array
    xc: DS              # (k, B) primal, constrained coords
    s: DS               # (k, B) slack (box part + cone tail)
    mu: DS              # (k, B) scaled duals
    v: DS               # (k, B) the s-mu that PRODUCED xc (for exact
                        #        full-x recovery of the accepted iterate)
    rho: Array          # (B,) f32 (scaled-space)
    Fcc: DS             # (k, k, B) hot-loop operator
    xc_const: DS        # (k, B)
    Fcolj: DS           # (k, n, B) for final full-x recovery
    x_const: DS         # (n, B)
    x_res_norm: Array
    lam_res_norm: Array
    prim_norm: Array
    dual_norm: Array
    n_iter: Array
    itv: Array          # (B,) per-instance iteration counters
    done: Array


def _seg_tail(v: DS, kb: int) -> DS:
    return DS(v.hi[kb:], v.lo[kb:])


def _concat0(a: DS, b: DS) -> DS:
    return DS(
        jnp.concatenate([a.hi, b.hi], axis=0),
        jnp.concatenate([a.lo, b.lo], axis=0),
    )


class _PrepReduced(NamedTuple):
    """Factorization-phase outputs of the reduced/equilibrated engine."""

    qps: QPBatchDS      # scaled problem
    d: Array            # (n, B) variable scales
    e: Array            # (m, B) equality-row scales
    cost_c: Array       # (B,) cost scale (with d/e: the full Scaling)
    rho0: Array
    mu0: DS             # (k, B) initial scaled duals
    x_init: DS          # (n, B) initial scaled primal
    eq_c: Array
    Fcc: DS
    xc_const: DS
    Fcolj: DS
    x_const: DS
    kkt_seed: Optional[Array] = None  # (N, N, B) f32 (hybrid factor)
    # (B,) flag: the lazy f32-only operator did NOT contract for these
    # instances (even after the cold rescue) — they must be included in
    # the deferred ds-exact build regardless of polish outcome
    seed_bad: Optional[Array] = None


def _scale_reduced(qp, shape, opts, carried=None):
    """Ruiz-equilibrate (or pass through) the batch.

    ``carried``: optional `Scaling` from a previous replay step
    (`OperatorCache.scales`) — reused instead of recomputing (see the
    cache field's rationale).

    Equilibration is FORCED whenever ``splitting == 'constrained'``,
    regardless of ``opts.scaling``: removing rho from the free
    coordinates leaves the KKT (1,1) block near-singular on
    rank-deficient OSC Hessians, and on unequilibrated data the
    factorization refinement does not contract — the solve then returns
    kSuccess with a grossly equality-infeasible primal (the projection-
    consistency convergence test cannot see equality residuals). On
    equilibrated data the refinement contracts and the failure mode is
    gone; `details.equality_viol` reports the residual either way.
    """
    f32 = qp.Q.hi.dtype
    if opts.scaling or opts.splitting == "constrained":
        sc = (
            carried
            if carried is not None
            else ruiz_scaling(
                qp.Q.hi, qp.A_eq.hi, qp.b.hi, shape,
                iters=opts.scaling_iters,
            )
        )
        return apply_scaling(qp, sc, shape), sc
    sc = identity_scaling(
        shape.num_vars, qp.A_eq.hi.shape[0], qp.batch, f32
    )
    return qp, sc


def _lazy_exact(opts: FCCQPOptions) -> bool:
    """Whether the reduced engine defers the ds-exact operator build:
    requires the hybrid factorization AND an f32 approach phase ending
    in a PDAS polish (which self-solves in ds) — then only
    polish-rejected instances ever touch the ds operator, and the
    exact build can be cond-gated + capacity-gathered."""
    coarse = max(
        opts.phase1_tol, opts.polish_tol if opts.polish else 0.0
    )
    return (
        opts.lazy_exact
        and opts.kkt_factor == "hybrid"
        and opts.polish
        and coarse > max(opts.eps_bound, opts.eps_fcone)
    )


def _factor_reduced_f32(
    qp: QPBatchDS, rho: Array, ci: np.ndarray, mask: np.ndarray,
    kkt_seed: Optional[Array] = None,
):
    """f32-only reduced factorization: the Schur-free Newton-Schulz
    KKT inverse seed, sliced to the hot-loop blocks — no ds refinement.
    Returns ``(Fcc32, xc_const32, Fcolj32, x_const32, X32, bad)``;
    accuracy is the f32 seed floor (~1e-3 relative on equilibrated
    KKTs), enough for the coarse approach phase + PDAS polish pipeline.

    ``bad`` is the (B,) non-contraction flag of the seed/refresh: with
    a carried ``kkt_seed`` a diverged refresh (the data jumped — e.g. a
    stream boundary) is first rescued by a cond-gated cold seed
    rebuild; instances still flagged after that (genuinely beyond the
    f32 route) must be given the ds-exact operator before the endgame
    (the caller folds ``bad`` into the lazy exact build's ``need``)."""
    n = qp.Q.hi.shape[0]
    rho_diag = rho[None, :] * jnp.asarray(mask, qp.Q.hi.dtype)[:, None]
    with jax.default_matmul_precision("highest"):
        if kkt_seed is None:
            X32, seed_res = kkt_inverse_f32_seed(qp.Q, qp.A_eq, rho_diag)
        else:
            X32, seed_res = kkt_inverse_f32_refresh(
                kkt_seed, qp.Q, qp.A_eq, rho_diag
            )
            # cold rescue of non-contracting refreshes, GATHERED: at
            # stream scale >=1 of B instances trips on ~every step, and
            # a full-batch rebuild (two SPD NS inversions, ~60 HIGHEST
            # matmuls) would silently cost ~100 ms per replay step.
            # Loops until the bad set is exhausted.
            B_ = qp.batch
            Cres = min(B_, max(128, B_ // 8))
            rho_nb = (
                rho_diag
                if rho_diag.ndim == 2
                else jnp.broadcast_to(rho_diag[None, :], (n, B_))
            )

            def _pass(c):
                X, r_, rem = c
                bad = rem > 0.5
                idx = jnp.argsort(
                    -bad.astype(X.dtype), stable=True
                )[:Cres]
                sel = bad[idx]
                Qs = DS(qp.Q.hi[..., idx], qp.Q.lo[..., idx])
                As = DS(qp.A_eq.hi[..., idx], qp.A_eq.lo[..., idx])
                Xc, rc = kkt_inverse_f32_seed(Qs, As, rho_nb[:, idx])
                X = X.at[..., idx].set(
                    jnp.where(sel[None, None, :], Xc, X[..., idx])
                )
                r_ = r_.at[idx].set(jnp.where(sel, rc, r_[idx]))
                rem = rem.at[idx].set(0.0)  # handled either way
                return X, r_, rem

            def _loop(c):
                X, r_, rem = jax.lax.while_loop(
                    lambda s: jnp.any(s[2] > 0.5),
                    _pass,
                    (c[0], c[1], c[1]),
                )
                return X, r_

            X32, seed_res = jax.lax.cond(
                jnp.any(seed_res > 0.5),
                _loop,
                lambda c: c,
                (X32, seed_res),
            )
        r = jnp.concatenate([-qp.b.hi, qp.b_eq.hi], axis=0)
        xfull = jnp.einsum(
            "ijb,jb->ib", X32, r,
            precision=jax.lax.Precision.HIGHEST,
        )
    Fci = X32[:n][:, ci]                       # (n, k, B) = F[:, ci]
    Fcolj = jnp.swapaxes(Fci, 0, 1)            # (k, n, B) j-major
    Fcc = jnp.swapaxes(Fci[ci], 0, 1)          # (k, k, B) j-major
    x_const = xfull[:n]
    xc_const = x_const[ci]
    return Fcc, xc_const, Fcolj, x_const, X32, seed_res > 0.5


def _reduced_factor_fn(qps, opts, ci, mask):
    """4-tuple factorization interface (Fcc, xc_const, Fcolj, x_const)
    for rho refactorization inside the iterate loop (the carried f32
    seed, when any, lives in the prepare phase — see `OperatorCache`)."""
    if opts.kkt_factor == "hybrid":
        def factor_fn(rho_):
            return _factor_reduced_hybrid(
                qps, rho_, ci, mask, opts.kkt_refine_steps + 1
            )[:4]
    else:
        def factor_fn(rho_):
            return _factor_reduced(
                qps, rho_, ci, mask, opts.kkt_refine_steps
            )
    return factor_fn


def _prepare_reduced(
    qp, warm, shape, opts, warm_start, con_idx,
    kkt_seed: Optional[Array] = None,
    scales=None,
) -> _PrepReduced:
    """Stage 1 (the "factorization" phase): equilibration, warm-state
    setup, optional exact presolve, and the reduced KKT operator build.
    Requires ``len(con_idx) > 0`` (the pure-equality k == 0 case is
    handled by `_solve_reduced_k0`).

    ``kkt_seed``: carried f32 KKT inverse (`OperatorCache.kkt_seed`,
    scaled space) refreshed instead of rebuilt on the hybrid path."""
    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    B = qp.batch
    f32 = qp.Q.hi.dtype
    ci = np.asarray(con_idx, dtype=np.int64)
    k = len(con_idx)
    kb = k - nc
    assert k > 0

    qps, sc = _scale_reduced(qp, shape, opts, carried=scales)
    d = sc.d
    inv_d = 1.0 / d
    mask = np.zeros((nv,), np.float32)
    mask[ci] = 1.0

    # --- initial state (warm: unscaled full-space pytree -> scaled
    # reduced coords; cold: operator/exact presolve) ---
    if warm is None:
        warm = WarmStartDS(
            x=ds.zeros((nv, B), f32),
            mu_x=ds.zeros((nv, B), f32),
            mu_lambda_c=ds.zeros((nc, B), f32),
            rho=jnp.full((B,), opts.rho, f32),
        )

    if warm_start:
        rho0 = warm.rho
        x_init = ds.mul_f32(warm.x, inv_d)      # scale into x~ space
        mu_box = ds.mul_f32(_gather0(warm.mu_x, ci[:kb]), inv_d[ci[:kb]])
        mu_cone = ds.mul_f32(warm.mu_lambda_c, inv_d[ls:ls + nc]) if nc \
            else ds.zeros((0, B), f32)
        mu0 = _concat0(mu_box, mu_cone)
    else:
        rho0 = jnp.full((B,), opts.rho, f32)
        mu0 = ds.zeros((k, B), f32)
        if opts.presolve == "exact":
            x_init = kkt_solve_refined_ds(
                qps.Q, qps.A_eq, ds.neg(qps.b), qps.b_eq
            )
        else:
            x_init = None  # operator presolve: x_const after factorization

    # equality-constrained fast path (nc == 0, all-infinite bounds)
    if nc == 0:
        eq_c = jnp.all(jnp.isinf(qp.lb.hi), axis=0) & jnp.all(
            jnp.isinf(qp.ub.hi), axis=0
        )
    else:
        eq_c = jnp.zeros((B,), jnp.bool_)

    lazy = _lazy_exact(opts)
    if opts.kkt_factor == "hybrid" and lazy:
        # f32-only operator: the f32 approach phase + PDAS polish (its
        # own ds-refined KKT solves) never read the lo words, so the
        # expensive ds column refinement is DEFERRED to a cond-gated,
        # capacity-gathered build just before the ds endgame — which a
        # fully polish-accepted batch (the warm-replay common case)
        # skips entirely (`_iterate_reduced`).
        Fcc32, xc32, Fcolj32, x32, X32, seed_bad = _factor_reduced_f32(
            qps, rho0, ci, mask, kkt_seed=kkt_seed
        )
        Fcc0 = ds.from_f32(Fcc32)
        xc_const0 = ds.from_f32(xc32)
        Fcolj0 = ds.from_f32(Fcolj32)
        x_const0 = ds.from_f32(x32)
    elif opts.kkt_factor == "hybrid":
        Fcc0, xc_const0, Fcolj0, x_const0, X32 = _factor_reduced_hybrid(
            qps, rho0, ci, mask, opts.kkt_refine_steps + 1,
            kkt_seed=kkt_seed,
        )
        seed_bad = None
    else:
        Fcc0, xc_const0, Fcolj0, x_const0 = _factor_reduced(
            qps, rho0, ci, mask, opts.kkt_refine_steps
        )
        X32 = None
        seed_bad = None
    if x_init is None:
        x_init = x_const0
    return _PrepReduced(
        qps=qps, d=d, e=sc.e, cost_c=sc.c, rho0=rho0, mu0=mu0,
        x_init=x_init, eq_c=eq_c, Fcc=Fcc0, xc_const=xc_const0,
        Fcolj=Fcolj0, x_const=x_const0, kkt_seed=X32,
        seed_bad=seed_bad,
    )


def _solve_reduced_k0(qp, shape, opts):
    """Pure-equality batch (no constrained coordinates at all): one
    refined KKT solve IS the whole solve."""
    nv = shape.num_vars
    B = qp.batch
    f32 = qp.Q.hi.dtype
    zeros_b = jnp.zeros((B,), f32)
    qps, sc = _scale_reduced(qp, shape, opts)
    x_s = kkt_solve_refined_ds(qps.Q, qps.A_eq, ds.neg(qps.b), qps.b_eq)
    x = ds.mul_f32(x_s, sc.d)
    z = jnp.swapaxes(ds.to_f64(x), 0, 1)
    eq_viol = _eq_residual_inf(qp, x)
    n_iter0 = jnp.zeros((B,), jnp.int32)
    details = FCCQPDetails(
        n_iter=n_iter0,
        admm_residual_bounds=zeros_b,
        admm_residual_friction_cone=zeros_b,
        solve_time=zeros_b,
        factorization_time=zeros_b,
        bounds_viol=zeros_b,
        friction_cone_viol=zeros_b,
        solve_status=_status_checked(n_iter0, opts.max_iter, eq_viol, qp),
        equality_viol=eq_viol,
        n_iter_f32=n_iter0,
        n_iter_ds=n_iter0,
        polish_attempts=n_iter0,
        polish_accepted=n_iter0,
    )
    new_warm = WarmStartDS(
        x=x, mu_x=ds.zeros((nv, B), f32), mu_lambda_c=ds.zeros((0, B), f32),
        rho=jnp.full((B,), opts.rho, f32),
    )
    return FCCQPSolution(details=details, z=z), new_warm


def _iterate_reduced(
    qp, prep: _PrepReduced, shape, opts, con_idx,
    use_pallas=False, pallas_interpret=False,
    polish_seed: Optional[Array] = None, with_cache: bool = False,
    polish_cls: Optional[Array] = None,
):
    """Stage 2 of the equilibrated, reduced-subspace ds ADMM.

    Same fixed point as the reference algorithm
    (`/root/reference/src/fcc_qp.cpp:57-112`) but (a) the problem is
    cone-aware Ruiz-equilibrated (`ops/scaling.py`) with convergence
    still checked in UNSCALED units, and (b) the splitting runs only
    over `con_idx` — finitely-bounded + cone coordinates — so each
    iteration is one (k x k) ds mat-vec instead of (n x n).
    """
    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    B = qp.batch
    f32 = qp.Q.hi.dtype
    ci = np.asarray(con_idx, dtype=np.int64)
    k = len(con_idx)
    kb = k - nc
    assert tuple(con_idx[kb:]) == tuple(range(ls, ls + nc)), (
        "con_idx must end with the contiguous cone segment"
    )
    mask = np.zeros((nv,), np.float32)
    mask[ci] = 1.0
    alpha = jnp.asarray(opts.alpha, f32)
    use_alpha = opts.alpha != 1.0
    eps_fcone = jnp.asarray(opts.eps_fcone, f32)
    eps_bound = jnp.asarray(opts.eps_bound, f32)
    zeros_b = jnp.zeros((B,), f32)

    qps = prep.qps
    d = prep.d
    wk = d[ci]                     # (k, B) residual weights -> unscaled
    wl = wk[kb:]                   # (nc, B)
    lbc = _gather0(qps.lb, ci[:kb])
    ubc = _gather0(qps.ub, ci[:kb])
    mu_eff = qps.friction_coeffs

    # iteration chunk size: the while_loops below can only test
    # convergence BETWEEN chunks, and a chunk's fori runs its full
    # length of (masked) work even when one straggler instance is
    # active — K = max_iter would make every engaged loop cost the
    # whole budget (measured ~300 ms of dead iterations per warm step
    # at max_iter=3000, B=4096). 64 bounds the dead work per loop at
    # ~5 ms while keeping the per-chunk convergence check amortized.
    K = (
        opts.adaptive_rho_interval
        if opts.adaptive_rho
        else min(opts.max_iter, 64)
    )
    n_chunks = -(-opts.max_iter // K)

    rho0, mu0, x_init, eq_c = prep.rho0, prep.mu0, prep.x_init, prep.eq_c
    Fcc0, xc_const0 = prep.Fcc, prep.xc_const
    Fcolj0, x_const0 = prep.Fcolj, prep.x_const
    factor_fn = _reduced_factor_fn(qps, opts, ci, mask)

    xc0 = _gather0(x_init, ci)
    init = _RState(
        it=jnp.int32(0),
        next_adapt=jnp.int32(K),
        n_refactor=jnp.int32(0),
        xc=xc0,
        s=xc0,
        mu=mu0,
        v=ds.sub(xc0, mu0),
        rho=rho0,
        Fcc=Fcc0,
        xc_const=xc_const0,
        Fcolj=Fcolj0,
        x_const=x_const0,
        x_res_norm=zeros_b,
        lam_res_norm=zeros_b,
        prim_norm=zeros_b,
        dual_norm=zeros_b,
        n_iter=jnp.full((B,), opts.max_iter, jnp.int32),
        itv=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
    )

    def iteration(st: _RState) -> _RState:
        s_prev = st.s
        v = ds.sub(s_prev, st.mu)
        y = matvec_ds(st.Fcc, v)
        xc = ds.add(st.xc_const, ds.mul_f32(y, st.rho[None, :]))

        if use_alpha:
            x_hat = ds.add(
                ds.mul_f32(xc, alpha), ds.mul_f32(s_prev, 1.0 - alpha)
            )
        else:
            x_hat = xc

        t = ds.add(x_hat, st.mu)
        parts = []
        if kb:
            parts.append(ds.clip(DS(t.hi[:kb], t.lo[:kb]), lbc, ubc))
        if nc:
            parts.append(project_cone_ds(_seg_tail(t, kb), mu_eff))
        s = parts[0] if len(parts) == 1 else _concat0(parts[0], parts[1])

        res = ds.sub(xc, s)
        mu = ds.add(st.mu, ds.sub(x_hat, s))

        wres = jnp.abs(res.hi) * wk
        x_res_norm = jnp.max(wres[:kb], axis=0) if kb else zeros_b
        lam_res_norm = jnp.max(wres[kb:], axis=0) if nc else zeros_b

        dprim = res.hi * wk
        dchange = ds.sub(s, s_prev).hi * wk
        prim_norm = jnp.sqrt(jnp.sum(dprim * dprim, axis=0))
        dual_norm = st.rho * jnp.sqrt(jnp.sum(dchange * dchange, axis=0))

        conv = (lam_res_norm < eps_fcone) & (x_res_norm < eps_bound)
        if opts.presolve == "operator":
            # primal-increment gate — see the full-splitting loop's
            # comment: with operator presolve, zero projection residual
            # does NOT imply the primal has finished contracting
            winc = jnp.abs(ds.sub(xc, st.xc).hi) * wk
            x_inc = jnp.max(winc[:kb], axis=0) if kb else zeros_b
            lam_inc = jnp.max(winc[kb:], axis=0) if nc else zeros_b
            conv = conv & (x_inc < eps_bound) & (lam_inc < eps_fcone)
        active = ~st.done & (st.itv < opts.max_iter)
        n_iter = jnp.where(conv & active, st.itv, st.n_iter)

        def commit_ds(new: DS, old: DS) -> DS:
            return ds.where(active[None, :], new, old)

        def commit(new, old):
            return jnp.where(active, new, old)

        return st._replace(
            it=st.it + 1,
            xc=commit_ds(xc, st.xc),
            s=commit_ds(s, st.s),
            mu=commit_ds(mu, st.mu),
            v=commit_ds(v, st.v),
            x_res_norm=commit(x_res_norm, st.x_res_norm),
            lam_res_norm=commit(lam_res_norm, st.lam_res_norm),
            prim_norm=commit(prim_norm, st.prim_norm),
            dual_norm=commit(dual_norm, st.dual_norm),
            n_iter=n_iter,
            itv=jnp.where(active, st.itv + 1, st.itv),
            done=st.done | (conv & active),
        )

    def adapt(st: _RState) -> _RState:
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
        mu = ds.mul_f32(st.mu, scale[None, :])

        def refactor(_):
            Fcc, xc_const, Fcolj, x_const = factor_fn(new_rho)
            return Fcc, xc_const, Fcolj, x_const, st.n_refactor + 1

        Fcc, xc_const, Fcolj, x_const, n_refactor = jax.lax.cond(
            changed,
            refactor,
            lambda _: (
                st.Fcc, st.xc_const, st.Fcolj, st.x_const, st.n_refactor
            ),
            operand=None,
        )
        next_adapt = jnp.where(due, 2 * st.next_adapt, st.next_adapt)
        return st._replace(
            rho=new_rho, Fcc=Fcc, xc_const=xc_const, Fcolj=Fcolj,
            x_const=x_const, mu=mu, next_adapt=next_adapt,
            n_refactor=n_refactor,
        )

    def chunk_body_xla(st: _RState) -> _RState:
        st = jax.lax.fori_loop(0, K, lambda _, s_: iteration(s_), st)
        if opts.adaptive_rho:
            st = adapt(st)
        return st

    def chunk_body_pallas(st: _RState) -> _RState:
        from fcc_qp_tpu.ops.pallas_admm import admm_chunk_pallas

        rshape = ProblemShape(
            num_vars=k, num_eq=0, nc=nc, lambda_c_start=kb
        )
        inf = jnp.full((nc, B), jnp.inf, f32)
        lb_k = DS(
            jnp.concatenate([lbc.hi, -inf], axis=0),
            jnp.concatenate([lbc.lo, jnp.zeros((nc, B), f32)], axis=0),
        ) if nc else lbc
        ub_k = DS(
            jnp.concatenate([ubc.hi, inf], axis=0),
            jnp.concatenate([ubc.lo, jnp.zeros((nc, B), f32)], axis=0),
        ) if nc else ubc
        # kernel keeps split box/cone duals: box dual = mu with the cone
        # tail zeroed (stays zero: inf bounds give zero residual there)
        mu_x_in = DS(
            jnp.concatenate(
                [st.mu.hi[:kb], jnp.zeros((nc, B), f32)], axis=0
            ),
            jnp.concatenate(
                [st.mu.lo[:kb], jnp.zeros((nc, B), f32)], axis=0
            ),
        ) if nc else st.mu
        mu_lam_in = _seg_tail(st.mu, kb)
        lam_bar_in = _seg_tail(st.s, kb)

        (x, x_bar, lam_bar, mu_x, mu_lam, v_out, done, n_iter, itv,
         xrn, lrn, prim, dual) = admm_chunk_pallas(
            st.Fcc, st.xc_const, lb_k, ub_k, mu_eff,
            st.rho, eps_bound, eps_fcone,
            st.xc, st.s, lam_bar_in, mu_x_in, mu_lam_in, st.v,
            st.done, st.n_iter, st.itv,
            shape=rshape, K=K, max_iter=opts.max_iter,
            interpret=pallas_interpret,
            weights=wk, cone_weights=wl,
            inc_gate=opts.presolve == "operator",
        )
        s_new = _set_seg(x_bar, lam_bar, kb, nc)
        mu_new = _set_seg(mu_x, mu_lam, kb, nc)
        st = st._replace(
            it=st.it + K,
            xc=x, s=s_new, mu=mu_new, v=v_out,
            x_res_norm=xrn, lam_res_norm=lrn, prim_norm=prim,
            dual_norm=dual, n_iter=n_iter, itv=itv, done=done,
        )
        if opts.adaptive_rho:
            st = adapt(st)
        return st

    # ----- phase 1 (optional): plain-f32 approach iterations to a coarse
    # switch tolerance, then lift hi words to ds for the endgame. The ds
    # state simply carries zeroed lo words through phase 1. With
    # ``opts.polish`` the coarse tolerance is max(phase1_tol, polish_tol)
    # and an active-set polish (`ops/polish.py`) runs between the coarse
    # phase and the ds endgame; accepted instances skip the endgame
    # entirely. -----
    coarse_tol = max(
        opts.phase1_tol, opts.polish_tol if opts.polish else 0.0
    )
    tau = jnp.asarray(coarse_tol, f32)

    def lift32(st: _RState) -> _RState:
        # zero the lo words for instances ENTERING the f32 phase;
        # already-done instances (e.g. warm-start polish-accepted)
        # keep their ds-precision state
        frozen = st.done[None, :]
        z32 = lambda a: DS(a.hi, jnp.where(frozen, a.lo, 0.0))
        return st._replace(
            xc=z32(st.xc), s=z32(st.s), mu=z32(st.mu), v=z32(st.v)
        )

    def iteration32(st: _RState, tau=tau) -> _RState:
        s_prev = st.s.hi
        v = s_prev - st.mu.hi

        # y[i] = sum_j Fcc[j, i] * v[j] (j-major, matching matvec_ds)
        y = jax.lax.fori_loop(
            0, k, lambda j, a: a + st.Fcc.hi[j] * v[j][None, :],
            jnp.zeros((k, B), f32),
        )
        xc = st.xc_const.hi + st.rho[None, :] * y

        if use_alpha:
            x_hat = opts.alpha * xc + (1.0 - opts.alpha) * s_prev
        else:
            x_hat = xc

        t = x_hat + st.mu.hi
        parts = []
        if kb:
            parts.append(jnp.clip(t[:kb], lbc.hi, ubc.hi))
        if nc:
            f3 = t[kb:].reshape(nc // 3, 3, B)
            fx, fy, fz = f3[:, 0], f3[:, 1], f3[:, 2]
            mu_f = mu_eff.hi
            norm = jnp.sqrt(fx * fx + fy * fy)
            inside = mu_f * fz - norm >= 0
            polar = fz + mu_f * norm < 0
            tt = (mu_f * norm + fz) / (mu_f * mu_f + 1.0)
            safe = jnp.where(norm > 0, norm, 1.0)
            scale_ = tt * mu_f / safe
            sel = lambda surf, orig: jnp.where(
                inside, orig, jnp.where(polar, jnp.zeros_like(orig), surf)
            )
            cone_s = jnp.stack(
                [sel(scale_ * fx, fx), sel(scale_ * fy, fy), sel(tt, fz)],
                axis=1,
            ).reshape(nc, B)
            parts.append(cone_s)
        s_ = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

        res = xc - s_
        mu = st.mu.hi + (x_hat - s_)

        wres = jnp.abs(res) * wk
        x_res_norm = jnp.max(wres[:kb], axis=0) if kb else zeros_b
        lam_res_norm = jnp.max(wres[kb:], axis=0) if nc else zeros_b

        dprim = res * wk
        dchange = (s_ - s_prev) * wk
        prim_norm = jnp.sqrt(jnp.sum(dprim * dprim, axis=0))
        dual_norm = st.rho * jnp.sqrt(jnp.sum(dchange * dchange, axis=0))

        conv = (lam_res_norm < tau) & (x_res_norm < tau)
        active = ~st.done & (st.itv < opts.max_iter)

        def commit2(new, old):
            return jnp.where(active[None, :], new, old)

        def commit(new, old):
            return jnp.where(active, new, old)

        # lo words: zero for ACTIVE instances (plain-f32 phase) but
        # preserved for frozen ones — polish-accepted instances carry
        # ds-precision s/mu that re-polish round chunks must not wipe
        def commit_lo(old_lo):
            return jnp.where(active[None, :], 0.0, old_lo)

        return st._replace(
            it=st.it + 1,
            xc=DS(commit2(xc, st.xc.hi), commit_lo(st.xc.lo)),
            s=DS(commit2(s_, st.s.hi), commit_lo(st.s.lo)),
            mu=DS(commit2(mu, st.mu.hi), commit_lo(st.mu.lo)),
            v=DS(commit2(v, st.v.hi), commit_lo(st.v.lo)),
            x_res_norm=commit(x_res_norm, st.x_res_norm),
            lam_res_norm=commit(lam_res_norm, st.lam_res_norm),
            prim_norm=commit(prim_norm, st.prim_norm),
            dual_norm=commit(dual_norm, st.dual_norm),
            itv=jnp.where(active, st.itv + 1, st.itv),
            done=st.done | (conv & active),
        )

    def make_chunk32(Kc, tau_c, adapt_after=True):
        def chunk_body32_xla(st: _RState) -> _RState:
            st = jax.lax.fori_loop(
                0, Kc, lambda _, s_: iteration32(s_, tau_c), st
            )
            if opts.adaptive_rho and adapt_after:
                st = adapt(st)
            return st

        def chunk_body32_pallas(st: _RState) -> _RState:
            from fcc_qp_tpu.ops.pallas_admm import admm_chunk_pallas32

            rshape = ProblemShape(
                num_vars=k, num_eq=0, nc=nc, lambda_c_start=kb
            )
            inf = jnp.full((nc, B), jnp.inf, f32)
            lb_k = jnp.concatenate([lbc.hi, -inf], axis=0) if nc else lbc.hi
            ub_k = jnp.concatenate([ubc.hi, inf], axis=0) if nc else ubc.hi
            mu_x_in = jnp.concatenate(
                [st.mu.hi[:kb], jnp.zeros((nc, B), f32)], axis=0
            ) if nc else st.mu.hi
            mu_lam_in = st.mu.hi[kb:]
            lam_bar_in = st.s.hi[kb:]

            (x, x_bar, lam_bar, mu_x, mu_lam, v_out, done, _n_iter, itv,
             xrn, lrn, prim, dual) = admm_chunk_pallas32(
                st.Fcc.hi, st.xc_const.hi, lb_k, ub_k, mu_eff.hi,
                st.rho, tau_c, tau_c,
                st.xc.hi, st.s.hi, lam_bar_in, mu_x_in, mu_lam_in, st.v.hi,
                st.done, st.n_iter, st.itv,
                shape=rshape, K=Kc, max_iter=opts.max_iter,
                interpret=pallas_interpret,
                weights=wk, cone_weights=wl,
            )
            s_new = jnp.concatenate([x_bar[:kb], lam_bar], axis=0) if nc else x_bar
            mu_new = jnp.concatenate([mu_x[:kb], mu_lam], axis=0) if nc else mu_x
            # lo words: zeroed for instances the chunk iterated, but
            # preserved for already-frozen ones (polish-accepted state
            # is ds-precision; see iteration32)
            frozen = st.done[None, :]
            kl = lambda old_lo: jnp.where(frozen, old_lo, 0.0)
            st = st._replace(
                it=st.it + Kc,
                xc=DS(x, kl(st.xc.lo)), s=DS(s_new, kl(st.s.lo)),
                mu=DS(mu_new, kl(st.mu.lo)), v=DS(v_out, kl(st.v.lo)),
                x_res_norm=xrn, lam_res_norm=lrn, prim_norm=prim,
                dual_norm=dual, itv=itv, done=done,
            )
            if opts.adaptive_rho and adapt_after:
                st = adapt(st)
            return st

        return chunk_body32_pallas if use_pallas else chunk_body32_xla

    chunk_body = chunk_body_pallas if use_pallas else chunk_body_xla
    chunk_body32 = make_chunk32(K, tau)

    two_phase = coarse_tol > max(opts.eps_bound, opts.eps_fcone)
    do_polish = opts.polish and two_phase

    st = init
    pol = None
    warm_polish = do_polish and polish_seed is not None
    if two_phase:
        def p1_cond(st: _RState):
            return (st.it < n_chunks * K) & ~jnp.all(
                st.done | (st.itv >= opts.max_iter)
            )

        if do_polish:
            from fcc_qp_tpu.ops.polish import polish_reduced

            def attempt(st: _RState, seed, init_class=None):
                p = polish_reduced(
                    qps, shape, ci, kb, st.s, st.mu, st.rho, wk, lbc,
                    ubc, prep.e, opts.eps_bound, opts.eps_fcone,
                    opts.polish_act_tol, opts.polish_newton_steps,
                    seed=seed, init_class=init_class,
                )
                acc = p.accept & ~st.done
                if os.environ.get("FCCQP_ROUNDS_DEBUG"):
                    jax.debug.print(
                        "polish attempt: newly_acc={a} prev_done={d} "
                        "itv_p50~{i}",
                        a=jnp.sum(acc), d=jnp.sum(st.done),
                        i=jnp.median(st.itv),
                    )
                accN = acc[None, :]
                # newly accepted: adopt the polished slack/duals, record
                # residuals and iteration count, mark done (frozen from
                # here on). Rejected: continue iterating.
                st = st._replace(
                    s=ds.where(accN, p.s, st.s),
                    mu=ds.where(accN, p.mu, st.mu),
                    x_res_norm=jnp.where(acc, p.x_res, st.x_res_norm),
                    lam_res_norm=jnp.where(acc, p.lam_res, st.lam_res_norm),
                    n_iter=jnp.where(acc, st.itv, st.n_iter),
                    done=st.done | acc,
                )
                return st, p, acc

            # RETRY attempts run on a capacity-GATHERED sub-batch of
            # the not-yet-accepted instances: a full-batch polish
            # attempt costs ~190 ms at B=4096 (v5e) no matter how few
            # instances still need it, and on warm replay steps the
            # reject set is a handful. The gather is not a correctness
            # cap — instances beyond capacity are retried next round
            # or finished by the exact-operator ds endgame.
            C_r = min(B, max(128, B // 8))

            def _gds(a: DS, idx) -> DS:
                return DS(a.hi[..., idx], a.lo[..., idx])

            def attempt_gathered(st: _RState, pol, n_attempts):
                rem = ~pol.accept & ~st.done & (st.itv < opts.max_iter)
                idx = jnp.argsort(-rem.astype(f32), stable=True)[:C_r]
                sel = rem[idx]
                sub = QPBatchDS(
                    Q=_gds(qps.Q, idx), b=_gds(qps.b, idx),
                    A_eq=_gds(qps.A_eq, idx), b_eq=_gds(qps.b_eq, idx),
                    friction_coeffs=_gds(qps.friction_coeffs, idx),
                    lb=_gds(qps.lb, idx), ub=_gds(qps.ub, idx),
                )
                p = polish_reduced(
                    sub, shape, ci, kb, _gds(st.s, idx),
                    _gds(st.mu, idx), st.rho[idx], wk[:, idx],
                    _gds(lbc, idx), _gds(ubc, idx), prep.e[:, idx],
                    opts.eps_bound, opts.eps_fcone,
                    opts.polish_act_tol, opts.polish_newton_steps,
                    seed=pol.seed[idx], init_class=None,
                )
                acc_s = p.accept & sel
                if os.environ.get("FCCQP_ROUNDS_DEBUG"):
                    jax.debug.print(
                        "polish retry (gathered): pool={r} newly_acc={a}",
                        r=jnp.sum(rem), a=jnp.sum(acc_s),
                    )
                accN = acc_s[None, :]

                def scat_ds(full: DS, sub_v: DS, m_) -> DS:
                    hi = full.hi.at[..., idx].set(
                        jnp.where(m_, sub_v.hi, full.hi[..., idx])
                    )
                    lo = full.lo.at[..., idx].set(
                        jnp.where(m_, sub_v.lo, full.lo[..., idx])
                    )
                    return DS(hi, lo)

                def scat(full, sub_v, m_):
                    return full.at[..., idx].set(
                        jnp.where(m_, sub_v, full[..., idx])
                    )

                st = st._replace(
                    s=scat_ds(st.s, p.s, accN),
                    mu=scat_ds(st.mu, p.mu, accN),
                    x_res_norm=scat(st.x_res_norm, p.x_res, acc_s),
                    lam_res_norm=scat(st.lam_res_norm, p.lam_res, acc_s),
                    n_iter=scat(st.n_iter, st.itv[idx], acc_s),
                    done=st.done.at[idx].set(
                        st.done[idx] | acc_s
                    ),
                )
                selN = sel[None, :]
                pol = pol._replace(
                    x=scat_ds(pol.x, p.x, accN),
                    accept=pol.accept.at[idx].set(
                        pol.accept[idx] | acc_s
                    ),
                    # seed/cls updated for every RETRIED instance (the
                    # pair stays consistent whether or not it accepted)
                    seed=pol.seed.at[idx].set(
                        jnp.where(sel[:, None, None], p.seed,
                                  pol.seed[idx])
                    ),
                    cls=scat(pol.cls, p.cls, selN),
                )
                n_attempts = n_attempts.at[idx].add(
                    sel.astype(jnp.int32)
                )
                return st, pol, n_attempts

        if warm_polish:
            # WARM attempt 0, straight from the warm-start state before
            # any iterations: a replay step drifts the data ~0.1%, so
            # the previous step's classification (carried with its
            # seed) is almost always still exact — one PDAS solve IS
            # the new solution, self-validated at 1e-6. Accepted
            # instances finish with n_iter == 0; this is the TPU analog
            # of the reference's warm path (1 factorization + a handful
            # of iterations, `fcc_qp.cpp:159`, fccqp.pdf Table 1).
            st, pol, acc0 = attempt(
                st, polish_seed, init_class=polish_cls
            )
            pol = pol._replace(accept=acc0)
            n_attempts = jnp.ones((B,), jnp.int32)
            # rejected instances iterate to the coarse point; accepted
            # ones are frozen (lift32/chunks preserve their ds state)

        st = jax.lax.while_loop(p1_cond, chunk_body32, lift32(st))
        if do_polish and warm_polish:
            # coarse-point retry for the warm-rejected instances only,
            # GATHERED (cond-skipped when attempt 0 accepted everyone)
            def attempt1_warm(carry):
                st, pol, n_attempts = carry
                st = st._replace(done=pol.accept)
                return attempt_gathered(st, pol, n_attempts)

            st, pol, n_attempts = jax.lax.cond(
                jnp.all(pol.accept | (st.itv >= opts.max_iter)),
                lambda c: c,
                attempt1_warm,
                (st, pol, n_attempts),
            )
        elif do_polish:
            # attempt 1 at the coarse point (phase-1 done flags meant
            # "crossed tau" — replaced by acceptance below)
            st = st._replace(done=jnp.zeros_like(st.done))
            st, pol, acc1 = attempt(st, polish_seed)
            pol = pol._replace(accept=acc1)
            n_attempts = jnp.ones((B,), jnp.int32)

        if do_polish:
            # re-polish rounds: rejected instances run a short f32
            # chunk at a tighter tolerance (their active set was
            # misread at the coarser point — a few dozen more
            # iterations move the slack enough to re-classify), then a
            # retry polish from the NS-refreshed seed. Entire round is
            # skipped (lax.cond) once everything is accepted — warm
            # replay steps usually accept ~all instances at round 1.
            # `pol.accept` is the cumulative accepted mask; inside a
            # round chunk `done` additionally flags instances that
            # crossed the round tolerance (stop iterating, ready to
            # re-classify) and is reset to the accepted mask before
            # each attempt.
            K2 = opts.polish_interval
            round_chunk_tau = coarse_tol
            for _ in range(opts.polish_rounds - 1):
                # tighter per round, floored where plain-f32 iteration
                # arithmetic can still resolve the residual
                round_chunk_tau = max(
                    round_chunk_tau * 0.125,
                    4.0 * max(opts.eps_bound, opts.eps_fcone),
                    1e-4,
                )
                chunk_r = make_chunk32(
                    K2, jnp.asarray(round_chunk_tau, f32),
                    adapt_after=False,
                )

                def round_body(carry):
                    st, pol, n_attempts = carry
                    acc_mask = pol.accept
                    st = chunk_r(st)
                    st = st._replace(done=acc_mask)
                    return attempt_gathered(st, pol, n_attempts)

                st, pol, n_attempts = jax.lax.cond(
                    jnp.all(pol.accept | (st.itv >= opts.max_iter)),
                    lambda c: c,
                    round_body,
                    (st, pol, n_attempts),
                )
        else:
            # un-done everything: "crossed tau" is not converged
            st = st._replace(done=jnp.zeros_like(st.done))

    # per-phase telemetry: iterations spent so far are the plain-f32
    # phase (approach + polish round chunks); the remainder is the ds
    # endgame
    itv_f32 = st.itv
    if pol is None:
        n_attempts = jnp.zeros((B,), jnp.int32)

    if _lazy_exact(opts):
        # the prepare phase built only the f32 operator (enough for the
        # approach phase + the self-solving PDAS polish); instances the
        # polish never accepted need the ds-exact operator for the
        # 1e-6 endgame — as do instances whose f32 seed never
        # contracted (prep.seed_bad), even if the polish accepted a
        # point for them the endgame will never run. Build it here,
        # cond-gated (a fully accepted batch — the warm-replay common
        # case — skips it entirely) and capacity-gathered onto the
        # needy instances, LOOPING until every one is covered: a capped
        # single pass would leave overflow instances running the 1e-6
        # endgame on an ~1e-3 operator — they converge to the
        # perturbed fixed point and would report kSuccess with ~1e-3
        # true error (silent corruption, not slowness).
        need = ~(st.done | (st.itv >= opts.max_iter))
        if prep.seed_bad is not None:
            need = need | (prep.seed_bad & ~(st.itv >= opts.max_iter))
        # small gather: the common post-polish need set is a handful of
        # instances (warm: ~0.05%, cold at flagship settings: ~2%);
        # the build LOOPS until covered, so capacity only sets the
        # granularity, not a cap
        C3 = min(B, 128)

        def _gl(a: DS, idx) -> DS:
            return DS(a.hi[..., idx], a.lo[..., idx])

        def build_exact(blocks):
            def one_pass(carry):
                (Fcc, xc_const, Fcolj, x_const), rem, n_pass = carry
                idx = jnp.argsort(-rem.astype(f32), stable=True)[:C3]
                sub = QPBatchDS(
                    Q=_gl(qps.Q, idx), b=_gl(qps.b, idx),
                    A_eq=_gl(qps.A_eq, idx), b_eq=_gl(qps.b_eq, idx),
                    friction_coeffs=_gl(qps.friction_coeffs, idx),
                    lb=_gl(qps.lb, idx), ub=_gl(qps.ub, idx),
                )
                Fcc_s, xc_s, Fcol_s, x0_s, _ = _factor_reduced_hybrid(
                    sub, st.rho[idx], ci, mask, opts.kkt_refine_steps + 1
                )
                sel = rem[idx]

                def scat(full: DS, sub_v: DS) -> DS:
                    m_ = sel.reshape((1,) * (full.hi.ndim - 1) + (-1,))
                    hi = full.hi.at[..., idx].set(
                        jnp.where(m_, sub_v.hi, full.hi[..., idx])
                    )
                    lo = full.lo.at[..., idx].set(
                        jnp.where(m_, sub_v.lo, full.lo[..., idx])
                    )
                    return DS(hi, lo)

                out = (scat(Fcc, Fcc_s), scat(xc_const, xc_s),
                       scat(Fcolj, Fcol_s), scat(x_const, x0_s))
                return out, rem.at[idx].set(False), n_pass + 1

            out, _, n_pass = jax.lax.while_loop(
                lambda c: jnp.any(c[1]), one_pass,
                (blocks, need, jnp.int32(0)),
            )
            # observability for pathological steps (a batch-wide bad
            # set — e.g. a data jump hitting every stream at once —
            # runs ceil(need/C3) sequential heavy passes inside this
            # one jitted step; at B=4096, C3=128 that is a multi-
            # second stall that would otherwise be silent). Opt-in
            # (env var, trace-time gate): jax.debug.print is a host
            # callback, which remote-attached runtimes (axon_pjrt)
            # cannot execute at all.
            if os.environ.get("FCCQP_BUILD_DEBUG"):
                jax.lax.cond(
                    n_pass > 1,
                    lambda n: jax.debug.print(
                        "fccqp: lazy-exact operator build took {n} "
                        "sequential gathered passes (need>{c} "
                        "instances); a persistent pattern here means "
                        "the warm stream has frequent data jumps — "
                        "prefer cold solves for those steps",
                        n=n, c=C3,
                    ),
                    lambda n: None,
                    n_pass,
                )
            return out

        Fcc_e, xc_e, Fcol_e, x0_e = jax.lax.cond(
            jnp.any(need), build_exact, lambda b: b,
            (st.Fcc, st.xc_const, st.Fcolj, st.x_const),
        )
        st = st._replace(
            Fcc=Fcc_e, xc_const=xc_e, Fcolj=Fcol_e, x_const=x0_e
        )

    it_budget = (2 * n_chunks * K
                 + (opts.polish_rounds - 1) * opts.polish_interval)

    def chunk_cond(st: _RState):
        return (st.it < it_budget) & ~jnp.all(
            st.done | (st.itv >= opts.max_iter)
        )

    st = jax.lax.while_loop(chunk_cond, chunk_body, st)

    # final full-space primal: re-evaluate the primal update at the v
    # that PRODUCED the accepted xc (a post-update s-mu would take one
    # extra half-step, which at a transient residual dip jumps off the
    # accepted, feasible iterate); one (k -> n) mat-vec, then unscale
    x_s = ds.add(
        st.x_const, ds.mul_f32(matvec_ds(st.Fcolj, st.v), st.rho[None, :])
    )
    if pol is not None:
        # polish-accepted instances take the polished primal directly
        x_s = ds.where(pol.accept[None, :], pol.x, x_s)
    x = ds.mul_f32(x_s, d)

    if nc == 0:
        x_eq = ds.mul_f32(
            kkt_solve_refined_ds(qps.Q, qps.A_eq, ds.neg(qps.b), qps.b_eq), d
        )
        x = ds.where(eq_c[None, :], x_eq, x)
    n_iter = jnp.where(eq_c, 0, st.n_iter)
    xrn = jnp.where(eq_c, zeros_b, st.x_res_norm)
    lrn = jnp.where(eq_c, zeros_b, st.lam_res_norm)

    # violations in UNSCALED units against the original data
    xh = x.hi
    bdiff = xh - jnp.clip(xh, qp.lb.hi, qp.ub.hi)
    bounds_viol = jnp.sqrt(jnp.sum(bdiff * bdiff, axis=0))
    if nc:
        lam = jax.lax.slice_in_dim(xh, ls, ls + nc, axis=0)
        f3 = lam.reshape(nc // 3, 3, B)
        nxy = jnp.sqrt(f3[:, 0] ** 2 + f3[:, 1] ** 2)
        fcone_viol = jnp.sum(
            jnp.maximum(0.0, nxy - qp.friction_coeffs.hi * f3[:, 2]), axis=0
        )
    else:
        fcone_viol = zeros_b

    z = jnp.swapaxes(ds.to_f64(x), 0, 1)
    eq_viol = _eq_residual_inf(qp, x)
    zeros_i = jnp.zeros((B,), jnp.int32)
    accepted = (
        pol.accept.astype(jnp.int32) if pol is not None else zeros_i
    )
    status = _status_checked(n_iter, opts.max_iter, eq_viol, qp)
    if pol is not None:
        # a polish-accepted instance carries a SELF-VALIDATED 1e-6
        # solution (projection-consistency + equality residuals checked
        # in ds at acceptance) — it is kSuccess even when its iteration
        # counter ran to max_iter before the accepting attempt (e.g. an
        # instance that burned its whole budget in the coarse phase and
        # was then rescued by the polish)
        status = jnp.where(
            pol.accept
            & (status == jnp.int32(FCCQPSolveStatus.kMaxIterations)),
            jnp.int32(FCCQPSolveStatus.kSuccess),
            status,
        )
    details = FCCQPDetails(
        n_iter=n_iter,
        admm_residual_bounds=xrn,
        admm_residual_friction_cone=lrn,
        solve_time=zeros_b,
        factorization_time=zeros_b,
        bounds_viol=bounds_viol,
        friction_cone_viol=fcone_viol,
        solve_status=status,
        equality_viol=eq_viol,
        n_iter_f32=jnp.where(eq_c, 0, itv_f32),
        n_iter_ds=jnp.where(eq_c, 0, st.itv - itv_f32),
        polish_attempts=jnp.where(eq_c, 0, n_attempts),
        polish_accepted=jnp.where(eq_c, 0, accepted),
    )

    # warm-start pytree: full-space, UNSCALED (portable across solves
    # whose Ruiz factors differ)
    mu_u = ds.mul_f32(st.mu, wk)  # back to unscaled units
    mu_x_hi = jnp.zeros((nv, B), f32).at[ci[:kb]].set(mu_u.hi[:kb])
    mu_x_lo = jnp.zeros((nv, B), f32).at[ci[:kb]].set(mu_u.lo[:kb])
    new_warm = WarmStartDS(
        x=x,
        mu_x=DS(mu_x_hi, mu_x_lo),
        mu_lambda_c=_seg_tail(mu_u, kb) if nc else ds.zeros((0, B), f32),
        rho=st.rho,
    )
    if with_cache:
        from fcc_qp_tpu.ops.scaling import Scaling

        cache = OperatorCache(
            kkt_seed=prep.kkt_seed,
            polish_seed=pol.seed if pol is not None else None,
            polish_cls=pol.cls if pol is not None else None,
            scales=Scaling(d=prep.d, e=prep.e, c=prep.cost_c),
        )
        return FCCQPSolution(details=details, z=z), new_warm, cache
    return FCCQPSolution(details=details, z=z), new_warm


@partial(
    jax.jit,
    static_argnames=(
        "shape", "opts", "warm_start", "con_idx", "use_pallas",
        "pallas_interpret", "with_cache",
    ),
)
def _solve_ds_reduced_jit(
    qp, warm, shape, opts, warm_start, con_idx,
    use_pallas=False, pallas_interpret=False,
    cache: Optional[OperatorCache] = None, with_cache: bool = False,
):
    """Composed (single-program) reduced solve — used under outer jits
    (replay scans, sharded wrappers). The eager path in
    `solve_batched_ds` runs the two stages as separate dispatches so the
    factorization phase can be wall-clock timed.

    ``cache``/``with_cache``: carried f32 operator seeds for sequential
    replay (`OperatorCache`); with_cache=True returns (sol, warm, cache).
    """
    if len(con_idx) == 0:
        out = _solve_reduced_k0(qp, shape, opts)
        return out + (OperatorCache(),) if with_cache else out
    prep = _prepare_reduced(
        qp, warm, shape, opts, warm_start, con_idx,
        kkt_seed=cache.kkt_seed if cache is not None else None,
        scales=cache.scales if cache is not None else None,
    )
    return _iterate_reduced(
        qp, prep, shape, opts, con_idx, use_pallas, pallas_interpret,
        polish_seed=cache.polish_seed if cache is not None else None,
        with_cache=with_cache,
        polish_cls=cache.polish_cls if cache is not None else None,
    )


_prepare_reduced_jit = partial(
    jax.jit, static_argnames=("shape", "opts", "warm_start", "con_idx")
)(_prepare_reduced)
_iterate_reduced_jit = partial(
    jax.jit,
    static_argnames=(
        "shape", "opts", "con_idx", "use_pallas", "pallas_interpret",
        "with_cache",
    ),
)(_iterate_reduced)


def replay_ds_streams(
    qps: QPBatchDS,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    n_streams: int = 1024,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Warm-started multi-stream replay — BASELINE config 2 semantics at
    batch scale.

    The reference benchmark replays the walking log *serially with warm
    starting* (`/root/reference/fcc_qp_test.py:85-89`): warm solves need
    O(10) iterations where cold ones need hundreds (the paper's
    max_iter=15 hardware config relies on it, `fccqp.pdf` Table 1). The
    TPU-native form: reshape the length-T log into ``n_streams`` parallel
    streams of ``T/S`` consecutive timesteps each (stream ``s`` owns
    global steps ``[s*T/S, (s+1)*T/S)``), solve step 0 of every stream
    cold as ONE batched solve, then `lax.scan` the remaining steps with
    ``warm_start=True`` threading `WarmStartDS` per stream. Each stream
    is exactly the reference's serial warm-started loop; the streams fill
    the chip.

    Returns ``(solutions, final_warm)`` with solutions stacked in GLOBAL
    time order (index ``t`` of the input log). When called eagerly, the
    returned ``details.solve_time`` is the amortized per-step wall time
    (total replay wall / steps — every instance in a step's batch shares
    the program clock) and ``details.factorization_time`` a cached probe
    measurement of the per-step factorization stage.
    """
    T = qps.batch
    S = n_streams
    if T % S != 0:
        raise ValueError(f"T={T} must be a multiple of n_streams={S}")
    steps = T // S

    reduced = (
        opts.scaling or opts.splitting == "constrained" or opts.polish
    )
    con_idx = (
        constrained_indices(qps, shape, full=opts.splitting == "full")
        if reduced
        else None
    )

    # batch-last (..., T) -> (..., steps, S): element [..., t, s] is
    # global timestep s*steps + t
    def resh(a):
        a2 = a.reshape(*a.shape[:-1], S, steps)
        return jnp.swapaxes(a2, -1, -2)

    qps_r = jax.tree.map(resh, qps)
    if isinstance(qps.b.hi, jax.core.Tracer):
        return _replay_streams_jit(
            qps_r, shape, opts, con_idx, use_pallas, pallas_interpret
        )
    t0 = time.perf_counter()
    sols, ws = _replay_streams_jit(
        qps_r, shape, opts, con_idx, use_pallas, pallas_interpret
    )
    _sync_smallest(sols)
    t_total = time.perf_counter() - t0
    factor_t = _factor_probe(qps_r, shape, opts, con_idx)
    return _stamp_times(sols, t_total / steps, factor_t), ws


_FACTOR_PROBE_CACHE: dict = {}


def _factor_probe(qps_r, shape, opts, con_idx) -> float:
    """Measured wall time of one factorization stage on a step-0 slice
    (cached per configuration; compile excluded)."""
    S = qps_r.b.hi.shape[-1]
    key = (shape, opts, con_idx, S)
    if key in _FACTOR_PROBE_CACHE:
        return _FACTOR_PROBE_CACHE[key]
    qp0 = jax.tree.map(
        lambda a: jax.lax.index_in_dim(a, 0, axis=a.ndim - 2, keepdims=False),
        qps_r,
    )
    if con_idx is not None and len(con_idx) > 0:
        run = lambda: _prepare_reduced_jit(
            qp0, None, shape, opts, False, con_idx
        )
    else:
        run = lambda: _prepare_full_jit(qp0, None, shape, opts, False)
    _sync_smallest(run())  # compile
    t0 = time.perf_counter()
    _sync_smallest(run())
    t = time.perf_counter() - t0
    _FACTOR_PROBE_CACHE[key] = t
    return t


@partial(
    jax.jit,
    static_argnames=(
        "shape", "opts", "con_idx", "use_pallas", "pallas_interpret",
    ),
)
def _replay_streams_jit(
    qps_r, shape, opts, con_idx, use_pallas, pallas_interpret
):
    steps = qps_r.b.hi.shape[-2]
    S = qps_r.b.hi.shape[-1]

    def index_t(tree, t):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, t, axis=a.ndim - 2, keepdims=False
            ),
            tree,
        )

    if con_idx is not None and len(con_idx) > 0:
        # reduced path with the operator cache threaded through the
        # scan: consecutive steps refresh the previous step's f32 KKT /
        # polish inverse seeds instead of rebuilding them
        sol0, ws, cache = _solve_ds_reduced_jit(
            index_t(qps_r, 0), None, shape, opts, False, con_idx,
            use_pallas, pallas_interpret, cache=None, with_cache=True,
        )

        def step(carry, t):
            ws, cache = carry
            sol, ws, cache = _solve_ds_reduced_jit(
                index_t(qps_r, t), ws, shape, opts, True, con_idx,
                use_pallas, pallas_interpret, cache=cache,
                with_cache=True,
            )
            return (ws, cache), sol

        if steps > 1:
            (ws, _), sols = jax.lax.scan(
                step, (ws, cache), jnp.arange(1, steps)
            )
        else:
            sols = None
    else:
        sol0, ws = solve_batched_ds(
            index_t(qps_r, 0), shape, opts, warm_start=False,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            con_idx=con_idx,
        )

        def step(ws, t):
            qp = index_t(qps_r, t)
            sol, ws = solve_batched_ds(
                qp, shape, opts, warm=ws, warm_start=True,
                use_pallas=use_pallas, pallas_interpret=pallas_interpret,
                con_idx=con_idx,
            )
            return ws, sol

        if steps > 1:
            ws, sols = jax.lax.scan(step, ws, jnp.arange(1, steps))
        else:
            sols = None

    if sols is not None:
        def to_global(a0, arest):
            # a0 (S, ...) + arest (steps-1, S, ...) -> (T, ...) in global
            # time order (stream-major: out[s*steps + t])
            all_ = jnp.concatenate([a0[None], arest], axis=0)
            allT = jnp.swapaxes(all_, 0, 1)
            return allT.reshape(S * steps, *allT.shape[2:])

        stacked = jax.tree.map(to_global, sol0, sols)
    else:
        stacked = sol0
    return stacked, ws


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

    reduced = opts.scaling or opts.splitting == "constrained"
    con_idx = (
        constrained_indices(qps, shape, full=opts.splitting == "full")
        if reduced
        else None
    )

    def index_t(tree: QPBatchDS, t) -> QPBatchDS:
        return jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, t, 1, axis=a.ndim - 1),
            tree,
        )

    qp0 = index_t(qps, 0)
    sol0, ws = solve_batched_ds(
        qp0, shape, opts, warm_start=False, con_idx=con_idx
    )

    @partial(jax.jit, static_argnames=())
    def step(ws, t):
        qp = index_t(qps, t)
        sol, ws = solve_batched_ds(
            qp, shape, opts, warm=ws, warm_start=True,
            use_pallas=use_pallas, con_idx=con_idx,
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
