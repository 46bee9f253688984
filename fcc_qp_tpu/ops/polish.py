"""OSQP-style active-set polishing for the reduced ds ADMM engine.

The reference solver runs plain ADMM to tolerance
(`/root/reference/src/fcc_qp.cpp:79-110`); its paper credits OSQP's
extra speed to "rho-adaptation + polishing" (`fccqp.pdf` p.6 Table 2).
ADMM contracts linearly, so the tail from ~1e-2 to 1e-6 costs hundreds
of iterations. This module removes that tail the OSQP way, adapted to
the exact second-order cones FCCQP exists for:

1. Run ADMM only to a coarse tolerance (``polish_tol``, cheap f32
   iterations) — enough for the projected slack to identify the active
   set.
2. Classify every constrained coordinate: box at lower/upper bound;
   every friction cone as interior / on the cone surface / at the apex
   (the swing-leg case, lambda = 0).
3. Solve the equality-KKT of the reduced problem — original equalities
   plus pinned bounds, apex pins, and *linearized* cone-surface rows
   g(lambda) = ||lambda_xy|| - mu lambda_z = 0 (degree-1 homogeneous,
   so the linearized rhs is exactly 0) — re-linearizing
   ``polish_newton_steps`` times (an SQP/Newton step through the curved
   cone surface is quadratically convergent).
4. Self-validate per instance: reconstruct the ADMM scaled duals from
   the KKT multipliers (rho * mu = lambda at the ADMM fixed point) and
   require the polished point to pass the SAME projection-consistency
   residual test the plain loop uses, at full eps, in ds precision.
   Any misclassification (wrong pin, degenerate active set, diverged
   refinement) shows up as a large residual and the instance is
   rejected back to the ADMM endgame — polishing can never make a
   result silently worse.

TPU design: the active set is encoded as STATIC-shaped masked rows
(kb box rows + nc cone rows, inactive rows zeroed with a unit diagonal
in the (2,2) block so their multipliers are exactly 0), so one batched
MXU Newton--Schulz factorization serves every instance regardless of
which constraints are active. All dense algebra is batch-last ds with
an f32 MXU inverse seed + ds iterative refinement, mirroring
`ops/ds_linalg.kkt_inverse_f32_seed`.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

import fcc_qp_tpu.ops.ds as ds
from fcc_qp_tpu.ops.ds import DS
from fcc_qp_tpu.ops.ds_linalg import matvec_ds, transpose_ds


class PolishResult(NamedTuple):
    x: DS          # (n, B) polished primal, scaled space
    mu: DS         # (k, B) reconstructed scaled ADMM duals (lambda/rho)
    s: DS          # (k, B) projected slack at the polished point
    accept: Array  # (B,) bool — passed the full-eps residual check
    x_res: Array   # (B,) weighted box residual of the polished point
    lam_res: Array  # (B,) weighted cone residual
    seed: Array    # (B, N2, N2) f32 inverse seed (reusable for retries)
    cls: Array     # (2*kb + 2*ncones, B) bool — the classification the
    #                seed was last refreshed against (pack_classification);
    #                pass back as ``init_class`` so a carried seed and the
    #                round-1 KKT rows always match


class _PCtx(NamedTuple):
    """Batch-dependent data the polish helpers operate on; every leaf
    has the batch as its LAST axis, so the PDAS continuation can gather
    a sub-batch with one trailing-axis index."""

    Q: DS
    b: DS
    A_eq: DS
    b_eq: DS
    fc: DS       # friction coefficients (ncones, B)
    lbc: DS      # (kb, B)
    ubc: DS
    wk: Array    # (k, B) unscaling weights
    rho: Array   # (B,)
    e_scale: Array  # (m, B)


def _gather_ctx(c: _PCtx, idx) -> _PCtx:
    def g(a):
        if isinstance(a, DS):
            return DS(a.hi[..., idx], a.lo[..., idx])
        return a[..., idx]

    return _PCtx(*(g(f) for f in c))


def pack_classification(low, up, surf, apex) -> Array:
    """Pack the four active-set masks into one (2*kb+2*ncones, B) bool
    array for carrying through scan/cache pytrees."""
    return jnp.concatenate([low, up, surf, apex], axis=0)


def unpack_classification(cls: Array, kb: int, ncones: int):
    return (
        cls[:kb],
        cls[kb : 2 * kb],
        cls[2 * kb : 2 * kb + ncones],
        cls[2 * kb + ncones :],
    )


def _cone_geometry(lam3: DS):
    """Per-cone tangential norm and unit direction in ds.

    lam3: (ncones, 3, B) ds. Returns (nxy, gx, gy) with the safe-norm
    guard for the apex (nxy = 0) case.
    """
    fx = DS(lam3.hi[:, 0], lam3.lo[:, 0])
    fy = DS(lam3.hi[:, 1], lam3.lo[:, 1])
    nxy = ds.sqrt(ds.add(ds.mul(fx, fx), ds.mul(fy, fy)))
    safe = ds.where(nxy.hi > 0, nxy, ds.from_f32(jnp.ones_like(nxy.hi)))
    return nxy, ds.div(fx, safe), ds.div(fy, safe)


def classify_branch(
    t: DS,
    lbc: DS,
    ubc: DS,
    mu_eff: DS,
    kb: int,
    nc: int,
    wk: Array,
    inflate: float = 0.0,
):
    """Active-set classification from the PRE-projection point
    ``t = s + mu`` (identically ``x_hat + mu_prev``, the argument the
    ADMM projection is evaluated at).

    The projection branch of t IS the active set: at the ADMM fixed
    point, Pi(t) clips a coordinate to its bound (t outside the box)
    exactly when that bound is active with the correct multiplier sign
    (mu = t - Pi(t)), and Pi_F maps t to the cone surface / apex
    exactly when the cone constraint is active / the force vanishes
    with a polar-cone multiplier. Classifying by branch therefore
    encodes BOTH primal activity and dual sign in one test — the
    primal-dual active-set (semismooth-Newton) rule — with no dual-
    magnitude heuristics. Re-classifying from the polish solve's own
    (x, reconstructed mu) makes the polish a PDAS iteration that
    corrects its own misclassifications.

    ``inflate``: optional proximity margin in UNSCALED units (weights
    ``wk``) applied to the branch boundaries. Used only for the initial
    classification from a coarse ADMM state, where t still carries
    O(residual) error and bounds about to become active are best
    treated as active (the PDAS updates drop wrong guesses). Pass 0
    for exact-branch classification.

    Returns (low, up, surf, apex): low/up (kb, B) bool; surf/apex
    (ncones, B) bool, mutually exclusive; interior = ~(surf|apex).
    """
    B = t.hi.shape[-1]
    if kb:
        tb = t.hi[:kb]
        m = inflate / wk[:kb] if inflate else 0.0
        low = jnp.isfinite(lbc.hi) & (tb < lbc.hi + m)
        up = jnp.isfinite(ubc.hi) & (tb > ubc.hi - m) & ~low
    else:
        low = jnp.zeros((0, B), bool)
        up = jnp.zeros((0, B), bool)
    if nc:
        ncones = nc // 3
        t3 = t.hi[kb:].reshape(ncones, 3, B)
        wt = wk[kb:].reshape(ncones, 3, B)
        fx, fy, fz = t3[:, 0], t3[:, 1], t3[:, 2]
        mu_f = mu_eff.hi
        nxy = jnp.sqrt(fx * fx + fy * fy)
        m = inflate / wt[:, 2] if inflate else 0.0
        inside = mu_f * fz - nxy >= m          # strictly feasible at t
        apex = ~inside & (fz + mu_f * nxy < 0)  # t in the polar cone
        surf = ~inside & ~apex
    else:
        apex = jnp.zeros((0, B), bool)
        surf = jnp.zeros((0, B), bool)
    return low, up, surf, apex


def _curvature_augmented_q(
    Q: DS, eta: Array, lam3: DS, mu_eff: DS, surf: Array, ls: int
) -> DS:
    """Q + sum_j eta_j * grad^2 g_j(lambda_j) — the Lagrangian Hessian.

    Without the cone-surface curvature term the SQP iteration converges
    only LINEARLY (rate ~ eta*curvature / sigma(Q), measured ~0.45 on
    Cassie data); with it Newton is quadratic. For the degree-1
    homogeneous g, grad^2 g = (1/||l_xy||)(I2 - d d') on the tangential
    pair and grad^2 g(l) l = 0 (Euler), so the KKT rhs is UNCHANGED —
    only the (1,1) block gains the four tangential entries per active
    cone. eta is clamped at 0 (active multipliers are nonnegative);
    f32-hi accuracy suffices because the term only steers the Newton
    path, never the fixed point.
    """
    ncones = lam3.hi.shape[0]
    nxy, gx, gy = _cone_geometry(lam3)
    safe_nxy = jnp.where(nxy.hi > 1e-20, nxy.hi, 1.0)
    c = jnp.where(surf, jnp.maximum(eta, 0.0) / safe_nxy, 0.0)
    pxx = c * (1.0 - gx.hi * gx.hi)
    pyy = c * (1.0 - gy.hi * gy.hi)
    pxy = -c * gx.hi * gy.hi
    ix = ls + np.arange(ncones) * 3
    iy = ix + 1
    Qh = (
        Q.hi
        .at[ix, ix].add(pxx)
        .at[iy, iy].add(pyy)
        .at[ix, iy].add(pxy)
        .at[iy, ix].add(pxy)
    )
    return DS(Qh, Q.lo)


def _surf_rows(
    lam3: DS, mu_eff: DS, surf: Array, n: int, ls: int
) -> DS:
    """Masked cone-SURFACE rows (ncones, n, B) ds, linearized at lam3:
    row j = (gx, gy, -mu) at cone j's coordinates when surf_j, else 0.
    (Apex and box pins are handled by row replacement in the (1,1)
    block, not by extra rows — see `polish_reduced`.)"""
    ncones, _, B = lam3.hi.shape
    f32 = lam3.hi.dtype
    _, gx, gy = _cone_geometry(lam3)

    def msk(v: DS) -> DS:
        return DS(jnp.where(surf, v.hi, 0.0), jnp.where(surf, v.lo, 0.0))

    b0, b1, b2 = msk(gx), msk(gy), msk(ds.neg(mu_eff))
    r0 = np.arange(ncones)
    c0 = ls + np.arange(ncones) * 3
    Rh = jnp.zeros((ncones, n, B), f32)
    Rl = jnp.zeros((ncones, n, B), f32)
    for dc, blk in ((0, b0), (1, b1), (2, b2)):
        Rh = Rh.at[r0, c0 + dc].set(blk.hi)
        Rl = Rl.at[r0, c0 + dc].set(blk.lo)
    return DS(Rh, Rl)


def _assemble_m2_f32(Qh: Array, A2h: Array, D: Array) -> Array:
    """Batch-leading (B, N2, N2) f32 assembly of [[Q, A2'],[A2, -D]]."""
    n, _, B = Qh.shape
    m2 = A2h.shape[0]
    N2 = n + m2
    f32 = Qh.dtype
    Qb = jnp.moveaxis(Qh, -1, 0)
    A2b = jnp.moveaxis(A2h, -1, 0)
    Db = jnp.moveaxis(D, -1, 0)
    Mb = jnp.zeros((B, N2, N2), f32)
    Mb = Mb.at[:, :n, :n].set(Qb)
    Mb = Mb.at[:, :n, n:].set(jnp.swapaxes(A2b, -1, -2))
    Mb = Mb.at[:, n:, :n].set(A2b)
    Mb = Mb.at[:, n:, n:].set(
        -Db[:, :, None] * jnp.eye(m2, dtype=f32)
    )
    return Mb


def _assemble_m2_masked(
    Qh_aug: Array, pin: Array, A2h: Array, Dtail: Array
) -> Array:
    """Batch-leading (B, N2, N2) f32 assembly of the ROW-REPLACED
    pinned KKT:

        [[ Z_r Q + diag(pin),  Z_r A2' ],
         [ A2,                 -diag(Dtail) ]]

    with Z_r = diag(1 - pin): a pinned coordinate's row becomes e_i
    (enforcing x_i = v_i via the rhs) while its COLUMN stays intact
    (the pinned value still couples into every other equation). This
    keeps the system at N2 = n + m + ncones — for Cassie 102 <= 128,
    inside the MXU tile, where the symmetric formulation with appended
    pin rows (N2 = 132) fell off the 128 alignment cliff and its
    batched matmuls cost ~50x. The matrix is asymmetric; the
    Newton-Schulz seed uses the transpose start and plain NS steps,
    both of which need no symmetry.
    """
    n, _, B = Qh_aug.shape
    m2 = A2h.shape[0]
    N2 = n + m2
    f32 = Qh_aug.dtype
    Qb = jnp.moveaxis(Qh_aug, -1, 0)              # (B, n, n)
    A2b = jnp.moveaxis(A2h, -1, 0)                # (B, m2, n)
    pinb = jnp.moveaxis(pin, -1, 0)               # (B, n)
    Db = jnp.moveaxis(Dtail, -1, 0)               # (B, m2)
    zr = (1.0 - pinb)[:, :, None]
    TL = zr * Qb + pinb[:, :, None] * jnp.eye(n, dtype=f32)
    TR = zr * jnp.swapaxes(A2b, -1, -2)
    Mb = jnp.zeros((B, N2, N2), f32)
    Mb = Mb.at[:, :n, :n].set(TL)
    Mb = Mb.at[:, :n, n:].set(TR)
    Mb = Mb.at[:, n:, :n].set(A2b)
    Mb = Mb.at[:, n:, n:].set(
        -Db[:, :, None] * jnp.eye(m2, dtype=f32)
    )
    return Mb


def _ns_steps(X: Array, Mb: Array, steps: int) -> Array:
    """Newton-Schulz refresh of an inverse seed against (an updated) M."""
    N2 = Mb.shape[-1]
    hi_p = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi_p)
    eye2 = 2.0 * jnp.eye(N2, dtype=Mb.dtype)
    for _ in range(steps):
        X = mm(X, eye2 - mm(Mb, X))
    return X


def _ns_refresh_guarded(X: Array, Mb: Array, steps: int):
    """Guarded Newton-Schulz refresh of an inverse seed against a moved
    KKT. Per instance, keeps the best-residual iterate seen (NS squares
    the residual DOWN only when < 1; a big row change pushes it above 1
    and the plain iteration diverges). Returns ``(X_best, resid)``."""
    N2 = Mb.shape[-1]
    f32 = Mb.dtype
    hi_p = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi_p)
    eyeN = jnp.eye(N2, dtype=f32)
    eye2 = 2.0 * eyeN

    def resid_inf(P):
        r = jnp.max(jnp.sum(jnp.abs(P - eyeN), axis=-1), axis=-1)
        return jnp.where(jnp.isfinite(r), r, jnp.inf)

    P = mm(Mb, X)
    r_best = resid_inf(P)
    X_best = X
    for _ in range(steps):
        # restart diverged iterates from the best seen (keeps P finite)
        ok = (resid_inf(P) < 1.0)[:, None, None]
        X = jnp.where(ok, X, X_best)
        P = jnp.where(ok, P, mm(Mb, X_best))
        X = mm(X, eye2 - P)
        P = mm(Mb, X)
        r = resid_inf(P)
        better = r < r_best
        X_best = jnp.where(better[:, None, None], X, X_best)
        r_best = jnp.minimum(r, r_best)
    return X_best, r_best


def _seed_refresh_or_rebuild(seed: Array, Mb: Array, steps: int) -> Array:
    """Refresh a carried seed; instances whose refresh does not
    contract (their active-set rows changed by O(1) — exactly the
    retried/re-classified ones, for which Newton-Schulz from the old
    inverse diverges) get a full cold seed rebuild instead.

    The rebuild is capacity-GATHERED but not capacity-capped: each pass
    gathers up to ``max(128, B//8)`` worst-residual instances into a
    sub-batch, rebuilds them cold, and scatters back — and the pass
    LOOPS until every non-contracting instance has been rebuilt (a
    silent cap here would hand capacity-overflow instances a garbage
    seed whose downstream rejection costs hundreds of endgame
    iterations). The whole branch runs under `lax.cond`, so batches
    where every refresh contracts (sequential warm replay, unchanged
    active sets) never pay for it; typical bad sets fit in one pass.
    """
    B = Mb.shape[0]
    X, r = _ns_refresh_guarded(seed, Mb, steps)
    bad = r > 0.3
    C = min(B, max(128, B // 8))

    def rebuild_all(x):
        def body(carry):
            x, rem = carry
            # worst residuals first (stable order for determinism)
            idx = jnp.argsort(-rem.astype(Mb.dtype), stable=True)[:C]
            Xc = _polish_seed_f32(Mb[idx])
            keep = rem[idx][:, None, None]
            x = x.at[idx].set(jnp.where(keep, Xc, x[idx]))
            rem = rem.at[idx].set(False)
            return x, rem

        x, _ = jax.lax.while_loop(
            lambda c: jnp.any(c[1]), body, (x, bad)
        )
        return x

    return jax.lax.cond(jnp.any(bad), rebuild_all, lambda x: x, X)


def _polish_seed_f32(Mb: Array, ns_iters: int = 40) -> Array:
    """f32 MXU inverse seed of ``M2 = [[Q, A2'],[A2, -D]]`` (batch-last
    hi words in, batch-leading (B, N2, N2) seed out).

    The polish KKT has NO rho regularization (Q alone is near-singular
    on OSC data), so the explicit-Schur construction used for the ADMM
    operator (`kkt_inverse_f32_seed`) is destroyed by cancellation here:
    ``F = Hinv - W Sinv W'`` subtracts two O(1/delta) terms to get an
    O(||M2^-1||) result, losing ~delta^-1 * eps_f32 absolute accuracy
    (measured: residual ~1e3 at delta=1e-5). Instead this inverts the
    full symmetric-indefinite M2 directly by Newton--Schulz with the
    Frobenius-normalized transpose seed X0 = M2 / ||M2||_F^2 — valid for
    indefinite symmetric matrices because the residual eigenvalues are
    1 - lambda_i^2/||M||_F^2 in (0, 1) — which converges in
    ~2 log2(||M||_F/sigma_min) + O(1) iterations and has NO cancellation
    amplification: the f32 floor is ~eps * kappa(M2) (~1e-3 on Ruiz-
    equilibrated OSC KKTs), exactly what the downstream ds refinement
    needs. Singular M2 (degenerate active sets) leaves the residual at
    ~1 and the instance is rejected by the acceptance test.
    """
    N2 = Mb.shape[-1]
    f32 = Mb.dtype
    hi_p = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi_p)

    fro2 = jnp.sum(Mb * Mb, axis=(-1, -2))
    # transpose seed: valid for symmetric AND the row-replaced
    # (asymmetric) pinned KKT — residual eigenvalues of I - X0 M are
    # 1 - sigma_i^2/||M||_F^2 in (0, 1) either way
    X = jnp.swapaxes(Mb, -1, -2) / jnp.maximum(fro2, 1e-30)[:, None, None]
    eye2 = 2.0 * jnp.eye(N2, dtype=f32)

    # Mixed precision, chosen against the TPU MXU precision ladder:
    # the approach phase runs at HIGH (3-pass bf16, eps ~ 2e-6:
    # kappa * eps ~ 2e-3 < 1 for Ruiz-equilibrated OSC KKTs, so NS
    # still contracts) and the final quadratic steps at HIGHEST
    # (6-pass, the f32 floor). DEFAULT (single bf16 pass, eps ~ 4e-3)
    # is a trap: kappa * eps > 1 and NS does not contract AT ALL —
    # the approach phase then does nothing and the few HIGHEST steps
    # can't recover from the Frobenius seed, leaving an O(1)-residual
    # inverse that silently destroys every downstream polish solve
    # (measured on v5e: polish acceptance 15% vs 100% on CPU, where
    # DEFAULT is true f32).
    mm_hi = lambda a, b: jnp.matmul(a, b, precision="high")
    tail = min(6, ns_iters)

    def body_hi(_, X):
        return mm_hi(X, eye2 - mm_hi(Mb, X))

    def body(_, X):
        return mm(X, eye2 - mm(Mb, X))

    X = jax.lax.fori_loop(0, ns_iters - tail, body_hi, X)
    X = jax.lax.fori_loop(0, tail, body, X)

    if os.environ.get("FCCQP_POLISH_DEBUG"):
        R = jnp.eye(N2, dtype=f32) - mm(Mb, X)
        jax.debug.print(
            "polish seed residual: {r}",
            r=jnp.max(jnp.abs(R), axis=(-1, -2)),
        )
    return X


def _solve_structured_masked(
    X32: Array, Q: DS, pin: Array, A2: DS, A2t: DS, Dtail: Array,
    r1: DS, r2: DS, passes: int = 3,
) -> tuple[DS, DS, DS]:
    """Refined ds solve of the row-replaced pinned KKT
    (`_assemble_m2_masked` structure) — never materializes the
    (N2, N2, B) ds matrix; applies blocks + masks directly.

    Refinement is mixed-cost: the early passes compute residuals with
    HIGHEST-precision MXU matmuls against the ds KKT blocks (cheap,
    ~1e-7-relative residual accuracy — plenty while the iterate error
    is >> that), and only the FINAL pass pays for the exact
    error-free-transform ds mat-vecs (latency-bound fori chains) whose
    residual exactness sets the converged accuracy.

    Returns ``(x, y, raw)`` where ``raw = Q x + A2' y`` in ds from the
    final exact pass — the stationarity evaluation the caller needs to
    recover the multipliers of the row-replaced (pinned) coordinates
    for free. (raw is evaluated at the pre-final-correction iterate;
    the final correction is O(solver floor), far below any tolerance
    it is used against.)
    """
    n = Q.hi.shape[0]
    hi_p = jax.lax.Precision.HIGHEST
    pinN = pin[:, None] if pin.ndim == 1 else pin   # (n, B)

    def apply32(t_hi: Array, b_hi: Array):
        v = jnp.concatenate([t_hi, b_hi], axis=0)     # (N2, B)
        out = jnp.matmul(
            X32, jnp.moveaxis(v, -1, 0)[:, :, None], precision=hi_p
        )[:, :, 0]
        out = jnp.moveaxis(out, 0, -1)
        return out[:n], out[n:]

    def m2_apply(x: DS, y: DS):
        raw = ds.add(matvec_ds(Q, x), matvec_ds(A2, y))
        top = ds.where(pinN > 0, x, raw)
        bot = ds.sub(matvec_ds(A2t, x), ds.mul_f32(y, Dtail))
        return top, bot, raw

    # cheap-residual operator: batched MXU matmuls against the ds KKT
    # blocks, hi/lo cross terms included so the residual reflects the
    # full ds operator at f32-matmul accuracy
    Qb_hi = jnp.moveaxis(Q.hi, -1, 0)
    Qb_lo = jnp.moveaxis(Q.lo, -1, 0)
    A2b_hi = jnp.moveaxis(A2.hi, -1, 0)
    A2b_lo = jnp.moveaxis(A2.lo, -1, 0)
    A2tb_hi = jnp.swapaxes(A2b_hi, -1, -2)
    A2tb_lo = jnp.swapaxes(A2b_lo, -1, -2)

    def m2_apply_f32(x: DS, y: DS):
        mm = lambda a, b: jnp.matmul(a, b, precision=hi_p)
        xb_hi = jnp.moveaxis(x.hi, -1, 0)[:, :, None]
        xb = xb_hi + jnp.moveaxis(x.lo, -1, 0)[:, :, None]
        yb_hi = jnp.moveaxis(y.hi, -1, 0)[:, :, None]
        yb = yb_hi + jnp.moveaxis(y.lo, -1, 0)[:, :, None]
        raw = (
            mm(Qb_hi, xb) + mm(Qb_lo, xb_hi)
            + mm(A2tb_hi, yb) + mm(A2tb_lo, yb_hi)
        )[:, :, 0]
        raw = jnp.moveaxis(raw, 0, -1)
        top = jnp.where(pinN > 0, x.hi + x.lo, raw)
        bot = (mm(A2b_hi, xb) + mm(A2b_lo, xb_hi))[:, :, 0]
        bot = jnp.moveaxis(bot, 0, -1) - Dtail * (y.hi + y.lo)
        return top, bot

    xh, yh = apply32(r1.hi, r2.hi)
    x, y = ds.from_f32(xh), ds.from_f32(yh)
    raw = None
    for p in range(passes):
        if p + 1 < passes:
            txh, tyh = m2_apply_f32(x, y)
            rx = ds.sub(r1, ds.from_f32(txh))
            ry = ds.sub(r2, ds.from_f32(tyh))
        else:
            tx, ty, raw = m2_apply(x, y)
            rx = ds.sub(r1, tx)
            ry = ds.sub(r2, ty)
        dxh, dyh = apply32(rx.hi, ry.hi)
        x = ds.add(x, ds.from_f32(dxh))
        y = ds.add(y, ds.from_f32(dyh))
    return x, y, raw


def polish_reduced(
    qps,                    # scaled QPBatchDS
    shape,
    ci: np.ndarray,         # (k,) constrained coordinate indices
    kb: int,                # box-constrained count (cone tail follows)
    s: DS,                  # (k, B) projected slack (scaled)
    mu_dual: DS,            # (k, B) scaled ADMM duals (classification)
    rho: Array,             # (B,) scaled-space penalty
    wk: Array,              # (k, B) unscaling weights d[ci]
    lbc: DS, ubc: DS,       # (kb, B) scaled bounds
    e_scale: Array,         # (m, B) equality-row scales (unscale resid)
    eps_bound: float,
    eps_fcone: float,
    act_tol: float,
    newton_steps: int = 2,
    seed: Array | None = None,
    init_class: Array | None = None,
) -> PolishResult:
    """Attempt an active-set polish of every instance in the batch.

    See the module docstring for the algorithm. All inputs/outputs live
    in the SCALED problem space; acceptance residuals are weighted back
    to unscaled units (``wk``, ``e_scale``) so the eps contract matches
    the plain ADMM path.

    ``seed``: optional (B, N2, N2) f32 inverse seed from a previous
    polish attempt (returned as ``PolishResult.seed``). Re-polish
    retries pass it back so the seed build is a handful of
    Newton--Schulz refresh steps against the re-classified KKT instead
    of the full cold iteration — the active set of a retried instance
    moved only a few rows, which NS absorbs quadratically.

    ``init_class``: optional packed classification
    (`pack_classification`) to use for the round-1 assembly instead of
    classifying fresh from ``t = s + mu``. MUST accompany a carried
    ``seed``: the seed is an inverse of the KKT assembled from the rows
    of the classification it was last refreshed against
    (`PolishResult.cls`), and re-deriving the round-1 classification
    from an inflated fresh branch read flips near-boundary rows O(1)
    relative to that — every such flip defeats the Newton-Schulz
    refresh and forces a cold rebuild (the round-3 warm-replay
    regression: systematic seed/rows mismatch on every replay step).
    With the carried classification the PDAS loop itself performs any
    re-classification, refreshing the seed consistently as it goes.
    """
    from fcc_qp_tpu.core.ds_engine import project_cone_ds

    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    m = qps.A_eq.hi.shape[0]
    B = s.hi.shape[-1]
    f32 = s.hi.dtype
    k = kb + nc
    ncones = nc // 3 if nc else 0
    p = kb + nc
    mu_eff = qps.friction_coeffs

    # initial classification: projection branch of the exact ADMM
    # pre-projection point t = s + mu, inflated by act_tol (t still
    # carries O(coarse residual) error); PDAS re-classifications below
    # use the exact branch (inflate=0). A carried classification
    # (see ``init_class`` above) replaces the fresh read.
    t0 = ds.add(s, mu_dual)
    if init_class is None:
        low, up, surf, apex = classify_branch(
            t0, lbc, ubc, mu_eff, kb, nc, wk, inflate=act_tol
        )
    else:
        low, up, surf, apex = unpack_classification(
            init_class, kb, ncones
        )

    ci_box = np.asarray(ci[:kb])

    # --- batch-data context: every helper below takes it explicitly so
    # the PDAS continuation can run on capacity-GATHERED sub-batches
    # (at batch scale a handful of re-classified instances must not
    # trigger full-batch (B, N2, N2) work per PDAS step — measured
    # ~150 ms/step at B=4096 on v5e for ~6 changed instances) ---
    ctx = _PCtx(
        Q=qps.Q, b=qps.b, A_eq=qps.A_eq, b_eq=qps.b_eq,
        fc=mu_eff, lbc=lbc, ubc=ubc, wk=wk, rho=rho, e_scale=e_scale,
    )

    def build_pins(c: _PCtx, low, up, apex):
        """Pin mask + pinned values over the n coordinates: active box
        coordinates pinned to their bound, apex cones' three
        coordinates pinned to 0. (Box coordinates and the cone segment
        are disjoint by the reduced-engine ordering.)"""
        Bc = c.b.hi.shape[-1]
        pin = jnp.zeros((nv, Bc), f32)
        pv_hi = jnp.zeros((nv, Bc), f32)
        pv_lo = jnp.zeros((nv, Bc), f32)
        if kb:
            # static-index scatters, NOT a selection-matrix einsum: on
            # TPU an einsum at default precision is a bf16 MXU pass
            # that would round the pinned bound VALUES to an 8-bit
            # mantissa (~1e-3 relative) — every pinned coordinate then
            # misses its bound by that much and the polish acceptance
            # test rejects the whole instance. Scatters are exact.
            # (Box coordinates and the cone segment are disjoint.)
            act_box = (low | up).astype(f32)
            pin = pin.at[ci_box].set(act_box)
            vb = ds.where(
                low, c.lbc,
                ds.where(up, c.ubc, ds.zeros((kb, Bc), f32)),
            )
            vb = ds.where((low | up), vb, ds.zeros((kb, Bc), f32))
            pv_hi = pv_hi.at[ci_box].set(vb.hi)
            pv_lo = pv_lo.at[ci_box].set(vb.lo)
        if nc:
            apex3 = jnp.repeat(apex.astype(f32), 3, axis=0)  # (nc, Bc)
            pin = pin.at[ls:ls + nc].add(apex3)
        return pin, DS(pv_hi, pv_lo)

    def reconstruct_duals(c: _PCtx, x, y, raw, low, up, surf, apex):
        """rho * mu = lambda at the ADMM fixed point.

        Surface multipliers come from the solve's y tail; multipliers
        of the row-replaced pins come for free from the stationarity
        evaluation ``raw = Q x + A2' y`` the final refinement pass
        already computed: y_pin = -(raw + b) at the pinned coordinate.
        """
        Bc = c.b.hi.shape[-1]
        w = ds.add(raw, c.b)                         # (n, Bc)
        if kb:
            w_box = DS(w.hi[ci_box], w.lo[ci_box])
            lam_box = ds.where(
                (low | up), ds.neg(w_box), ds.zeros((kb, Bc), f32)
            )
        else:
            lam_box = ds.zeros((0, Bc), f32)
        if nc:
            lam_fin = DS(
                x.hi[ls:ls + nc].reshape(ncones, 3, Bc),
                x.lo[ls:ls + nc].reshape(ncones, 3, Bc),
            )
            _, gx, gy = _cone_geometry(lam_fin)
            eta_f = DS(y.hi[m:], y.lo[m:])           # (ncones, Bc)
            w3 = DS(
                w.hi[ls:ls + nc].reshape(ncones, 3, Bc),
                w.lo[ls:ls + nc].reshape(ncones, 3, Bc),
            )

            def cone_coord(i, gcomp: DS) -> DS:
                wi = DS(w3.hi[:, i], w3.lo[:, i])
                surf_val = ds.mul(eta_f, gcomp)
                return ds.where(
                    surf, surf_val,
                    ds.where(
                        apex, ds.neg(wi), ds.zeros((ncones, Bc), f32)
                    ),
                )

            lx = cone_coord(0, gx)
            ly = cone_coord(1, gy)
            lz = cone_coord(2, ds.neg(c.fc))
            lam_cone = DS(
                jnp.stack([lx.hi, ly.hi, lz.hi], axis=1).reshape(nc, Bc),
                jnp.stack([lx.lo, ly.lo, lz.lo], axis=1).reshape(nc, Bc),
            )
            lam_all = _concat0(lam_box, lam_cone)
        else:
            lam_all = lam_box
        return ds.mul_f32(lam_all, 1.0 / c.rho[None, :])

    if nc:
        lam_lin = DS(
            s.hi[kb:].reshape(ncones, 3, B),
            s.lo[kb:].reshape(ncones, 3, B),
        )
        # initial surface-multiplier estimate from the ADMM duals:
        # lambda = rho*mu ~ eta * grad g, so eta0 = rho <mu, grad g> /
        # ||grad g||^2 with ||grad g||^2 = 1 + mu_f^2 on the surface
        mu3 = mu_dual.hi[kb:].reshape(ncones, 3, B)
        _, gx0, gy0 = _cone_geometry(lam_lin)
        dot0 = (
            mu3[:, 0] * gx0.hi + mu3[:, 1] * gy0.hi
            - mu3[:, 2] * mu_eff.hi
        )
        eta = rho[None, :] * dot0 / (1.0 + mu_eff.hi * mu_eff.hi)
    else:
        lam_lin = None
        eta = None

    # --- PDAS loop: each step solves the equality-KKT of the current
    # active-set guess, reconstructs the ADMM duals from the KKT
    # multipliers, and re-classifies from the branch of t = x + mu —
    # dropping pins with wrong-sign multipliers and adding violated
    # ones — while re-linearizing the curved cone rows (SQP). Wrong
    # initial guesses are corrected instead of rejected.
    #
    # The loop is a lax.while_loop with a CHANGE-DRIVEN exit: it stops
    # as soon as no instance's classification flipped AND no cone
    # linearization point moved materially — so a warm batch (correct
    # classification inherited from the previous timestep) pays for
    # exactly ONE solve, while a cold batch runs up to `newton_steps`.
    ci_np = np.asarray(ci)

    def assemble(c: _PCtx, low, up, surf, apex, lam_lin, eta):
        Bc = c.b.hi.shape[-1]
        if nc:
            Rsurf = _surf_rows(lam_lin, c.fc, surf, nv, ls)
            Q_aug = _curvature_augmented_q(
                c.Q, eta, lam_lin, c.fc, surf, ls
            )
            Dtail = jnp.concatenate(
                [jnp.zeros((m, Bc), f32), 1.0 - surf.astype(f32)],
                axis=0,
            )
        else:
            Rsurf = ds.zeros((0, nv, Bc), f32)
            Q_aug = c.Q
            Dtail = jnp.zeros((m, Bc), f32)
        pin, pv = build_pins(c, low, up, apex)
        A2 = _concat_rows(c.A_eq, Rsurf)
        r1 = ds.where(pin > 0, pv, ds.neg(c.b))
        r2 = _concat0(c.b_eq, ds.zeros((ncones if nc else 0, Bc), f32))
        return Q_aug, pin, A2, transpose_ds(A2), Dtail, r1, r2

    def next_classification(c: _PCtx, x, y, mu_new, lam_lin, eta):
        Bc = c.b.hi.shape[-1]
        xc_s = DS(x.hi[ci_np], x.lo[ci_np])
        t_s = ds.add(xc_s, mu_new)
        nlow, nup, nsurf, napex = classify_branch(
            t_s, c.lbc, c.ubc, c.fc, kb, nc, c.wk, inflate=0.0
        )
        if nc:
            nlam = DS(
                x.hi[ls:ls + nc].reshape(ncones, 3, Bc),
                x.lo[ls:ls + nc].reshape(ncones, 3, Bc),
            )
            neta = y.hi[m:]
        else:
            nlam, neta = lam_lin, eta
        return nlow, nup, nsurf, napex, nlam, neta

    def changed_per_instance(c: _PCtx, low, up, surf, apex, lam_lin,
                             nlow, nup, nsurf, napex, nlam):
        """(Bc,) bool — instances whose classification flipped or whose
        cone linearization point moved materially."""
        Bc = c.b.hi.shape[-1]
        flips = jnp.zeros((Bc,), bool)
        if kb:
            flips = flips | jnp.any(nlow != low, axis=0) | jnp.any(
                nup != up, axis=0
            )
        if nc:
            flips = flips | jnp.any(nsurf != surf, axis=0) | jnp.any(
                napex != apex, axis=0
            )
            wl3 = c.wk[kb:].reshape(ncones, 3, Bc)
            moved = jnp.any(
                jnp.max(jnp.abs(nlam.hi - lam_lin.hi) * wl3, axis=1)
                > 1e-4,
                axis=0,
            )
            flips = flips | moved
        return flips

    ci_arr = np.asarray(ci)

    def accept_eval(c: _PCtx, x: DS, mu_new: DS):
        """Projection-consistency + equality acceptance residuals of a
        candidate (x, mu) — the SAME test the plain ADMM loop uses, at
        full eps, in ds, weighted back to unscaled units. Returns
        (s_new, x_res, lam_res, eq_res, score) where score is the
        max residual/eps ratio (inf for non-finite candidates)."""
        Bc = c.b.hi.shape[-1]
        zb = jnp.zeros((Bc,), f32)
        xc = DS(x.hi[ci_arr], x.lo[ci_arr])
        t = ds.add(xc, mu_new)
        parts = []
        if kb:
            parts.append(
                ds.clip(DS(t.hi[:kb], t.lo[:kb]), c.lbc, c.ubc)
            )
        if nc:
            parts.append(
                project_cone_ds(DS(t.hi[kb:], t.lo[kb:]), c.fc)
            )
        s_new = (
            parts[0] if len(parts) == 1 else _concat0(parts[0], parts[1])
        )
        res = ds.sub(xc, s_new)
        wres = jnp.abs(res.hi) * c.wk
        x_res = jnp.max(wres[:kb], axis=0) if kb else zb
        lam_res = jnp.max(wres[kb:], axis=0) if nc else zb
        r_eq = ds.sub(matvec_ds(transpose_ds(c.A_eq), x), c.b_eq)
        eq_res = (
            jnp.max(jnp.abs(r_eq.hi) / c.e_scale, axis=0)
            if m else zb
        )
        finite = (
            jnp.all(jnp.isfinite(x.hi), axis=0)
            & jnp.all(jnp.isfinite(mu_new.hi), axis=0)
        )
        score = jnp.maximum(
            jnp.maximum(x_res / eps_bound, lam_res / eps_fcone),
            eq_res / eps_bound,
        )
        score = jnp.where(finite, score, jnp.inf)
        return s_new, x_res, lam_res, eq_res, score

    # first solve, FULL batch (seed build / external-seed refresh)
    Q_aug, pin, A2, A2t, Dtail, r1, r2 = assemble(
        ctx, low, up, surf, apex, lam_lin, eta
    )
    Mb = _assemble_m2_masked(Q_aug.hi, pin, A2.hi, Dtail)
    if seed is None:
        X32 = _polish_seed_f32(Mb)
    else:
        # retry / replay: refresh the carried seed, rebuilding per
        # instance where the active set moved too far. Two guarded
        # steps suffice: a replay-drift (~0.1%) residual collapses
        # quadratically, and anything bigger is rebuild territory.
        X32 = _seed_refresh_or_rebuild(seed, Mb, 2)
    x, y, raw = _solve_structured_masked(
        X32, Q_aug, pin, A2, A2t, Dtail, r1, r2
    )
    mu_new = reconstruct_duals(ctx, x, y, raw, low, up, surf, apex)
    # per-instance classification the seed was last refreshed against —
    # carried out as PolishResult.cls so the next attempt's round-1
    # rows match the carried seed exactly
    used_cls = pack_classification(low, up, surf, apex)
    s_new, x_res, lam_res, eq_res, score = accept_eval(ctx, x, mu_new)
    # best-iterate tracking across PDAS steps: a cold/degenerate
    # instance's classification can CYCLE between near-equivalent
    # active sets; taking the last iterate would then be a lottery.
    # Every PDAS step is acceptance-scored and the per-instance best
    # (x, mu, s, cls, residuals) is what the attempt returns — if ANY
    # visited classification is correct, the attempt accepts.
    best = (x, mu_new, s_new, used_cls, x_res, lam_res, score)

    if newton_steps > 1:
        nlow, nup, nsurf, napex, nlam, neta = next_classification(
            ctx, x, y, mu_new, lam_lin, eta
        )
        changed_i = changed_per_instance(
            ctx, low, up, surf, apex, lam_lin, nlow, nup, nsurf, napex,
            nlam,
        )
        # an already-acceptable instance (score < 1) needs no further
        # PDAS steps — freezing it both saves seed maintenance and
        # keeps its best iterate from being displaced
        changed_i = changed_i & (score > 1.0)

        # --- PDAS continuation. Step 2 runs FULL-batch (cond-gated):
        # after a warm-start or coarse-point first solve, most
        # instances need exactly one re-linearization solve (the cone
        # rows were linearized at the pre-solve point; the SQP error
        # of solve 1 is quadratic in the drift but still above 1e-6),
        # so a single fused full-batch pass is cheaper than pumping
        # ~everyone through the gathered pool. Steps 3+ then run on
        # capacity-gathered SUB-BATCHES of the still-changing
        # instances: at that point the pool is a handful of hard
        # instances, and a full-batch PDAS step costs ~150 ms at
        # B=4096 (v5e) regardless of pool size. Instances stay in the
        # pool until their classification stops changing, they become
        # acceptable, or they exhaust their newton_steps budget — so
        # total work tracks the work actually needed, cold or warm.
        C2 = min(B, max(128, B // 8))
        steps_i = jnp.ones((B,), jnp.int32)

        # commit the post-solve-1 re-classification into the carried
        # state for still-changing instances BEFORE entering the
        # continuation — mirroring the end-of-pass update inside
        # full_pass/body. Without this the first continuation pass
        # re-assembles and re-solves the identical system as solve 1,
        # discarding the re-linearization and burning one newton step
        # (at newton_steps=2 the continuation would never apply a
        # re-classified solve at all). `used_cls` stays at the OLD
        # classification — the carried X32 seed still corresponds to
        # it; the loop's seed refresh handles the row flips.
        chN = changed_i[None, :]
        low = jnp.where(chN, nlow, low)
        up = jnp.where(chN, nup, up)
        surf = jnp.where(chN, nsurf, surf)
        apex = jnp.where(chN, napex, apex)
        if nc:
            ch3 = changed_i[None, None, :]
            lam_lin = DS(
                jnp.where(ch3, nlam.hi, lam_lin.hi),
                jnp.where(ch3, nlam.lo, lam_lin.lo),
            )
            eta = jnp.where(chN, neta, eta)

        carry0 = (
            changed_i, steps_i,
            low, up, surf, apex, lam_lin, eta,
            X32, best, used_cls,
        )

        def cond(st):
            changed, steps = st[0], st[1]
            return jnp.any(changed & (steps < newton_steps))

        def full_pass(st):
            (changed, steps, low, up, surf, apex, lam_lin, eta,
             X32, best, seed_cls) = st
            rem = changed & (steps < newton_steps)
            Q_aug, pin, A2, A2t, Dtail, r1_f, r2_f = assemble(
                ctx, low, up, surf, apex, lam_lin, eta
            )
            Mb_f = _assemble_m2_masked(Q_aug.hi, pin, A2.hi, Dtail)
            # full-batch refresh: unchanged instances' rows are
            # identical, their refresh contracts trivially
            X32 = _seed_refresh_or_rebuild(X32, Mb_f, 2)
            fx, fy, raw = _solve_structured_masked(
                X32, Q_aug, pin, A2, A2t, Dtail, r1_f, r2_f
            )
            fmu = reconstruct_duals(
                ctx, fx, fy, raw, low, up, surf, apex
            )
            f_cls = pack_classification(low, up, surf, apex)
            f_snew, f_xr, f_lr, _er, f_score = accept_eval(
                ctx, fx, fmu
            )
            (bx, bmu, bs, bcls, bxr, blr, bscore) = best
            better = rem & (f_score < bscore)
            bN = better[None, :]
            best = (
                ds.where(bN, fx, bx),
                ds.where(bN, fmu, bmu),
                ds.where(bN, f_snew, bs),
                jnp.where(bN, f_cls, bcls),
                jnp.where(better, f_xr, bxr),
                jnp.where(better, f_lr, blr),
                jnp.where(better, f_score, bscore),
            )
            nlow, nup, nsurf, napex, nlam, neta = next_classification(
                ctx, fx, fy, fmu, lam_lin, eta
            )
            changed_n = changed_per_instance(
                ctx, low, up, surf, apex, lam_lin,
                nlow, nup, nsurf, napex, nlam,
            ) & (f_score > 1.0)
            remN = rem[None, :]
            low = jnp.where(remN, nlow, low)
            up = jnp.where(remN, nup, up)
            surf = jnp.where(remN, nsurf, surf)
            apex = jnp.where(remN, napex, apex)
            if nc:
                rem3 = rem[None, None, :]
                lam_lin = DS(
                    jnp.where(rem3, nlam.hi, lam_lin.hi),
                    jnp.where(rem3, nlam.lo, lam_lin.lo),
                )
                eta = jnp.where(remN, neta, eta)
            seed_cls = jnp.where(remN, f_cls, seed_cls)
            steps = steps + rem.astype(jnp.int32)
            changed = jnp.where(rem, changed_n, changed)
            return (changed, steps, low, up, surf, apex, lam_lin, eta,
                    X32, best, seed_cls)

        # full-batch step 2 only when the pool is larger than the
        # gather capacity (cold solves re-classify ~everyone once);
        # smaller pools go straight to the gathered loop
        pool0 = jnp.sum((changed_i & (steps_i < newton_steps))
                        .astype(jnp.int32))
        carry0 = jax.lax.cond(pool0 > C2, full_pass,
                              lambda st: st, carry0)

        def body(st):
            (changed, steps, low, up, surf, apex, lam_lin, eta,
             X32, best, seed_cls) = st
            rem = changed & (steps < newton_steps)
            idx = jnp.argsort(-rem.astype(f32), stable=True)[:C2]
            sel = rem[idx]                               # (C2,)
            c = _gather_ctx(ctx, idx)

            gb = lambda a: a[..., idx]                   # bool/float masks

            def gd(a: DS) -> DS:
                return DS(a.hi[..., idx], a.lo[..., idx])

            s_low, s_up = gb(low), gb(up)
            s_surf, s_apex = gb(surf), gb(apex)
            s_lam = gd(lam_lin) if nc else lam_lin
            s_eta = gb(eta) if nc else eta
            sX = X32[idx]

            # one PDAS step on the sub-batch
            Q_aug, pin, A2, A2t, Dtail, r1_s, r2_s = assemble(
                c, s_low, s_up, s_surf, s_apex, s_lam, s_eta
            )
            Mb_s = _assemble_m2_masked(Q_aug.hi, pin, A2.hi, Dtail)
            sX = _seed_refresh_or_rebuild(sX, Mb_s, 2)
            sx, sy, raw = _solve_structured_masked(
                sX, Q_aug, pin, A2, A2t, Dtail, r1_s, r2_s
            )
            smu = reconstruct_duals(
                c, sx, sy, raw, s_low, s_up, s_surf, s_apex
            )
            s_cls = pack_classification(s_low, s_up, s_surf, s_apex)
            s_snew, s_xr, s_lr, _s_er, s_score = accept_eval(c, sx, smu)

            # best update on the gathered slots
            (bx, bmu, bs, bcls, bxr, blr, bscore) = best
            better = sel & (s_score < bscore[idx])
            bN = better[None, :]

            def upd_ds(full: DS, sub: DS) -> DS:
                hi = full.hi.at[..., idx].set(
                    jnp.where(bN, sub.hi, full.hi[..., idx])
                )
                lo = full.lo.at[..., idx].set(
                    jnp.where(bN, sub.lo, full.lo[..., idx])
                )
                return DS(hi, lo)

            best = (
                upd_ds(bx, sx),
                upd_ds(bmu, smu),
                upd_ds(bs, s_snew),
                bcls.at[..., idx].set(
                    jnp.where(bN, s_cls, bcls[..., idx])
                ),
                bxr.at[idx].set(jnp.where(better, s_xr, bxr[idx])),
                blr.at[idx].set(jnp.where(better, s_lr, blr[idx])),
                bscore.at[idx].set(
                    jnp.minimum(jnp.where(sel, s_score, jnp.inf),
                                bscore[idx])
                ),
            )

            nlow_s, nup_s, nsurf_s, napex_s, nlam_s, neta_s = (
                next_classification(c, sx, sy, smu, s_lam, s_eta)
            )
            changed_s = changed_per_instance(
                c, s_low, s_up, s_surf, s_apex, s_lam,
                nlow_s, nup_s, nsurf_s, napex_s, nlam_s,
            ) & (s_score > 1.0)

            # scatter the advanced classification/seed state back
            def sc2(full, sub):
                m_ = sel.reshape((1,) * (full.ndim - 1) + (-1,))
                return full.at[..., idx].set(
                    jnp.where(m_, sub, full[..., idx])
                )

            def sc2d(full: DS, sub: DS) -> DS:
                return DS(sc2(full.hi, sub.hi), sc2(full.lo, sub.lo))

            low, up = sc2(low, nlow_s), sc2(up, nup_s)
            surf, apex = sc2(surf, nsurf_s), sc2(apex, napex_s)
            if nc:
                lam_lin = sc2d(lam_lin, nlam_s)
                eta = sc2(eta, neta_s)
            X32 = X32.at[idx].set(
                jnp.where(sel[:, None, None], sX, X32[idx])
            )
            seed_cls = sc2(seed_cls, s_cls)
            steps = steps.at[idx].add(sel.astype(jnp.int32))
            changed = changed.at[idx].set(
                jnp.where(sel, changed_s, changed[idx])
            )
            return (changed, steps, low, up, surf, apex, lam_lin, eta,
                    X32, best, seed_cls)

        (_, _, low, up, surf, apex, lam_lin, eta,
         X32, best, used_cls) = jax.lax.while_loop(cond, body, carry0)

    # --- self-validating acceptance of the per-instance BEST iterate:
    # its residuals were evaluated by the same projection-consistency +
    # equality test as the plain loop, at full eps, in ds precision.
    # NB `used_cls` (the classification the SEED was last refreshed
    # against) is returned as-is — it deliberately tracks the seed, not
    # the best iterate, so carried (seed, cls) pairs stay consistent.
    x, mu_new, s_new, _best_cls, x_res, lam_res, score = best
    accept = score < 1.0
    if os.environ.get("FCCQP_POLISH_DEBUG"):
        jax.debug.print(
            "polish: accept={a} x_res={x} lam_res={l} score={s}",
            a=accept, x=x_res, l=lam_res, s=score,
        )
    return PolishResult(
        x=x, mu=mu_new, s=s_new, accept=accept, x_res=x_res,
        lam_res=lam_res, seed=X32, cls=used_cls,
    )


def _concat0(a: DS, b: DS) -> DS:
    return DS(
        jnp.concatenate([a.hi, b.hi], axis=0),
        jnp.concatenate([a.lo, b.lo], axis=0),
    )


def _concat_rows(a: DS, b: DS) -> DS:
    return _concat0(a, b)
