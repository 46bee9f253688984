"""Cone-aware Ruiz equilibration for batched FCCQP problems.

The reference solver (`/root/reference/src/fcc_qp.cpp:57-112`) runs ADMM
on the raw problem data. Real OSC QPs mix contact forces (~400 N),
joint torques (~1 N m) and accelerations (~1 rad/s^2), so the KKT row
norms span ~6 orders of magnitude and the ADMM contraction factor is
data-dependent and poor (hundreds-to-thousands of iterations to 1e-6).
This module adds the standard cure the paper itself attributes to OSQP
(`fccqp.pdf` p.6 Table 2: "ρ-adaptation" + scaling): modified Ruiz
equilibration of the KKT system, made *cone-aware* so the second-order
friction cones stay exact.

Scaled problem: with diagonal D (variables), E (equality rows), cost
scalar c and x = D x~:

    Q~ = c D Q D,  b~ = c D b,  A~ = E A D,  b_eq~ = E b_eq,
    lb~ = D^-1 lb, ub~ = D^-1 ub.

Cone invariance: a per-coordinate scaling maps the Lorentz cone
{f : mu f_z >= ||f_xy||} to another Lorentz cone only if f_x and f_y
share one scale d_t; the scaled cone then has mu~ = mu d_z / d_t.
Ruiz therefore geometric-means the tangential pair of every cone and
reports per-cone effective friction coefficients.

Convergence tolerances stay in UNSCALED units: the solver weights the
scaled ADMM residuals by D before the inf-norm (x_res = D x~_res), so a
converged scaled solve satisfies the same eps_bound / eps_fcone
contract as the reference.

All computation is f32 on the hi words (scale factors are
preconditioners; their last bits are irrelevant) and the scaling is
applied to the ds data in one exact ds pass at the end.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

import fcc_qp_tpu.ops.ds as ds
from fcc_qp_tpu.config import ProblemShape
from fcc_qp_tpu.ops.ds import DS

_TINY = 1e-12


def _pow2_round(x: Array) -> Array:
    """Round positive scale factors to the nearest power of two.

    Powers of two make every scaling multiply EXACT in f32 (and exact on
    ds hi/lo words), so scaling + unscaling is a bit-exact change of
    variables rather than a 6e-8-relative multiplicative perturbation of
    the problem data — equality residuals of the unscaled solution stay
    at ds level instead of inheriting f32 rounding of e_i*d_j products.
    Equilibration quality only degrades by at most sqrt(2) per factor.
    """
    return jnp.exp2(jnp.rint(jnp.log2(x)))


class Scaling(NamedTuple):
    """Batched diagonal scaling, batch-last.

    d: (n, B) variable scale — unscaled x = d * x_scaled.
    e: (m, B) equality-row scale.
    c: (B,)  cost scale (objective multiplied by c).
    """

    d: Array
    e: Array
    c: Array


def _pair_cone_tangentials(dd: Array, ls: int, nc: int) -> Array:
    """Force d_x == d_y within every cone triple (geometric mean)."""
    if nc == 0:
        return dd
    n = dd.shape[0]
    seg = dd[ls : ls + nc].reshape(nc // 3, 3, -1)
    g = jnp.sqrt(seg[:, 0] * seg[:, 1])
    seg = jnp.stack([g, g, seg[:, 2]], axis=1).reshape(nc, -1)
    return jnp.concatenate([dd[:ls], seg, dd[ls + nc :]], axis=0)[:n]


def ruiz_scaling(
    Qh: Array,
    Ah: Array,
    bh: Array,
    shape: ProblemShape,
    iters: int = 8,
) -> Scaling:
    """Compute modified-Ruiz scale factors for a batch (f32, batch-last).

    Qh (n, n, B), Ah (m, n, B), bh (n, B) are the hi words of the ds
    problem data. Equilibrates the KKT matrix [[Q, A'],[A, 0]] row-wise
    toward unit inf-norms, with OSQP-style cost normalization folded in.
    """
    n, _, B = Qh.shape
    m = Ah.shape[0]
    f32 = Qh.dtype
    ls, nc = shape.lambda_c_start, shape.nc

    d = jnp.ones((n, B), f32)
    e = jnp.ones((m, B), f32)
    c = jnp.ones((B,), f32)
    Qa = jnp.abs(Qh)
    Aa = jnp.abs(Ah)
    ba = jnp.abs(bh)

    for _ in range(iters):
        rn = jnp.max(Qa, axis=1)  # (n, B)
        if m:
            rn = jnp.maximum(rn, jnp.max(Aa, axis=0))
            re = jnp.max(Aa, axis=1)  # (m, B)
        dd = jnp.where(rn > _TINY, 1.0 / jnp.sqrt(jnp.maximum(rn, _TINY)), 1.0)
        dd = _pow2_round(_pair_cone_tangentials(dd, ls, nc))
        Qa = Qa * dd[:, None, :] * dd[None, :, :]
        ba = ba * dd
        d = d * dd
        if m:
            ee = jnp.where(
                re > _TINY, 1.0 / jnp.sqrt(jnp.maximum(re, _TINY)), 1.0
            )
            ee = _pow2_round(ee)
            Aa = Aa * ee[:, None, :] * dd[None, :, :]
            e = e * ee

        # cost normalization: gamma = 1 / max(mean_i max_j |Q~|, ||b~||_inf)
        colnorm = jnp.mean(jnp.max(Qa, axis=1), axis=0)  # (B,)
        bnorm = jnp.max(ba, axis=0) if n else jnp.zeros((B,), f32)
        g = jnp.maximum(colnorm, bnorm)
        g = _pow2_round(
            jnp.where(g > _TINY, 1.0 / jnp.maximum(g, _TINY), 1.0)
        )
        Qa = Qa * g[None, None, :]
        ba = ba * g[None, :]
        c = c * g

    return Scaling(d=d, e=e, c=c)


def _scale_bounds(bound: DS, inv_d: Array) -> DS:
    """Bounds divide by d; +-inf entries pass through untouched (a
    finite-scaled inf would produce inf*0 NaNs in the lo word)."""
    scaled = ds.mul_f32(bound, inv_d)
    finite = jnp.isfinite(bound.hi)
    return DS(
        jnp.where(finite, scaled.hi, bound.hi),
        jnp.where(finite, scaled.lo, 0.0),
    )


def apply_scaling(qp, scaling: Scaling, shape: ProblemShape):
    """Scale a `QPBatchDS` (exact ds multiplies by f32 factors).

    Returns the scaled batch, with `friction_coeffs` replaced by the
    per-cone effective coefficients mu~ = mu * d_z / d_t.
    """
    d, e, c = scaling
    ls, nc = shape.lambda_c_start, shape.nc
    inv_d = 1.0 / d

    Qs = ds.mul_f32(qp.Q, c[None, None, :] * d[:, None, :] * d[None, :, :])
    bs = ds.mul_f32(qp.b, c[None, :] * d)
    As = ds.mul_f32(qp.A_eq, e[:, None, :] * d[None, :, :])
    beqs = ds.mul_f32(qp.b_eq, e)
    lbs = _scale_bounds(qp.lb, inv_d)
    ubs = _scale_bounds(qp.ub, inv_d)

    if nc:
        dseg = d[ls : ls + nc].reshape(nc // 3, 3, -1)
        mu_eff = ds.mul_f32(qp.friction_coeffs, dseg[:, 2] / dseg[:, 0])
    else:
        mu_eff = qp.friction_coeffs

    return qp._replace(
        Q=Qs, b=bs, A_eq=As, b_eq=beqs, lb=lbs, ub=ubs,
        friction_coeffs=mu_eff,
    )


def identity_scaling(n: int, m: int, B: int, dtype=jnp.float32) -> Scaling:
    return Scaling(
        d=jnp.ones((n, B), dtype),
        e=jnp.ones((m, B), dtype),
        c=jnp.ones((B,), dtype),
    )
