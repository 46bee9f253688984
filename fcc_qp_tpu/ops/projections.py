"""Feasible-set projections and violation metrics (TPU-native, branchless).

These are the L0 math kernels of the framework: Euclidean projections onto
box bounds and second-order (Lorentz / friction) cones, plus the violation
metrics the solver reports.  Functional parity targets the reference
implementation at ``/root/reference/src/constraint_utils.cpp:5-75``, but the
implementation is fully branchless (``jnp.where`` selects instead of C++
``if``), static-shaped, and batch-polymorphic so that it vmaps/shards cleanly
and fuses into surrounding XLA computations on TPU.

Conventions
-----------
* A stacked contact-force vector ``f`` has shape ``(..., nc)`` with
  ``nc % 3 == 0``; cone ``i`` occupies ``f[..., 3i:3i+3] = (fx, fy, fz)``.
* ``mu`` holds one friction coefficient per cone, shape ``(..., nc // 3)``.
* All functions preserve the input dtype and broadcast over leading batch
  dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def project_to_bounds(x: Array, lb: Array, ub: Array) -> Array:
    """Elementwise projection onto ``[lb, ub]``.

    Parity: ``project_to_bounds`` (reference ``constraint_utils.cpp:37-46``),
    i.e. ``clip(x, lb, ub)`` — the reference's explicit loop is a single
    fused VPU op here.
    """
    return jnp.clip(x, lb, ub)


def project_to_friction_cone(f: Array, mu: Array) -> Array:
    """Exact Euclidean projection of stacked 3-D forces onto friction cones.

    The cone for coefficient ``mu`` is ``K = {f : mu * fz >= ||fxy||}``.
    Parity: the three branches of the reference
    (``constraint_utils.cpp:5-25``):

    1. inside the cone (``mu*fz >= ||fxy||``)        -> identity
    2. inside the polar cone (``fz < -mu*||fxy||``)  -> 0
    3. otherwise project to the cone surface.

    For branch 3 the reference forms the boundary ray
    ``d = (mu*fz/||fxy|| * fxy, fz)``, normalizes, and returns ``(d.f) d``.
    Algebraically this equals the standard closed form used here,

        ``t = (mu*||fxy|| + fz) / (1 + mu^2)``
        ``p = (t * mu * fxy / ||fxy||, t)``,

    which is well defined at ``fz == 0`` (where the reference's ray
    normalization would divide by zero) and is branchless.  The boundary
    case ``fz == -mu*||fxy||`` gives ``t == 0`` -> the origin, matching
    branch 2's limit, so the strict/non-strict inequality difference is
    immaterial.

    Args:
      f: ``(..., nc)`` stacked forces, ``nc % 3 == 0``.
      mu: ``(..., nc // 3)`` per-cone friction coefficients.

    Returns:
      ``(..., nc)`` array of projected forces.
    """
    if f.shape[-1] == 0:
        return f
    f3 = f.reshape(*f.shape[:-1], -1, 3)
    fxy = f3[..., :2]
    fz = f3[..., 2]
    norm_xy = jnp.sqrt(jnp.sum(fxy * fxy, axis=-1))

    inside = mu * fz >= norm_xy
    polar = fz < -mu * norm_xy

    t = (mu * norm_xy + fz) / (1.0 + mu * mu)
    safe_norm = jnp.where(norm_xy > 0, norm_xy, jnp.ones_like(norm_xy))
    scale = t * mu / safe_norm
    surf_xy = scale[..., None] * fxy
    surf = jnp.concatenate([surf_xy, t[..., None]], axis=-1)

    keep = inside[..., None]
    zero = polar[..., None]
    out = jnp.where(keep, f3, jnp.where(zero, jnp.zeros_like(f3), surf))
    return out.reshape(f.shape)


def calc_friction_cone_violation(f: Array, mu: Array) -> Array:
    """Summed cone violation ``sum_i max(0, ||fxy_i|| - mu_i * fz_i)``.

    Parity: ``calc_friction_cone_violation`` (``constraint_utils.cpp:48-59``).
    Reduces over the trailing (cone) axis; batch dims are preserved.
    """
    if f.shape[-1] == 0:
        return jnp.zeros(f.shape[:-1], dtype=f.dtype)
    f3 = f.reshape(*f.shape[:-1], -1, 3)
    norm_xy = jnp.sqrt(jnp.sum(f3[..., :2] ** 2, axis=-1))
    viol = jnp.maximum(0.0, norm_xy - mu * f3[..., 2])
    return jnp.sum(viol, axis=-1)


def calc_bound_violation(x: Array, lb: Array, ub: Array) -> Array:
    """L2 norm of the out-of-bounds component, ``||x - clip(x, lb, ub)||_2``.

    Parity: ``calc_bound_violation`` (``constraint_utils.cpp:61-65``).
    """
    d = x - project_to_bounds(x, lb, ub)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def validate_bounds(lb: Array, ub: Array) -> Array:
    """True iff ``lb[i] <= ub[i]`` for all i (per batch element).

    Parity: ``validate_bounds`` (``constraint_utils.cpp:67-75``).
    """
    return jnp.all(lb <= ub, axis=-1)
