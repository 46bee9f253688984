"""Pytree data types for problems, warm-start state, and results.

Parity mapping to the reference:
  * `QPBatch`        <- the seven arguments of `FCCQP::Solve`
                        (`/root/reference/src/fcc_qp.cpp:114-118`)
  * `WarmStart`      <- the persistent members `x_, mu_x_, mu_lambda_c_`
                        (`src/fcc_qp.hpp:149-153`, `src/fcc_qp.cpp:136-139`)
  * `FCCQPDetails`   <- `struct FCCQPDetails` (`src/fcc_qp.hpp:19-28`)
  * `FCCQPSolution`  <- `struct FCCQPSolution` (`src/fcc_qp.hpp:37-40`)
  * `FCCQPSolveStatus` <- enum (`src/fcc_qp.hpp:14-17`)

All types are registered JAX pytrees, so they flow through `jit`, `vmap`,
`lax.scan`, and shardings unchanged. Every array field may carry arbitrary
leading batch dimensions.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array


class FCCQPSolveStatus(enum.IntEnum):
    kSuccess = 0
    kMaxIterations = 1
    # Extension beyond the reference enum (`src/fcc_qp.hpp:14-17`): the
    # reference substitutes a rank-revealing COD factorization when LDLT
    # fails (`fcc_qp.cpp:163-177`) and so always returns *some* KKT-
    # consistent primal; our batched factorization chain instead flags
    # instances whose final primal is equality-infeasible (see
    # `FCCQPDetails.equality_viol`) so garbage can never read kSuccess.
    kFactorizationFailed = 2


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class QPBatch:
    """One QP (or a batch of QPs) in stacked dense form.

    Shapes (single instance; prepend batch dims freely):
      Q: (n, n)  b: (n,)  A_eq: (m, n)  b_eq: (m,)
      friction_coeffs: (nc//3,)  lb, ub: (n,)
    """

    Q: Array
    b: Array
    A_eq: Array
    b_eq: Array
    friction_coeffs: Array
    lb: Array
    ub: Array

    @property
    def batch_shape(self):
        return self.b.shape[:-1]

    def astype(self, dtype) -> "QPBatch":
        return jax.tree.map(lambda a: a.astype(dtype), self)


@_pytree_dataclass
class WarmStart:
    """ADMM state persisting across solves (primal + scaled duals)."""

    x: Array
    mu_x: Array
    mu_lambda_c: Array

    @staticmethod
    def zeros(shape, batch_shape=(), dtype=jnp.float64) -> "WarmStart":
        return WarmStart(
            x=jnp.zeros((*batch_shape, shape.num_vars), dtype=dtype),
            mu_x=jnp.zeros((*batch_shape, shape.num_vars), dtype=dtype),
            mu_lambda_c=jnp.zeros((*batch_shape, shape.nc), dtype=dtype),
        )


@_pytree_dataclass
class FCCQPDetails:
    """Per-solve diagnostics (field names match `src/fcc_qp.hpp:19-28`;
    the Python binding of the reference renames the residuals to
    `eps_bounds` / `eps_friction_cone` (`src/main.cpp:24-25`) — the OOP
    wrapper exposes those aliases)."""

    n_iter: Array
    admm_residual_bounds: Array
    admm_residual_friction_cone: Array
    solve_time: Array
    factorization_time: Array
    bounds_viol: Array
    friction_cone_viol: Array
    solve_status: Array  # int32; values from FCCQPSolveStatus
    # Extension beyond the reference struct: ``max_i |A_eq x - b_eq|_i``
    # in unscaled units. The reference never reports equality residuals
    # (its LDLT back-substitution makes the primal exactly
    # KKT-consistent by construction); here the primal comes from an
    # iteratively refined inverse operator, so a failed/non-contracting
    # factorization would otherwise be silent — this field makes
    # equality infeasibility observable per instance.
    equality_viol: Array = 0.0
    # Per-phase iteration telemetry (extensions; zero on engines
    # without the corresponding phase). `n_iter` alone conflates cheap
    # plain-f32 approach iterations with double-single endgame
    # iterations and polish retries, which makes throughput/iteration
    # regressions undiagnosable — these split it:
    #   n_iter_f32:     plain-f32 approach + polish-round iterations
    #   n_iter_ds:      double-single endgame iterations
    #   polish_attempts: PDAS polish attempts run for this instance
    #   polish_accepted: 1 if the final point came from an accepted
    #                    polish (0: plain ADMM convergence / maxed out)
    n_iter_f32: Array = 0
    n_iter_ds: Array = 0
    polish_attempts: Array = 0
    polish_accepted: Array = 0

    # Aliases matching the reference's Python binding names
    # (`src/main.cpp:24-25`).
    @property
    def eps_bounds(self):
        return self.admm_residual_bounds

    @property
    def eps_friction_cone(self):
        return self.admm_residual_friction_cone


@_pytree_dataclass
class FCCQPSolution:
    details: FCCQPDetails
    z: Array


def stack_qps(qps) -> QPBatch:
    """Stack an iterable of single-instance QPBatch (or dicts with the
    reference npz schema, `fcc_qp_test.py:28-30`) into one batched QPBatch."""
    def to_qp(q):
        if isinstance(q, QPBatch):
            return q
        return QPBatch(
            Q=jnp.asarray(q["Q"]),
            b=jnp.asarray(q["b"]),
            A_eq=jnp.asarray(q["A_eq"]),
            b_eq=jnp.asarray(q["b_eq"]),
            friction_coeffs=jnp.asarray(q["friction_coeffs"]),
            lb=jnp.asarray(q["lb"]),
            ub=jnp.asarray(q["ub"]),
        )

    qps = [to_qp(q) for q in qps]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
