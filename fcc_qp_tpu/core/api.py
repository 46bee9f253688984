"""Drop-in object-oriented wrapper mirroring the reference Python API.

Parity surface (`/root/reference/src/main.cpp:42-55`): the `FCCQP` class
with `Solve`, `GetSolution`, `set_rho`, `set_max_iter`, `set_options`,
`set_warm_start`, `contact_vars_start`, constructed from
`(num_vars, num_equality_constraints, nc, lambda_c_start)`.

Internally this is a thin stateful shell over the pure-functional solver:
it owns the `WarmStart` pytree (the analog of the persistent members at
`src/fcc_qp.hpp:149-153`) and measures wall-clock `solve_time` /
`factorization_time` with `block_until_ready` around cached jitted
executables (the analog of the `std::chrono` spans at
`src/fcc_qp.cpp:67-71,120,188-190`).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fcc_qp_tpu.config import FCCQPOptions, ProblemShape
from fcc_qp_tpu.core.solver import solve
from fcc_qp_tpu.ops.kkt import admm_operator
from fcc_qp_tpu.ops.projections import validate_bounds
from fcc_qp_tpu.utils.timing import sync
from fcc_qp_tpu.types import FCCQPDetails, FCCQPSolution, QPBatch, WarmStart


_solve_jit = jax.jit(solve, static_argnames=("shape", "opts", "warm_start"))
_admm_operator_jit = jax.jit(admm_operator)


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class FCCQP:
    """Stateful solver facade with the reference's exact method surface.

    ``engine``:
      * ``"auto"`` (default): the f64 parity engine when x64 is enabled
        (CPU / `jax_enable_x64`), otherwise the double-single (ds)
        equilibrated engine — TPU has no native f64, and running the
        parity engine in f32 on raw (unequilibrated) OSC data loses the
        KKT solve entirely. The ds engine Ruiz-equilibrates internally,
        so on TPU ``rho`` acts in the equilibrated space (rho ~ 0.05 is
        a good default there; or set ``adaptive_rho=True``).
      * ``"f64"`` / ``"ds"``: force a specific engine.
    """

    def __init__(
        self,
        num_vars: int,
        num_equality_constraints: int,
        nc: int,
        lambda_c_start: int,
        dtype=None,
        engine: str = "auto",
    ):
        self.shape = ProblemShape(
            num_vars=num_vars,
            num_eq=num_equality_constraints,
            nc=nc,
            lambda_c_start=lambda_c_start,
        )
        self.dtype = dtype or default_dtype()
        if engine not in ("auto", "f64", "ds"):
            raise ValueError("engine must be 'auto', 'f64', or 'ds'")
        if engine == "auto":
            engine = "f64" if jax.config.jax_enable_x64 else "ds"
        self.engine = engine
        self._options = FCCQPOptions()
        self._warm_start = False
        self._warm = None
        self._solution: Optional[FCCQPSolution] = None
        self._z_host: Optional[np.ndarray] = None
        self._solve_time = 0.0
        self._factorization_time = 0.0

    # ---- option setters (parity: src/fcc_qp.hpp:75-91) ----
    def set_rho(self, rho: float):
        if rho <= 0:
            raise ValueError("rho must be > 0")
        self._options = self._options.replace(rho=float(rho))

    def set_max_iter(self, n: int):
        if n <= 0:
            raise ValueError("max_iter must be > 0")
        self._options = self._options.replace(max_iter=int(n))

    def set_options(self, opt: FCCQPOptions):
        self._options = opt

    def set_warm_start(self, warm_start: bool):
        self._warm_start = bool(warm_start)

    def contact_vars_start(self) -> int:
        return self.shape.lambda_c_start

    @property
    def options(self) -> FCCQPOptions:
        return self._options

    # ---- solve ----
    def _validate(self, qp: QPBatch):
        """Input validation (parity: asserts at fcc_qp.cpp:122-130)."""
        s = self.shape
        if qp.Q.shape != (s.num_vars, s.num_vars):
            raise ValueError(f"Q must be {(s.num_vars, s.num_vars)}, got {qp.Q.shape}")
        if qp.b.shape != (s.num_vars,):
            raise ValueError(f"b must be ({s.num_vars},)")
        if qp.A_eq.shape != (s.num_eq, s.num_vars):
            raise ValueError(f"A_eq must be {(s.num_eq, s.num_vars)}")
        if qp.b_eq.shape != (s.num_eq,):
            raise ValueError(f"b_eq must be ({s.num_eq},)")
        if qp.friction_coeffs.shape != (s.n_cones,):
            raise ValueError(f"friction_coeffs must be ({s.n_cones},)")
        if qp.lb.shape != (s.num_vars,) or qp.ub.shape != (s.num_vars,):
            raise ValueError(f"lb/ub must be ({s.num_vars},)")
        if not bool(validate_bounds(qp.lb, qp.ub)):
            raise ValueError("invalid bounds: lb > ub somewhere")

    def Solve(self, Q, b, A_eq, b_eq, friction_coeffs, lb, ub):
        dt = jnp.float64 if self.engine == "f64" else jnp.float32
        qp = QPBatch(
            Q=jnp.asarray(Q, dt),
            b=jnp.asarray(b, dt),
            A_eq=jnp.asarray(A_eq, dt),
            b_eq=jnp.asarray(b_eq, dt),
            friction_coeffs=jnp.asarray(np.asarray(friction_coeffs), dt),
            lb=jnp.asarray(lb, dt),
            ub=jnp.asarray(ub, dt),
        )
        self._validate(qp)

        warm_start = self._warm_start and self._warm is not None
        warm = self._warm if warm_start else None

        if self.engine == "ds":
            return self._solve_ds(
                Q, b, A_eq, b_eq, friction_coeffs, lb, ub, warm, warm_start
            )

        # Two-stage timed dispatch: build the ADMM operator once, pass
        # it INTO the solve (so the solve never rebuilds it), and read
        # the phase boundary with a true device barrier after both
        # stages are queued. Parity: the reference times its LDLT
        # factorization inside Solve the same way
        # (`/root/reference/src/fcc_qp.cpp:67-71,120,188-190`);
        # solve_time is the total wall of Solve, factorization_time the
        # operator-build span within it.
        rho = jnp.asarray(self._options.rho, dt)
        t0 = time.perf_counter()
        operator = _admm_operator_jit(qp.Q, qp.b, qp.A_eq, qp.b_eq, rho)
        sol, new_warm = _solve_jit(
            qp,
            shape=self.shape,
            opts=self._options,
            warm=warm,
            warm_start=warm_start,
            operator=operator,
        )
        sync(operator)
        t1 = time.perf_counter()
        sync(sol)
        t2 = time.perf_counter()

        self._factorization_time = t1 - t0
        self._solve_time = t2 - t0
        self._warm = new_warm
        self._solution = sol

    def _solve_ds(
        self, Q, b, A_eq, b_eq, friction_coeffs, lb, ub, warm, warm_start
    ):
        """TPU path: equilibrated double-single engine on a batch of 1.

        Scaling + constrained splitting + active-set polishing are
        forced on: they keep the reference's solution/tolerance
        contract (tolerances are checked in unscaled units; polishing
        is self-validating) while making f32-hardware solves correct
        and fast.
        """
        from fcc_qp_tpu.core.ds_engine import (
            QPBatchDS,
            _split64,
            solve_batched_ds,
        )

        def conv(a):
            return _split64(np.asarray(a, np.float64)[..., None])

        qpds = QPBatchDS(
            Q=conv(Q), b=conv(b), A_eq=conv(A_eq), b_eq=conv(b_eq),
            friction_coeffs=conv(np.asarray(friction_coeffs, np.float64)),
            lb=conv(lb), ub=conv(ub),
        )
        opts_ds = self._options.replace(
            scaling=True, splitting="constrained", polish=True,
            presolve="operator",
        )
        sol, new_warm = solve_batched_ds(
            qpds, self.shape, opts_ds, warm=warm, warm_start=warm_start
        )
        self._solve_time = float(np.asarray(sol.details.solve_time)[0])
        self._factorization_time = float(
            np.asarray(sol.details.factorization_time)[0]
        )
        self._warm = new_warm
        self._solution = sol
        # full ds precision for the returned z: without x64 the device
        # can only hold f32, so reconstruct hi+lo on the host (the warm
        # state carries the exact ds primal)
        self._z_host = (
            np.asarray(new_warm.x.hi, np.float64)
            + np.asarray(new_warm.x.lo, np.float64)
        )[:, 0]

    def GetSolution(self) -> FCCQPSolution:
        """Extract results as host types (parity: fcc_qp.cpp:194-207)."""
        if self._solution is None:
            raise RuntimeError("call Solve() first")
        d = self._solution.details
        details = FCCQPDetails(
            n_iter=int(np.asarray(d.n_iter).reshape(-1)[0]),
            admm_residual_bounds=float(
                np.asarray(d.admm_residual_bounds).reshape(-1)[0]
            ),
            admm_residual_friction_cone=float(
                np.asarray(d.admm_residual_friction_cone).reshape(-1)[0]
            ),
            solve_time=self._solve_time,
            factorization_time=self._factorization_time,
            bounds_viol=float(np.asarray(d.bounds_viol).reshape(-1)[0]),
            friction_cone_viol=float(
                np.asarray(d.friction_cone_viol).reshape(-1)[0]
            ),
            solve_status=int(np.asarray(d.solve_status).reshape(-1)[0]),
            equality_viol=float(
                np.asarray(d.equality_viol).reshape(-1)[0]
            ),
            n_iter_f32=int(np.asarray(d.n_iter_f32).reshape(-1)[0]),
            n_iter_ds=int(np.asarray(d.n_iter_ds).reshape(-1)[0]),
            polish_attempts=int(
                np.asarray(d.polish_attempts).reshape(-1)[0]
            ),
            polish_accepted=int(
                np.asarray(d.polish_accepted).reshape(-1)[0]
            ),
        )
        if self._z_host is not None:
            z = self._z_host
        else:
            z = np.asarray(self._solution.z)
            if z.ndim == 2 and z.shape[0] == 1:
                z = z[0]
        return FCCQPSolution(details=details, z=z)
