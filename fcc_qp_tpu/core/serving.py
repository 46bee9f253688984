"""Pipelined serving mode for the drop-in API (control-loop serving).

The reference serves one QP per control tick at ~100 us on the robot's
own CPU (`fccqp.pdf` p.5 Fig. 1). A remote-attached TPU cannot match
that SYNCHRONOUS latency: every blocking `Solve` pays host->device
dispatch + fetch round trips (~25-50 ms each through the tunnel), so
the drop-in `FCCQP.Solve` floor is ~100 ms regardless of compute.

What the hardware CAN do is hide those round trips behind depth-D
pipelining, PROVIDED each step costs O(1) transfers. Two design rules:

* **One upload per submit.** The seven QP fields are packed host-side
  into a single (2, total) f32 hi/lo buffer and unpacked INSIDE the
  jitted program — naive per-leaf `device_put` of a 14-leaf ds pytree
  costs 14 tunnel round trips (~350 ms) before any compute runs.
* **One download per retire.** The jitted step returns the solution
  and every diagnostic packed into one flat f32 vector — fetching
  `FCCQPDetails` field-by-field costs ~12 round trips.

The warm-start pytree — the only inter-step dependency — never leaves
the device: solve t+1 dispatches against the un-fetched device handle
of solve t's warm output (JAX async dispatch). The host only blocks
when it RETIRES a result, D steps behind the dispatch front, so the
amortized per-solve cost approaches device compute + one upload + one
download, at the price of D ticks of result latency — the classic
serving latency/throughput trade, made explicit.

    server = FCCQPServer(shape, opts, depth=4)
    for qp in control_loop:
        t = server.submit(**qp)        # one upload, no device sync
        done = server.poll()           # retired (ticket, FCCQPSolution)
    for t, sol in server.drain(): ...  # flush the tail

Parity note: `submit`/`result` wrap the same engine and warm-start
semantics as `FCCQP.Solve`/`GetSolution`
(`/root/reference/src/main.cpp:50-54`); the first submit is cold, every
later one warm (the reference replay's `set_warm_start(i > 0)` loop,
`/root/reference/fcc_qp_test.py:85-89`).
"""

from __future__ import annotations

import collections
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fcc_qp_tpu.config import FCCQPOptions, ProblemShape
from fcc_qp_tpu.types import FCCQPDetails, FCCQPSolution

# packed-stats layout appended after the 2*n solution words:
# [n_iter, status, xr, lr, bounds_viol, fcone_viol, eq_viol,
#  n_iter_f32, n_iter_ds, polish_attempts, polish_accepted]
_N_STATS = 11


def _layout(shape: ProblemShape):
    n, m, k = shape.num_vars, shape.num_eq, shape.n_cones
    sizes = (n * n, n, m * n, m, k, n, n)
    offs = np.cumsum((0,) + sizes)
    return tuple(int(o) for o in offs)


def _pack_qp_host(shape, Q, b, A_eq, b_eq, friction_coeffs, lb, ub):
    flat = np.concatenate([
        np.asarray(a, np.float64).ravel()
        for a in (Q, b, A_eq, b_eq, friction_coeffs, lb, ub)
    ])
    hi = flat.astype(np.float32)
    with np.errstate(invalid="ignore"):
        lo = (flat - hi.astype(np.float64)).astype(np.float32)
    lo = np.where(np.isfinite(flat), lo, 0.0).astype(np.float32)
    return np.stack([hi, lo])


@partial(
    jax.jit,
    static_argnames=("shape", "opts", "warm_start", "con_idx"),
)
def _serve_step_ds(buf, warm, shape, opts, warm_start, con_idx):
    """One warm-chained B=1 ds solve: packed buffer in, packed stats +
    device warm state out."""
    from fcc_qp_tpu.core.ds_engine import QPBatchDS, solve_batched_ds
    from fcc_qp_tpu.ops.ds import DS

    n, m, k = shape.num_vars, shape.num_eq, shape.n_cones
    offs = _layout(shape)

    def take(i, dims):
        hi = buf[0, offs[i]:offs[i + 1]].reshape(dims + (1,))
        lo = buf[1, offs[i]:offs[i + 1]].reshape(dims + (1,))
        return DS(hi, lo)

    qpds = QPBatchDS(
        Q=take(0, (n, n)), b=take(1, (n,)),
        A_eq=take(2, (m, n)), b_eq=take(3, (m,)),
        friction_coeffs=take(4, (k,)),
        lb=take(5, (n,)), ub=take(6, (n,)),
    )
    sol, w2 = solve_batched_ds(
        qpds, shape, opts, warm=warm, warm_start=warm_start,
        con_idx=con_idx, timing=False,
    )
    d = sol.details
    f32 = jnp.float32
    stats = jnp.stack([
        d.n_iter[0].astype(f32),
        d.solve_status[0].astype(f32),
        d.admm_residual_bounds[0].astype(f32),
        d.admm_residual_friction_cone[0].astype(f32),
        d.bounds_viol[0].astype(f32),
        d.friction_cone_viol[0].astype(f32),
        d.equality_viol[0].astype(f32),
        d.n_iter_f32[0].astype(f32),
        d.n_iter_ds[0].astype(f32),
        d.polish_attempts[0].astype(f32),
        d.polish_accepted[0].astype(f32),
    ])
    out = jnp.concatenate([w2.x.hi[:, 0], w2.x.lo[:, 0], stats])
    return out, w2


class FCCQPServer:
    """Depth-D pipelined warm-started QP serving on one device.

    Parameters:
      shape: fixed problem shape (as the `FCCQP` constructor).
      opts: solver options; the ds-engine acceleration set (scaling,
        constrained splitting, polish) is forced on as in
        `FCCQP._solve_ds`.
      depth: max in-flight solves before `submit` blocks retiring the
        oldest. depth=1 degenerates to the synchronous drop-in path.
      engine: "ds" (TPU) or "f64" (x64 CPU parity engine).
    """

    def __init__(
        self,
        shape: ProblemShape,
        opts: FCCQPOptions = FCCQPOptions(),
        depth: int = 4,
        engine: str = "ds",
    ):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        if engine not in ("ds", "f64"):
            raise ValueError("engine must be 'ds' or 'f64'")
        self.shape = shape
        self.depth = int(depth)
        self.engine = engine
        self._opts = (
            opts.replace(
                scaling=True, splitting="constrained", polish=True,
                presolve="operator",
            )
            if engine == "ds"
            else opts
        )
        self._warm = None
        self._con_idx = None
        self._next_ticket = 0
        # in-flight: deque of (ticket, packed_out_or_(sol, warm))
        self._inflight: collections.deque = collections.deque()
        self._retired: dict[int, FCCQPSolution] = {}
        self._submit_times: dict[int, float] = {}

    # -- dispatch ------------------------------------------------------
    def _dispatch_ds(self, Q, b, A_eq, b_eq, friction_coeffs, lb, ub):
        if self._con_idx is None:
            # classify constrained coordinates once (static across the
            # stream, like the reference's fixed problem shape)
            from fcc_qp_tpu.core.ds_engine import (
                constrained_indices,
                to_ds_batch,
            )

            qp1 = to_ds_batch({
                "Q": np.asarray(Q, np.float64)[None],
                "b": np.asarray(b, np.float64)[None],
                "A_eq": np.asarray(A_eq, np.float64)[None],
                "b_eq": np.asarray(b_eq, np.float64)[None],
                "friction_coeffs": np.asarray(
                    friction_coeffs, np.float64
                )[None],
                "lb": np.asarray(lb, np.float64)[None],
                "ub": np.asarray(ub, np.float64)[None],
            })
            self._con_idx = constrained_indices(
                qp1, self.shape,
                full=self._opts.splitting == "full",
            )
        buf = jax.device_put(_pack_qp_host(
            self.shape, Q, b, A_eq, b_eq, friction_coeffs, lb, ub
        ))
        out, w2 = _serve_step_ds(
            buf, self._warm, self.shape, self._opts,
            self._warm is not None, self._con_idx,
        )
        # the warm handle chains ON DEVICE: no fetch, no barrier —
        # this is what lets solve t+1 dispatch before solve t lands
        self._warm = w2
        return out

    def _dispatch_f64(self, Q, b, A_eq, b_eq, friction_coeffs, lb, ub):
        from fcc_qp_tpu.core.solver import solve_batched
        from fcc_qp_tpu.types import QPBatch

        dt = jnp.float64
        qp = QPBatch(
            Q=jnp.asarray(Q, dt)[None],
            b=jnp.asarray(b, dt)[None],
            A_eq=jnp.asarray(A_eq, dt)[None],
            b_eq=jnp.asarray(b_eq, dt)[None],
            friction_coeffs=jnp.asarray(
                np.asarray(friction_coeffs), dt
            )[None],
            lb=jnp.asarray(lb, dt)[None],
            ub=jnp.asarray(ub, dt)[None],
        )
        sol, w2 = solve_batched(
            qp, self.shape, self._opts,
            warm=self._warm, warm_start=self._warm is not None,
            timing=False,
        )
        self._warm = w2
        return (sol, w2)

    def submit(self, Q, b, A_eq, b_eq, friction_coeffs, lb, ub) -> int:
        """Dispatch one warm-chained solve; returns its ticket.

        Blocks only when `depth` results are already in flight (then
        retires the oldest first)."""
        while len(self._inflight) >= self.depth:
            self._retire_oldest()
        ticket = self._next_ticket
        self._next_ticket += 1
        self._submit_times[ticket] = time.perf_counter()
        if self.engine == "ds":
            payload = self._dispatch_ds(
                Q, b, A_eq, b_eq, friction_coeffs, lb, ub
            )
        else:
            payload = self._dispatch_f64(
                Q, b, A_eq, b_eq, friction_coeffs, lb, ub
            )
        self._inflight.append((ticket, payload))
        return ticket

    # -- retire --------------------------------------------------------
    def _retire_oldest(self):
        ticket, payload = self._inflight.popleft()
        n = self.shape.num_vars
        now_fields = dict(factorization_time=0.0)
        if self.engine == "ds":
            v = np.asarray(payload)  # ONE fetch retires the whole step
            z = v[:n].astype(np.float64) + v[n:2 * n].astype(np.float64)
            s = v[2 * n:]
            details = FCCQPDetails(
                n_iter=int(s[0]),
                admm_residual_bounds=float(s[2]),
                admm_residual_friction_cone=float(s[3]),
                solve_time=time.perf_counter()
                - self._submit_times.pop(ticket),
                bounds_viol=float(s[4]),
                friction_cone_viol=float(s[5]),
                solve_status=int(s[1]),
                equality_viol=float(s[6]),
                n_iter_f32=int(s[7]),
                n_iter_ds=int(s[8]),
                polish_attempts=int(s[9]),
                polish_accepted=int(s[10]),
                **now_fields,
            )
        else:
            sol, warm = payload
            z = np.asarray(sol.z).reshape(-1)
            d = sol.details

            def one(a, cast):
                return cast(np.asarray(a).reshape(-1)[0])

            details = FCCQPDetails(
                n_iter=one(d.n_iter, int),
                admm_residual_bounds=one(d.admm_residual_bounds, float),
                admm_residual_friction_cone=one(
                    d.admm_residual_friction_cone, float
                ),
                solve_time=time.perf_counter()
                - self._submit_times.pop(ticket),
                bounds_viol=one(d.bounds_viol, float),
                friction_cone_viol=one(d.friction_cone_viol, float),
                solve_status=one(d.solve_status, int),
                equality_viol=one(d.equality_viol, float),
                n_iter_f32=one(d.n_iter_f32, int),
                n_iter_ds=one(d.n_iter_ds, int),
                polish_attempts=one(d.polish_attempts, int),
                polish_accepted=one(d.polish_accepted, int),
                **now_fields,
            )
        self._retired[ticket] = FCCQPSolution(details=details, z=z)

    def poll(self) -> list[tuple[int, FCCQPSolution]]:
        """Non-blockingly collect every already-retired result."""
        out = sorted(self._retired.items())
        self._retired.clear()
        return out

    def result(self, ticket: int) -> FCCQPSolution:
        """Block until `ticket`'s solve has retired; return it."""
        while ticket not in self._retired:
            if not self._inflight:
                raise KeyError(
                    f"unknown or already-collected ticket {ticket}"
                )
            self._retire_oldest()
        return self._retired.pop(ticket)

    def drain(self) -> list[tuple[int, FCCQPSolution]]:
        """Retire every in-flight solve and return all pending results."""
        while self._inflight:
            self._retire_oldest()
        return self.poll()

    # -- introspection -------------------------------------------------
    @property
    def in_flight(self) -> int:
        return len(self._inflight)

    def reset_warm_start(self):
        """Drop the carried warm state (next submit solves cold)."""
        self._warm = None
