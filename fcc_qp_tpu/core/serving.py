"""Pipelined serving mode for the drop-in API (control-loop serving).

The reference serves one QP per control tick at ~100 us on the robot's
own CPU (`fccqp.pdf` p.5 Fig. 1). A remote-attached TPU cannot match
that SYNCHRONOUS latency: every blocking `Solve` pays a host->device
dispatch + fetch round trip (~25 ms each way through the tunnel), so
the drop-in `FCCQP.Solve` floor is ~100 ms regardless of compute.

What the hardware CAN do is hide that round trip behind depth-D
pipelining: JAX dispatch is asynchronous, and a warm-started stream's
only inter-step dependency — the warm-start pytree — stays on device,
so solve t+1 dispatches against the un-fetched device handle of solve
t's warm output. The host only blocks when it RETIRES a result, D
steps behind the dispatch front. Amortized per-solve cost then
approaches device compute + dispatch bookkeeping instead of the full
round trip, at the price of D ticks of result latency — the classic
serving latency/throughput trade, made explicit.

    server = FCCQPServer(shape, opts, depth=4)
    for qp in control_loop:
        t = server.submit(**qp)        # never blocks on the device
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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fcc_qp_tpu.config import FCCQPOptions, ProblemShape
from fcc_qp_tpu.types import FCCQPDetails, FCCQPSolution


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
        self._next_ticket = 0
        # in-flight: deque of (ticket, device_solution, device_warm)
        self._inflight: collections.deque = collections.deque()
        self._retired: dict[int, FCCQPSolution] = {}
        self._submit_times: dict[int, float] = {}
        self._retire_times: dict[int, float] = {}

    # -- dispatch ------------------------------------------------------
    def _dispatch(self, Q, b, A_eq, b_eq, friction_coeffs, lb, ub):
        warm_start = self._warm is not None
        if self.engine == "ds":
            from fcc_qp_tpu.core.ds_engine import (
                QPBatchDS,
                _split64,
                solve_batched_ds,
            )

            def conv(a):
                return _split64(np.asarray(a, np.float64)[..., None])

            qpds = QPBatchDS(
                Q=conv(Q), b=conv(b), A_eq=conv(A_eq), b_eq=conv(b_eq),
                friction_coeffs=conv(
                    np.asarray(friction_coeffs, np.float64)
                ),
                lb=conv(lb), ub=conv(ub),
            )
            sol, new_warm = solve_batched_ds(
                qpds, self.shape, self._opts,
                warm=self._warm, warm_start=warm_start,
            )
        else:
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
            sol, new_warm = solve_batched(
                qp, self.shape, self._opts,
                warm=self._warm, warm_start=warm_start, timing=False,
            )
        # the warm handle chains ON DEVICE: no fetch, no barrier —
        # this is what lets solve t+1 dispatch before solve t lands
        self._warm = new_warm
        return sol, new_warm

    def submit(self, Q, b, A_eq, b_eq, friction_coeffs, lb, ub) -> int:
        """Dispatch one warm-chained solve; returns its ticket.

        Blocks only when `depth` results are already in flight (then
        retires the oldest first)."""
        while len(self._inflight) >= self.depth:
            self._retire_oldest()
        ticket = self._next_ticket
        self._next_ticket += 1
        self._submit_times[ticket] = time.perf_counter()
        sol, warm = self._dispatch(
            Q, b, A_eq, b_eq, friction_coeffs, lb, ub
        )
        self._inflight.append((ticket, sol, warm))
        return ticket

    # -- retire --------------------------------------------------------
    def _retire_oldest(self):
        ticket, sol, warm = self._inflight.popleft()
        # one host fetch retires the whole step (z + details land
        # together; ds z is reconstructed from the exact warm primal)
        if self.engine == "ds":
            z = (
                np.asarray(warm.x.hi, np.float64)
                + np.asarray(warm.x.lo, np.float64)
            )[:, 0]
        else:
            z = np.asarray(sol.z).reshape(-1)
        d = sol.details

        def one(a, cast):
            return cast(np.asarray(a).reshape(-1)[0])

        now = time.perf_counter()
        details = FCCQPDetails(
            n_iter=one(d.n_iter, int),
            admm_residual_bounds=one(d.admm_residual_bounds, float),
            admm_residual_friction_cone=one(
                d.admm_residual_friction_cone, float
            ),
            solve_time=now - self._submit_times.pop(ticket),
            factorization_time=0.0,
            bounds_viol=one(d.bounds_viol, float),
            friction_cone_viol=one(d.friction_cone_viol, float),
            solve_status=one(d.solve_status, int),
            equality_viol=one(d.equality_viol, float),
            n_iter_f32=one(d.n_iter_f32, int),
            n_iter_ds=one(d.n_iter_ds, int),
            polish_attempts=one(d.polish_attempts, int),
            polish_accepted=one(d.polish_accepted, int),
        )
        self._retired[ticket] = FCCQPSolution(details=details, z=z)
        self._retire_times[ticket] = now

    def poll(self) -> list[tuple[int, FCCQPSolution]]:
        """Non-blockingly collect every already-retired result."""
        out = sorted(self._retired.items())
        self._retired.clear()
        return out

    def result(self, ticket: int) -> FCCQPSolution:
        """Block until `ticket`'s solve has retired; return it."""
        while ticket not in self._retired:
            if not self._inflight:
                raise KeyError(f"unknown or already-collected ticket {ticket}")
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
