"""Pinned n_iter / solve_status boundary semantics, across engines.

The reference derives status purely from the iteration counter:
``solve_status = (n_iter == max_iter) ? kMaxIterations : kSuccess``
(`/root/reference/src/fcc_qp.cpp:203-204`). Because its loop breaks the
moment the tolerances are met, that rule is equivalent to "kSuccess iff
converged".

This framework pins the SEMANTIC form of the invariant, which the two
rules share everywhere except one corner the reference cannot reach:

  * ``kSuccess``        <=>  the returned solution satisfies the
    convergence tolerances (ADMM residuals below eps, equality residual
    consistent), including solutions validated by the PDAS polish.
  * ``kMaxIterations``  <=>  the iteration budget was exhausted WITHOUT
    a converged solution. Implies ``n_iter == max_iter`` and
    ``polish_accepted == 0``.

The one deliberate divergence: a ds-engine instance that burned its
whole ADMM budget but was then rescued by the self-validating polish
reports ``kSuccess`` with ``n_iter == max_iter`` — the solution is
residual-checked at 1e-6 at acceptance, so reporting kMaxIterations
(as a literal reading of the counter rule would) would make drop-in
users discard a certified solution. The f64 parity engine has no
polish, so it matches the reference counter rule exactly.
"""

import numpy as np
import pytest

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
from fcc_qp_tpu.core.solver import solve_batched
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_batch
from fcc_qp_tpu.types import FCCQPSolveStatus
from fcc_qp_tpu.utils.io import stack_qp_dicts, to_qpbatch

K_SUCCESS = int(FCCQPSolveStatus.kSuccess)
K_MAXITER = int(FCCQPSolveStatus.kMaxIterations)


@pytest.fixture(scope="module")
def cassie_batch():
    qps = generate_osc_batch(CASSIE, 32, seed=7)
    stacked = stack_qp_dicts(qps)
    return stacked, to_qpbatch(stacked), to_ds_batch(stacked)


class TestF64EngineCounterRule:
    """The parity engine reproduces the reference's counter-derived
    status exactly (`fcc_qp.cpp:203-204`)."""

    def test_unconverged_at_cap_is_kmaxiterations(self, cassie_batch):
        _, b64, _ = cassie_batch
        # budget far below what these problems need cold
        opts = FCCQPOptions(
            max_iter=5, rho=1.0, eps_fcone=1e-6, eps_bound=1e-6
        )
        sol, _ = solve_batched(b64, CASSIE.shape, opts)
        n = np.asarray(sol.details.n_iter)
        st = np.asarray(sol.details.solve_status)
        assert (n == opts.max_iter).any(), "budget was not exhausted"
        np.testing.assert_array_equal(
            st == K_MAXITER, n == opts.max_iter
        )

    def test_converged_reports_ksuccess_below_cap(self, cassie_batch):
        _, b64, _ = cassie_batch
        opts = FCCQPOptions(
            max_iter=2000, rho=1.0, eps_fcone=1e-6, eps_bound=1e-6
        )
        sol, _ = solve_batched(b64, CASSIE.shape, opts)
        n = np.asarray(sol.details.n_iter)
        st = np.asarray(sol.details.solve_status)
        conv = st == K_SUCCESS
        assert conv.any()
        assert (n[conv] < opts.max_iter).all()


class TestDsEngineSemanticRule:
    """ds engine: status is semantic — kSuccess iff a residual-validated
    solution was produced, even when the counter sits at max_iter
    (polish rescue)."""

    # a budget well below the cold iteration need (p50 ~90 at these
    # settings) forces counter exhaustion; the PDAS polish then rescues
    # most instances with a self-validated solution
    OPTS = FCCQPOptions(
        max_iter=40, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
        scaling=True, splitting="constrained", presolve="operator",
        polish=True, polish_rounds=4, polish_newton_steps=4,
    )

    @pytest.fixture(scope="class")
    def sol(self, cassie_batch):
        _, _, bds = cassie_batch
        sol, _ = solve_batched_ds(bds, CASSIE.shape, self.OPTS)
        return sol

    def test_boundary_is_exercised(self, sol):
        """The config must actually produce polish-rescued instances at
        the cap — otherwise the semantics tests below are vacuous."""
        n = np.asarray(sol.details.n_iter)
        st = np.asarray(sol.details.solve_status)
        at_cap_success = (n == self.OPTS.max_iter) & (st == K_SUCCESS)
        assert at_cap_success.any(), (
            "no polish-rescued instance at the iteration cap; "
            "tighten max_iter in this test"
        )

    def test_ksuccess_implies_validated_residuals(self, sol):
        st = np.asarray(sol.details.solve_status)
        ok = st == K_SUCCESS
        xr = np.asarray(sol.details.admm_residual_bounds)
        lr = np.asarray(sol.details.admm_residual_friction_cone)
        assert (xr[ok] <= self.OPTS.eps_bound * (1 + 1e-6)).all()
        assert (lr[ok] <= self.OPTS.eps_fcone * (1 + 1e-6)).all()

    def test_success_at_cap_means_polish_accepted(self, sol):
        n = np.asarray(sol.details.n_iter)
        st = np.asarray(sol.details.solve_status)
        acc = np.asarray(sol.details.polish_accepted)
        at_cap_success = (n == self.OPTS.max_iter) & (st == K_SUCCESS)
        assert (acc[at_cap_success] == 1).all()

    def test_kmaxiterations_implies_exhausted_and_unrescued(
        self, cassie_batch
    ):
        """Force unrescuable instances (polish off, tiny budget):
        every kMaxIterations instance sits at the cap, unrescued."""
        _, _, bds = cassie_batch
        opts = self.OPTS.replace(max_iter=10, polish=False)
        sol, _ = solve_batched_ds(bds, CASSIE.shape, opts)
        n = np.asarray(sol.details.n_iter)
        st = np.asarray(sol.details.solve_status)
        acc = np.asarray(sol.details.polish_accepted)
        cap = st == K_MAXITER
        assert cap.any(), "expected unconverged instances at max_iter=10"
        assert (n[cap] == opts.max_iter).all()
        assert (acc[cap] == 0).all()

    def test_below_cap_never_kmaxiterations(self, sol):
        n = np.asarray(sol.details.n_iter)
        st = np.asarray(sol.details.solve_status)
        below = n < self.OPTS.max_iter
        assert (st[below] != K_MAXITER).all()
