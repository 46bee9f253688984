"""Active-set polishing (`ops/polish.py`): correctness, acceleration,
and the self-validating rejection fallback."""

import numpy as np
import pytest

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import (
    replay_ds_streams,
    solve_batched_ds,
    to_ds_batch,
)
from fcc_qp_tpu.models.osc import CASSIE, QUADRUPED, generate_osc_sequence
from fcc_qp_tpu.utils.io import stack_qp_dicts

BASE = FCCQPOptions(
    max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    scaling=True, splitting="constrained", presolve="operator",
)
POLISH = BASE.replace(polish=True)


@pytest.fixture(scope="module")
def walking():
    qps = generate_osc_sequence(CASSIE, 16, seed=0, smoothness=0.002)
    stacked = stack_qp_dicts(qps)
    return stacked, to_ds_batch(stacked)


def _objective(stacked, z):
    Qz = np.einsum("bij,bj->bi", stacked["Q"], z)
    return 0.5 * np.sum(z * Qz, axis=1) + np.sum(stacked["b"] * z, axis=1)


class TestPolish:
    def test_matches_unpolished_solution(self, walking):
        stacked, bds = walking
        ref, _ = solve_batched_ds(bds, CASSIE.shape, BASE)
        sol, _ = solve_batched_ds(bds, CASSIE.shape, POLISH)
        assert (np.asarray(sol.details.solve_status) == 0).all()
        zr, zg = np.asarray(ref.z), np.asarray(sol.z)
        # same fixed point to tolerance-limited accuracy; objectives
        # agree much tighter (flat directions near degeneracy)
        assert np.max(np.abs(zr - zg)) < 5e-3
        rel = np.abs(_objective(stacked, zg) - _objective(stacked, zr))
        rel /= 1.0 + np.abs(_objective(stacked, zr))
        assert np.max(rel) < 1e-5

    def test_feasibility_at_full_eps(self, walking):
        stacked, bds = walking
        sol, _ = solve_batched_ds(bds, CASSIE.shape, POLISH)
        z = np.asarray(sol.z)
        eq = np.abs(
            np.einsum("bij,bj->bi", stacked["A_eq"], z) - stacked["b_eq"]
        )
        # polished equality residuals land at ds level, far below eps
        assert np.max(eq) < 1e-9
        assert float(np.max(np.asarray(sol.details.bounds_viol))) < 1e-6
        assert (
            float(np.max(np.asarray(sol.details.friction_cone_viol))) < 2e-6
        )
        assert (
            float(np.max(np.asarray(sol.details.admm_residual_bounds)))
            < 1e-6
        )
        assert (
            float(
                np.max(np.asarray(sol.details.admm_residual_friction_cone))
            )
            < 1e-6
        )

    def test_cuts_iterations(self, walking):
        _, bds = walking
        ref, _ = solve_batched_ds(bds, CASSIE.shape, BASE)
        sol, _ = solve_batched_ds(bds, CASSIE.shape, POLISH)
        nr = np.asarray(ref.details.n_iter)
        ng = np.asarray(sol.details.n_iter)
        # the 1e-2 -> 1e-6 ADMM tail is gone: at least 2x fewer
        assert ng.mean() < 0.5 * nr.mean()

    def test_rejection_falls_back_to_admm(self, walking):
        """Garbage classification (act_tol so large everything is
        pinned) must be REJECTED by the self-validation and the solver
        must still converge through the plain endgame."""
        stacked, bds = walking
        o = POLISH.replace(polish_act_tol=1e6)
        sol, _ = solve_batched_ds(bds, CASSIE.shape, o)
        assert (np.asarray(sol.details.solve_status) == 0).all()
        z = np.asarray(sol.z)
        eq = np.abs(
            np.einsum("bij,bj->bi", stacked["A_eq"], z) - stacked["b_eq"]
        )
        assert np.max(eq) < 1e-4
        assert (
            float(np.max(np.asarray(sol.details.admm_residual_bounds)))
            < 1e-6
        )
        # fell back: iteration counts look like the unpolished path
        ref, _ = solve_batched_ds(bds, CASSIE.shape, BASE)
        assert (
            np.asarray(sol.details.n_iter).mean()
            > 0.5 * np.asarray(ref.details.n_iter).mean()
        )

    def test_warm_replay_with_polish(self, walking):
        _, bds = walking
        sols, _ = replay_ds_streams(
            bds, CASSIE.shape, POLISH, n_streams=2
        )
        st = np.asarray(sols.details.solve_status)
        assert (st == 0).all()
        n = np.asarray(sols.details.n_iter).reshape(2, 8)
        # warm steps identify the active set in a few dozen iterations
        assert np.median(n[:, 1:]) < 150
        assert (
            float(np.max(np.asarray(sols.details.admm_residual_bounds)))
            < 1e-6
        )

    def test_warm_restart_after_polish_is_instant(self, walking):
        """Polished duals are KKT-exact: re-solving the identical batch
        warm must converge almost immediately."""
        _, bds = walking
        sol1, warm = solve_batched_ds(bds, CASSIE.shape, POLISH)
        sol2, _ = solve_batched_ds(
            bds, CASSIE.shape, POLISH, warm=warm, warm_start=True
        )
        n2 = np.asarray(sol2.details.n_iter)
        assert np.median(n2) <= 5

    def test_quadruped_polish(self):
        qps = generate_osc_sequence(QUADRUPED, 8, seed=2, smoothness=0.002)
        stacked = stack_qp_dicts(qps)
        bds = to_ds_batch(stacked)
        sol, _ = solve_batched_ds(bds, QUADRUPED.shape, POLISH)
        assert (np.asarray(sol.details.solve_status) == 0).all()
        z = np.asarray(sol.z)
        eq = np.abs(
            np.einsum("bij,bj->bi", stacked["A_eq"], z) - stacked["b_eq"]
        )
        assert np.max(eq) < 1e-6
