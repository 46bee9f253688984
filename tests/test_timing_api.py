"""Per-phase timing fields (VERDICT r1 item 2) and the drop-in FCCQP
engine selection."""

import numpy as np
import pytest

from fcc_qp_tpu import FCCQP, FCCQPOptions, solve_batched
from fcc_qp_tpu.core.ds_engine import (
    replay_ds_streams,
    solve_batched_ds,
    to_ds_batch,
)
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_sequence
from fcc_qp_tpu.utils.io import stack_qp_dicts, to_qpbatch

OPTS = FCCQPOptions(max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6)
DS_OPTS = OPTS.replace(
    scaling=True, splitting="constrained", presolve="operator", polish=True
)


@pytest.fixture(scope="module")
def walking():
    qps = generate_osc_sequence(CASSIE, 8, seed=0, smoothness=0.002)
    return qps, stack_qp_dicts(qps)


class TestTimingFields:
    def test_fccqp_one_factorization_timed(self, walking):
        qps, _ = walking
        solver = FCCQP(60, 38, 12, 38)
        solver.set_options(OPTS)
        for i, qp in enumerate(qps[:3]):
            solver.set_warm_start(i > 0)
            solver.Solve(qp["Q"], qp["b"], qp["A_eq"], qp["b_eq"],
                         qp["friction_coeffs"], qp["lb"], qp["ub"])
            d = solver.GetSolution().details
            assert d.solve_time > 0
            assert 0 < d.factorization_time <= d.solve_time

    def test_batched_ds_details_times(self, walking):
        _, stacked = walking
        bds = to_ds_batch(stacked)
        sol, _ = solve_batched_ds(bds, CASSIE.shape, DS_OPTS)
        st = np.asarray(sol.details.solve_time)
        ft = np.asarray(sol.details.factorization_time)
        assert (st > 0).all()
        assert (ft > 0).all()
        assert (ft <= st).all()

    def test_batched_f64_details_times(self, walking):
        _, stacked = walking
        b64 = to_qpbatch(stacked)
        sol, _ = solve_batched(b64, CASSIE.shape, OPTS)
        st = np.asarray(sol.details.solve_time)
        ft = np.asarray(sol.details.factorization_time)
        assert (st > 0).all() and (ft > 0).all() and (ft <= st).all()

    def test_replay_streams_details_times(self, walking):
        _, stacked = walking
        bds = to_ds_batch(stacked)
        sols, _ = replay_ds_streams(bds, CASSIE.shape, DS_OPTS, n_streams=2)
        st = np.asarray(sols.details.solve_time)
        ft = np.asarray(sols.details.factorization_time)
        assert (st > 0).all() and (ft > 0).all()


class TestFCCQPEngines:
    def test_ds_engine_matches_f64(self, walking):
        qps, _ = walking
        zs = {}
        for engine in ("f64", "ds"):
            solver = FCCQP(60, 38, 12, 38, engine=engine)
            solver.set_options(OPTS)
            qp = qps[0]
            solver.Solve(qp["Q"], qp["b"], qp["A_eq"], qp["b_eq"],
                         qp["friction_coeffs"], qp["lb"], qp["ub"])
            sol = solver.GetSolution()
            assert sol.details.solve_status == 0
            assert sol.z.shape == (60,)
            zs[engine] = sol.z
        # both engines converge to 1e-6 ADMM residual, but OSC QPs have
        # near-flat directions (task-space curvature ~1e-6) where two
        # valid 1e-6 solutions sit ~1e-2 apart in z; the well-posed
        # comparison is the objective, with a loose z sanity band
        # (same rationale as tests/test_rank_deficient._check)
        assert np.max(np.abs(zs["f64"] - zs["ds"])) < 5e-2
        qp = qps[0]

        def obj(z):
            return 0.5 * z @ qp["Q"] @ z + qp["b"] @ z

        rel = abs(obj(zs["ds"]) - obj(zs["f64"])) / (
            1.0 + abs(obj(zs["f64"]))
        )
        assert rel < 1e-6, f"objective mismatch {rel}"

    def test_ds_engine_feasibility_and_warm(self, walking):
        qps, _ = walking
        solver = FCCQP(60, 38, 12, 38, engine="ds")
        solver.set_options(OPTS)
        for i, qp in enumerate(qps[:4]):
            solver.set_warm_start(i > 0)
            solver.Solve(qp["Q"], qp["b"], qp["A_eq"], qp["b_eq"],
                         qp["friction_coeffs"], qp["lb"], qp["ub"])
            sol = solver.GetSolution()
            eq = np.max(np.abs(qp["A_eq"] @ sol.z - qp["b_eq"]))
            assert eq < 1e-8
            assert sol.details.solve_status == 0

    def test_bad_engine_rejected(self):
        with pytest.raises(ValueError):
            FCCQP(60, 38, 12, 38, engine="gpu")
