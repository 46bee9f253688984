"""Two-phase iteration (phase1_tol > 0, no polish): f32 coarse phase +
ds endgame must land on the same solutions as the single-phase ds solve,
for both the XLA and (interpret-mode) Pallas chunk bodies.

Covers the `iteration32`/`lift32`/`admm_chunk_pallas32` machinery in
`core/ds_engine.py` independently of active-set polishing (test_polish
exercises it only through `polish=True`)."""

import numpy as np
import pytest

from fcc_qp_tpu import FCCQPOptions
from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_batch
from fcc_qp_tpu.utils.io import stack_qp_dicts

BASE = FCCQPOptions(
    max_iter=2000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    presolve="operator", scaling=True, splitting="constrained",
    polish=False, phase1_tol=0.0,
)


@pytest.fixture(scope="module")
def batch():
    return to_ds_batch(
        stack_qp_dicts(generate_osc_batch(CASSIE, 16, seed=5))
    )


@pytest.fixture(scope="module")
def single_phase(batch):
    sol, _ = solve_batched_ds(batch, CASSIE.shape, BASE, timing=False)
    assert (np.asarray(sol.details.solve_status) == 0).all()
    return sol


class TestTwoPhase:
    def test_xla_two_phase_matches_single_phase(self, batch, single_phase):
        opts = BASE.replace(phase1_tol=1e-2)
        sol, _ = solve_batched_ds(batch, CASSIE.shape, opts, timing=False)
        assert (np.asarray(sol.details.solve_status) == 0).all()
        # both converge to the same eps=1e-6 fixed point; iterates
        # differ (phase 1 runs in f32) so compare solutions, not paths
        np.testing.assert_allclose(
            np.asarray(sol.z), np.asarray(single_phase.z), atol=2e-4
        )
        r_b = np.asarray(sol.details.admm_residual_bounds)
        r_c = np.asarray(sol.details.admm_residual_friction_cone)
        assert (r_b <= 1e-6).all() and (r_c <= 1e-6).all()

    def test_pallas_two_phase_matches_xla_two_phase(self, batch):
        opts = BASE.replace(phase1_tol=1e-2)
        ref, _ = solve_batched_ds(batch, CASSIE.shape, opts, timing=False)
        got, _ = solve_batched_ds(
            batch, CASSIE.shape, opts, use_pallas=True,
            pallas_interpret=True, timing=False,
        )
        # same algorithm, same f32 arithmetic: per-instance iteration
        # counts must agree exactly, solutions to f32 roundoff
        np.testing.assert_array_equal(
            np.asarray(ref.details.n_iter), np.asarray(got.details.n_iter)
        )
        assert (np.asarray(got.details.solve_status) == 0).all()
        np.testing.assert_allclose(
            np.asarray(got.z), np.asarray(ref.z), atol=1e-4
        )
