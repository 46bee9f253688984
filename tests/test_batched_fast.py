"""Tests for the accelerated batch-level engine (core.batched)."""

import jax
import jax.numpy as jnp
import numpy as np

from fcc_qp_tpu import FCCQPOptions, solve_batched, solve_batched_fast
from fcc_qp_tpu.models.osc import CASSIE, QUADRUPED, generate_osc_batch, generate_osc_sequence
from fcc_qp_tpu.utils.io import stack_qp_dicts, to_qpbatch

OPTS = FCCQPOptions(max_iter=300, rho=1.0, eps_fcone=1e-6, eps_bound=1e-6)


def _cassie_batch(T=24, seed=0):
    return to_qpbatch(stack_qp_dicts(generate_osc_sequence(CASSIE, T, seed=seed)))


class TestFastEngineParity:
    def test_matches_vmap_engine_exactly(self):
        batch = _cassie_batch()
        ref, ref_w = solve_batched(batch, CASSIE.shape, OPTS)
        fast, fast_w = solve_batched_fast(batch, CASSIE.shape, OPTS)
        np.testing.assert_allclose(
            np.asarray(ref.z), np.asarray(fast.z), atol=1e-10, rtol=0
        )
        np.testing.assert_array_equal(
            np.asarray(ref.details.n_iter), np.asarray(fast.details.n_iter)
        )
        np.testing.assert_allclose(
            np.asarray(ref_w.mu_x), np.asarray(fast_w.mu_x), atol=1e-10
        )

    def test_warm_start_parity(self):
        batch = _cassie_batch()
        _, w_ref = solve_batched(batch, CASSIE.shape, OPTS)
        _, w_fast = solve_batched_fast(batch, CASSIE.shape, OPTS)
        ref2, _ = solve_batched(
            batch, CASSIE.shape, OPTS, warm=w_ref, warm_start=True
        )
        fast2, _ = solve_batched_fast(
            batch, CASSIE.shape, OPTS, warm=w_fast, warm_start=True
        )
        np.testing.assert_allclose(
            np.asarray(ref2.z), np.asarray(fast2.z), atol=1e-9, rtol=0
        )
        np.testing.assert_array_equal(
            np.asarray(ref2.details.n_iter), np.asarray(fast2.details.n_iter)
        )

    def test_equality_constrained_instances(self):
        import dataclasses
        shape = dataclasses.replace(CASSIE.shape)  # placeholder
        from fcc_qp_tpu import ProblemShape, QPBatch
        rng = np.random.default_rng(0)
        shape = ProblemShape(num_vars=12, num_eq=4, nc=0, lambda_c_start=0)
        B = 3
        G = rng.normal(size=(B, 12, 12))
        Q = jnp.asarray(np.einsum("bij,bkj->bik", G, G) + np.eye(12))
        qp = QPBatch(
            Q=Q,
            b=jnp.asarray(rng.normal(size=(B, 12))),
            A_eq=jnp.asarray(rng.normal(size=(B, 4, 12))),
            b_eq=jnp.asarray(rng.normal(size=(B, 4))),
            friction_coeffs=jnp.zeros((B, 0)),
            lb=jnp.full((B, 12), -jnp.inf),
            ub=jnp.full((B, 12), jnp.inf),
        )
        sol, _ = solve_batched_fast(qp, shape, OPTS)
        np.testing.assert_array_equal(np.asarray(sol.details.n_iter), 0)
        # equality feasibility
        r = np.einsum("bij,bj->bi", np.asarray(qp.A_eq), np.asarray(sol.z)) - np.asarray(qp.b_eq)
        assert np.max(np.abs(r)) < 1e-8


class TestAdaptiveRho:
    def test_adaptive_converges_faster(self):
        batch = _cassie_batch(T=24)
        plain = OPTS.replace(max_iter=2000)
        adapt = plain.replace(adaptive_rho=True, adaptive_rho_interval=50)
        sol_p, _ = solve_batched_fast(batch, CASSIE.shape, plain)
        sol_a, _ = solve_batched_fast(batch, CASSIE.shape, adapt)
        n_p = np.asarray(sol_p.details.n_iter)
        n_a = np.asarray(sol_a.details.n_iter)
        assert (np.asarray(sol_a.details.solve_status) == 0).all()
        assert n_a.mean() < 0.7 * n_p.mean()
        # solutions still meet the violation tolerances
        assert float(np.max(np.asarray(sol_a.details.bounds_viol))) < 1e-5
        assert float(np.max(np.asarray(sol_a.details.friction_cone_viol))) < 1e-4

    def test_adaptive_solution_agrees_with_plain(self):
        batch = _cassie_batch(T=8)
        plain = OPTS.replace(max_iter=4000, eps_fcone=1e-9, eps_bound=1e-9)
        adapt = plain.replace(adaptive_rho=True)
        sol_p, _ = solve_batched_fast(batch, CASSIE.shape, plain)
        sol_a, _ = solve_batched_fast(batch, CASSIE.shape, adapt)
        ok = (np.asarray(sol_p.details.solve_status) == 0) & (
            np.asarray(sol_a.details.solve_status) == 0
        )
        assert ok.any()
        # same optimum (both converged tightly; iterate-difference
        # residual 1e-9 bounds solution agreement at ~1e-4 abs on
        # values of scale ~400)
        np.testing.assert_allclose(
            np.asarray(sol_p.z)[ok], np.asarray(sol_a.z)[ok], atol=1e-3
        )

    def test_quadruped_adaptive(self):
        batch = to_qpbatch(
            stack_qp_dicts(generate_osc_batch(QUADRUPED, 8, seed=5))
        )
        adapt = OPTS.replace(adaptive_rho=True, max_iter=2000)
        sol, _ = solve_batched_fast(batch, QUADRUPED.shape, adapt)
        assert (np.asarray(sol.details.solve_status) == 0).mean() >= 0.7
