"""ds-engine correctness vs the f64 reference engine (CPU)."""

import jax
import numpy as np
import pytest

from fcc_qp_tpu import FCCQPOptions, solve_batched_fast
from fcc_qp_tpu.core.ds_engine import (
    solve_batched_ds,
    to_ds_batch,
)
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_sequence
from fcc_qp_tpu.utils.io import stack_qp_dicts, to_qpbatch

OPTS = FCCQPOptions(max_iter=300, rho=1.0, eps_fcone=1e-6, eps_bound=1e-6)


@pytest.fixture(scope="module")
def cassie_data():
    qps = generate_osc_sequence(CASSIE, 8, seed=0)
    stacked = stack_qp_dicts(qps)
    return stacked, to_qpbatch(stacked), to_ds_batch(stacked)


class TestDsEngine:
    def test_matches_f64_engine(self, cassie_data):
        stacked, b64, bds = cassie_data
        ref, _ = solve_batched_fast(b64, CASSIE.shape, OPTS)
        got, _ = solve_batched_ds(bds, CASSIE.shape, OPTS)
        nr = np.asarray(ref.details.n_iter)
        ng = np.asarray(got.details.n_iter)
        # demonstrated behavior (r5): EXACT iteration-count agreement —
        # ds resolves every active-set boundary this batch crosses the
        # same way f64 does. A fork here is a real precision change;
        # investigate rather than loosen (the old 75% bar let a round-3
        # regression hide).
        np.testing.assert_array_equal(ng, nr)
        conv = nr < OPTS.max_iter
        if conv.any():
            # converged solutions agree at the residual-tolerance level
            dz = np.max(np.abs(np.asarray(ref.z) - np.asarray(got.z))[conv])
            assert dz < 1e-3

    def test_residuals_below_tolerance(self, cassie_data):
        _, _, bds = cassie_data
        opts = OPTS.replace(max_iter=2000, adaptive_rho=True)
        sol, _ = solve_batched_ds(bds, CASSIE.shape, opts)
        st = np.asarray(sol.details.solve_status)
        assert (st == 0).all()
        assert float(np.max(np.asarray(sol.details.admm_residual_bounds))) < 1e-6
        assert (
            float(np.max(np.asarray(sol.details.admm_residual_friction_cone)))
            < 1e-6
        )

    def test_warm_start_reduces_iterations(self, cassie_data):
        _, _, bds = cassie_data
        opts = OPTS.replace(max_iter=2000, adaptive_rho=True)
        sol1, warm = solve_batched_ds(bds, CASSIE.shape, opts)
        sol2, _ = solve_batched_ds(
            bds, CASSIE.shape, opts, warm=warm, warm_start=True
        )
        n1 = np.asarray(sol1.details.n_iter)
        n2 = np.asarray(sol2.details.n_iter)
        # re-solving the identical problem warm converges immediately
        assert np.median(n2) <= np.median(n1) * 0.1 + 2

    def test_feasibility_of_solutions(self, cassie_data):
        stacked, _, bds = cassie_data
        opts = OPTS.replace(max_iter=2000, adaptive_rho=True)
        sol, _ = solve_batched_ds(bds, CASSIE.shape, opts)
        z = np.asarray(sol.z)
        A = stacked["A_eq"]
        beq = stacked["b_eq"]
        eq_res = np.max(np.abs(np.einsum("bij,bj->bi", A, z) - beq))
        assert eq_res < 1e-5
        assert float(np.max(np.asarray(sol.details.bounds_viol))) < 1e-4
        assert float(np.max(np.asarray(sol.details.friction_cone_viol))) < 1e-4

    # NB: the quadruped/humanoid FLAGSHIP-config convergence tests live
    # in tests/test_models_flagship.py — each robot shape compiles its
    # own large programs, and one process holding this file's programs
    # PLUS two more shapes segfaults XLA:CPU (the run_tests.py
    # isolation rationale, reproduced r5).


FAST_OPTS = FCCQPOptions(
    max_iter=2000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
    scaling=True, splitting="constrained", presolve="operator",
)


class TestReducedScaledEngine:
    """The performance path: Ruiz equilibration + constrained-subspace
    splitting (`ops/scaling.py`, `_solve_ds_reduced_jit`)."""

    def test_matches_legacy_engine_solution(self, cassie_data):
        stacked, _, bds = cassie_data
        ref, _ = solve_batched_ds(
            bds, CASSIE.shape, OPTS.replace(max_iter=2000, adaptive_rho=True)
        )
        got, _ = solve_batched_ds(bds, CASSIE.shape, FAST_OPTS)
        assert (np.asarray(got.details.solve_status) == 0).all()
        # different trajectories to the same fixed point: solutions agree
        # to tolerance-limited accuracy (near-degenerate instances have
        # flat directions), objectives to much better
        zr = np.asarray(ref.z)
        zg = np.asarray(got.z)
        assert np.max(np.abs(zr - zg)) < 5e-2

        def obj(z):
            Qz = np.einsum("bij,bj->bi", stacked["Q"], z)
            return 0.5 * np.sum(z * Qz, axis=1) + np.sum(
                stacked["b"] * z, axis=1
            )
        rel = np.abs(obj(zg) - obj(zr)) / (1.0 + np.abs(obj(zr)))
        assert np.max(rel) < 1e-5

    def test_converges_faster_than_full_splitting(self, cassie_data):
        _, _, bds = cassie_data
        full, _ = solve_batched_ds(
            bds, CASSIE.shape, OPTS.replace(max_iter=2000, adaptive_rho=True)
        )
        red, _ = solve_batched_ds(bds, CASSIE.shape, FAST_OPTS)
        assert (
            np.asarray(red.details.n_iter).sum()
            < np.asarray(full.details.n_iter).sum()
        )

    def test_residuals_below_unscaled_tolerance(self, cassie_data):
        stacked, _, bds = cassie_data
        sol, _ = solve_batched_ds(bds, CASSIE.shape, FAST_OPTS)
        z = np.asarray(sol.z)
        # feasibility in ORIGINAL (unscaled) units
        eq = np.max(
            np.abs(np.einsum("bij,bj->bi", stacked["A_eq"], z) - stacked["b_eq"])
        )
        assert eq < 1e-4
        assert float(np.max(np.asarray(sol.details.bounds_viol))) < 1e-4
        assert float(np.max(np.asarray(sol.details.friction_cone_viol))) < 1e-4

    def test_warm_restart_identical_problem(self, cassie_data):
        _, _, bds = cassie_data
        sol1, warm = solve_batched_ds(bds, CASSIE.shape, FAST_OPTS)
        sol2, _ = solve_batched_ds(
            bds, CASSIE.shape, FAST_OPTS, warm=warm, warm_start=True
        )
        n1 = np.asarray(sol1.details.n_iter)
        n2 = np.asarray(sol2.details.n_iter)
        assert np.median(n2) <= np.median(n1) * 0.1 + 2

    def test_scaling_only_and_splitting_only(self, cassie_data):
        # scaling=False + splitting='constrained' forces equilibration
        # internally (near-singular (1,1) block otherwise; see
        # _scale_reduced) — assert FEASIBILITY, not just status: the
        # advisor measured |A_eq z - b_eq| up to 42 with status 0 before
        # the gate existed.
        _, _, bds = cassie_data
        for kw in (dict(scaling=True, splitting="full"),
                   dict(scaling=False, splitting="constrained", rho=0.3,
                        max_iter=4000),
                   dict(scaling=False, splitting="constrained",
                        kkt_factor="ds", rho=0.3, max_iter=4000)):
            o = FAST_OPTS.replace(**kw)
            sol, _ = solve_batched_ds(bds, CASSIE.shape, o)
            assert (np.asarray(sol.details.solve_status) == 0).all()
            eqv = np.asarray(sol.details.equality_viol)
            assert eqv.max() < 1e-4, f"equality-infeasible: {eqv.max()}"


class TestDsReplayAndSharding:
    def test_replay_ds_warm_start(self):
        from fcc_qp_tpu.core.ds_engine import replay_ds, to_ds_batch

        qps = generate_osc_sequence(CASSIE, 6, seed=0)
        bds = to_ds_batch(stack_qp_dicts(qps))
        sols, ws = replay_ds(bds, CASSIE.shape, FAST_OPTS)
        n = np.asarray(sols.details.n_iter).ravel()
        st = np.asarray(sols.details.solve_status).ravel()
        assert (st == 0).all()
        # warm-started replay needs fewer total iterations than cold
        # solves of the SAME steps (step hardness varies along the gait,
        # so comparing different steps would be meaningless)
        cold, _ = solve_batched_ds(bds, CASSIE.shape, FAST_OPTS)
        ncold = np.asarray(cold.details.n_iter)
        assert n[1:].sum() < ncold[1:].sum()

    def test_replay_streams_matches_per_stream_replay(self):
        """Multi-stream warm replay == independent serial warm replay of
        each stream (the reference loop semantics, fcc_qp_test.py:85-89)."""
        from fcc_qp_tpu.core.ds_engine import (
            replay_ds, replay_ds_streams, to_ds_batch,
        )

        T, S = 8, 2
        steps = T // S
        qps = generate_osc_sequence(CASSIE, T, seed=0)
        bds = to_ds_batch(stack_qp_dicts(qps))
        sols, ws = replay_ds_streams(bds, CASSIE.shape, FAST_OPTS, n_streams=S)
        assert (np.asarray(sols.details.solve_status) == 0).all()
        for s in range(S):
            sub = jax.tree.map(
                lambda a: a[..., steps * s : steps * (s + 1)], bds
            )
            ref, _ = replay_ds(sub, CASSIE.shape, FAST_OPTS)
            zr = np.asarray(ref.z).reshape(steps, -1)
            zg = np.asarray(sols.z)[steps * s : steps * (s + 1)]
            np.testing.assert_allclose(zg, zr, atol=1e-8)
            np.testing.assert_array_equal(
                np.asarray(sols.details.n_iter)[steps * s : steps * (s + 1)],
                np.asarray(ref.details.n_iter).ravel(),
            )

    def test_replay_streams_warm_cuts_iterations(self):
        from fcc_qp_tpu.core.ds_engine import replay_ds_streams, to_ds_batch

        T, S = 12, 2
        qps = generate_osc_sequence(CASSIE, T, seed=0)
        bds = to_ds_batch(stack_qp_dicts(qps))
        sols, _ = replay_ds_streams(bds, CASSIE.shape, FAST_OPTS, n_streams=S)
        n = np.asarray(sols.details.n_iter)
        cold, _ = solve_batched_ds(bds, CASSIE.shape, FAST_OPTS)
        ncold = np.asarray(cold.details.n_iter)
        steps = T // S
        warm_mask = np.arange(T) % steps != 0
        assert n[warm_mask].sum() < ncold[warm_mask].sum()
        # degenerate single-step case: equals the plain cold batch
        sols1, _ = replay_ds_streams(
            bds, CASSIE.shape, FAST_OPTS, n_streams=T
        )
        np.testing.assert_allclose(
            np.asarray(sols1.z), np.asarray(cold.z), atol=0
        )

    def test_sharded_reduced_equals_unsharded(self):
        from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
        from fcc_qp_tpu.models.osc import generate_osc_batch
        from fcc_qp_tpu.parallel import make_mesh
        from fcc_qp_tpu.parallel.sharded import solve_batched_ds_sharded

        bds = to_ds_batch(
            stack_qp_dicts(generate_osc_batch(CASSIE, 16, seed=3))
        )
        opts = FAST_OPTS.replace(max_iter=600)
        ref, _ = solve_batched_ds(bds, CASSIE.shape, opts)
        sol, ws, summary = solve_batched_ds_sharded(
            bds, CASSIE.shape, opts, mesh=make_mesh()
        )
        np.testing.assert_allclose(
            np.asarray(ref.z), np.asarray(sol.z), atol=1e-9
        )
        assert len(sol.z.sharding.device_set) == 8

    def test_sharded_ds_equals_unsharded(self):
        from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
        from fcc_qp_tpu.models.osc import generate_osc_batch
        from fcc_qp_tpu.parallel import make_mesh
        from fcc_qp_tpu.parallel.sharded import solve_batched_ds_sharded

        bds = to_ds_batch(
            stack_qp_dicts(generate_osc_batch(CASSIE, 16, seed=0))
        )
        opts = OPTS.replace(max_iter=150, presolve="operator")
        ref, _ = solve_batched_ds(bds, CASSIE.shape, opts)
        sol, ws, summary = solve_batched_ds_sharded(
            bds, CASSIE.shape, opts, mesh=make_mesh()
        )
        np.testing.assert_allclose(
            np.asarray(ref.z), np.asarray(sol.z), atol=1e-9
        )
        assert len(sol.z.sharding.device_set) == 8
        assert int(summary.n_instances) == 16


class TestPallasKernelInterpret:
    def test_pallas_chunk_matches_xla(self):
        from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
        from fcc_qp_tpu.models.osc import generate_osc_batch

        bds = to_ds_batch(
            stack_qp_dicts(generate_osc_batch(CASSIE, 128, seed=0))
        )
        opts = OPTS.replace(max_iter=40, presolve="operator")
        ref, _ = solve_batched_ds(bds, CASSIE.shape, opts)
        got, _ = solve_batched_ds(
            bds, CASSIE.shape, opts, use_pallas=True, pallas_interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(ref.details.n_iter), np.asarray(got.details.n_iter)
        )
        assert float(np.max(np.abs(np.asarray(ref.z) - np.asarray(got.z)))) < 1e-4

    def test_pallas_reduced_matches_xla(self):
        from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
        from fcc_qp_tpu.models.osc import generate_osc_batch

        bds = to_ds_batch(
            stack_qp_dicts(generate_osc_batch(CASSIE, 128, seed=0))
        )
        opts = FAST_OPTS.replace(max_iter=60, adaptive_rho=False)
        ref, _ = solve_batched_ds(bds, CASSIE.shape, opts)
        got, _ = solve_batched_ds(
            bds, CASSIE.shape, opts, use_pallas=True, pallas_interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(ref.details.n_iter), np.asarray(got.details.n_iter)
        )
        assert float(np.max(np.abs(np.asarray(ref.z) - np.asarray(got.z)))) < 1e-4
