"""Tests for the OSC QP generators and log IO."""

import numpy as np
import pytest

from fcc_qp_tpu import FCCQPOptions, replay, solve_batched
from fcc_qp_tpu.models.osc import (
    CASSIE,
    HUMANOID,
    QUADRUPED,
    generate_osc_batch,
    generate_osc_sequence,
)
from fcc_qp_tpu.utils.io import (
    load_qp_log_npz,
    load_qp_log_packed,
    save_qp_log_npz,
    save_qp_log_packed,
    stack_qp_dicts,
    to_qpbatch,
)


class TestRobotModels:
    def test_cassie_matches_reference_dims(self):
        # Reference benchmark dims: FCCQP(60, 38, 12, 38)
        # (`/root/reference/fcc_qp_test.py:77`).
        s = CASSIE.shape
        assert (s.num_vars, s.num_eq, s.nc, s.lambda_c_start) == (60, 38, 12, 38)

    def test_all_models_valid(self):
        for m in (CASSIE, QUADRUPED, HUMANOID):
            s = m.shape
            assert s.nc % 3 == 0
            assert s.lambda_c_start + s.nc <= s.num_vars

    @pytest.mark.parametrize("model", [QUADRUPED, HUMANOID])
    def test_model_batches_solve_at_full_eps(self, model):
        """BASELINE configs 3-4: domain-randomized quadruped and
        humanoid (n=76) batches solve through the flagship ds engine to
        eps=1e-6, 100% convergence (small batch here; `bench.py
        --model` runs the same configs at throughput scale)."""
        from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch

        bds = to_ds_batch(
            stack_qp_dicts(generate_osc_batch(model, 8, seed=3))
        )
        opts = FCCQPOptions(
            max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
            presolve="operator", scaling=True, splitting="constrained",
            polish=True, polish_rounds=3, polish_newton_steps=4,
        )
        sol, _ = solve_batched_ds(bds, model.shape, opts)
        assert (np.asarray(sol.details.solve_status) == 0).all()
        assert float(
            np.max(np.asarray(sol.details.admm_residual_bounds))
        ) <= 1e-6
        assert float(
            np.max(np.asarray(sol.details.admm_residual_friction_cone))
        ) <= 1e-6

    @pytest.mark.parametrize("model", [CASSIE, QUADRUPED])
    def test_generated_qps_well_posed(self, model):
        qps = generate_osc_sequence(model, 5, seed=1)
        s = model.shape
        for qp in qps:
            assert qp["Q"].shape == (s.num_vars, s.num_vars)
            assert qp["A_eq"].shape == (s.num_eq, s.num_vars)
            # symmetric PSD cost
            np.testing.assert_allclose(qp["Q"], qp["Q"].T, atol=1e-12)
            eigs = np.linalg.eigvalsh(qp["Q"])
            assert eigs.min() > -1e-10
            # full row-rank equality constraints
            assert np.linalg.matrix_rank(qp["A_eq"]) == s.num_eq
            # API contract: contact vars unbounded
            ls, nc = s.lambda_c_start, s.nc
            assert np.all(np.isinf(qp["lb"][ls : ls + nc]))
            assert np.all(np.isinf(qp["ub"][ls : ls + nc]))

    def test_sequence_is_smooth(self):
        qps = generate_osc_sequence(CASSIE, 10, seed=0)
        dq = np.linalg.norm(qps[1]["Q"] - qps[0]["Q"]) / np.linalg.norm(qps[0]["Q"])
        assert dq < 0.1  # consecutive problems are close (warm-startable)

    def test_replay_solves_and_warm_start_helps(self):
        qps = generate_osc_sequence(CASSIE, 40, seed=0)
        batch = to_qpbatch(stack_qp_dicts(qps))
        opts = FCCQPOptions(max_iter=1500, rho=1.0, eps_fcone=1e-4, eps_bound=1e-4)
        sols, _ = replay(batch, CASSIE.shape, opts)
        n = np.asarray(sols.details.n_iter)
        status = np.asarray(sols.details.solve_status)
        assert (status == 0).mean() > 0.9
        # warm-started solves need fewer iterations than the cold one
        assert np.median(n[1:]) < n[0]

    def test_batch_generator(self):
        qps = generate_osc_batch(QUADRUPED, 8, seed=3)
        assert len(qps) == 8
        batch = to_qpbatch(stack_qp_dicts(qps))
        opts = FCCQPOptions(max_iter=800, rho=1.0, eps_fcone=1e-4, eps_bound=1e-4)
        sols, _ = solve_batched(batch, QUADRUPED.shape, opts)
        assert (np.asarray(sols.details.solve_status) == 0).mean() > 0.7


class TestLogIO:
    def test_npz_roundtrip_reference_schema(self, tmp_path):
        qps = generate_osc_sequence(CASSIE, 4, seed=0)
        path = str(tmp_path / "id_qp_log_test.npz")
        save_qp_log_npz(path, qps)
        loaded = load_qp_log_npz(path)
        assert len(loaded) == 4
        # must load exactly like the reference does (fcc_qp_test.py:22-30)
        data = np.load(path, allow_pickle=True)
        qp0 = data["qps"][0]
        for k in ("Q", "b", "A_eq", "b_eq", "friction_coeffs", "lb", "ub"):
            np.testing.assert_array_equal(qp0[k], qps[0][k])

    def test_packed_roundtrip(self, tmp_path):
        qps = generate_osc_sequence(QUADRUPED, 3, seed=0)
        path = str(tmp_path / "log.fqlog")
        save_qp_log_packed(path, qps)
        loaded = load_qp_log_packed(path)
        stacked = stack_qp_dicts(qps)
        for k in stacked:
            np.testing.assert_array_equal(loaded[k], stacked[k])

    def test_packed_rejects_garbage(self, tmp_path):
        path = str(tmp_path / "bad.fqlog")
        with open(path, "wb") as f:
            f.write(b"NOPE" + b"\x00" * 100)
        with pytest.raises(ValueError):
            load_qp_log_packed(path)


class TestWarmStartCheckpoint:
    """SURVEY.md §5.4: on-disk persistence of the warm-start pytree."""

    def test_ds_roundtrip_bit_exact(self, tmp_path):
        import jax
        import numpy as np

        from fcc_qp_tpu import FCCQPOptions
        from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
        from fcc_qp_tpu.models.osc import CASSIE, generate_osc_batch
        from fcc_qp_tpu.utils.io import (
            load_warm_start,
            save_warm_start,
            stack_qp_dicts,
        )

        bds = to_ds_batch(stack_qp_dicts(generate_osc_batch(CASSIE, 4, seed=0)))
        opts = FCCQPOptions(
            max_iter=800, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
            scaling=True, splitting="constrained", presolve="operator",
        )
        sol, warm = solve_batched_ds(bds, CASSIE.shape, opts)
        path = str(tmp_path / "warm.npz")
        save_warm_start(path, warm)
        w2 = load_warm_start(path)
        for a, b in zip(jax.tree.leaves(warm), jax.tree.leaves(w2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resuming from the checkpoint behaves like resuming in-memory
        s_mem, _ = solve_batched_ds(
            bds, CASSIE.shape, opts, warm=warm, warm_start=True
        )
        s_ckpt, _ = solve_batched_ds(
            bds, CASSIE.shape, opts, warm=w2, warm_start=True
        )
        np.testing.assert_array_equal(
            np.asarray(s_mem.details.n_iter), np.asarray(s_ckpt.details.n_iter)
        )
        np.testing.assert_array_equal(
            np.asarray(s_mem.z), np.asarray(s_ckpt.z)
        )

    def test_f64_roundtrip(self, tmp_path):
        import jax
        import numpy as np

        from fcc_qp_tpu import FCCQPOptions, solve_batched
        from fcc_qp_tpu.models.osc import CASSIE, generate_osc_batch
        from fcc_qp_tpu.utils.io import (
            load_warm_start,
            save_warm_start,
            stack_qp_dicts,
            to_qpbatch,
        )

        qp = to_qpbatch(stack_qp_dicts(generate_osc_batch(CASSIE, 2, seed=1)))
        opts = FCCQPOptions(max_iter=200, rho=0.3, eps_fcone=1e-6,
                            eps_bound=1e-6)
        _, warm = solve_batched(qp, CASSIE.shape, opts)
        path = str(tmp_path / "warm64.npz")
        save_warm_start(path, warm)
        w2 = load_warm_start(path)
        for a, b in zip(jax.tree.leaves(warm), jax.tree.leaves(w2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
