"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcc_qp_tpu import FCCQPOptions, solve_batched
from fcc_qp_tpu.models.osc import CASSIE, QUADRUPED, generate_osc_batch, generate_osc_sequence
from fcc_qp_tpu.parallel import (
    make_mesh,
    pad_batch,
    replay_sharded,
    solve_batched_sharded,
)
from fcc_qp_tpu.utils.io import stack_qp_dicts, to_qpbatch

OPTS = FCCQPOptions(max_iter=300, rho=1.0, eps_fcone=1e-4, eps_bound=1e-4)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh()


class TestShardedSolve:
    def test_sharded_equals_unsharded(self, mesh):
        qps = generate_osc_batch(CASSIE, 16, seed=0)
        batch = to_qpbatch(stack_qp_dicts(qps))
        ref_sol, _ = solve_batched(batch, CASSIE.shape, OPTS)
        sol, ws, summary = solve_batched_sharded(
            batch, CASSIE.shape, OPTS, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(sol.z), np.asarray(ref_sol.z), atol=1e-10, rtol=0
        )
        np.testing.assert_array_equal(
            np.asarray(sol.details.n_iter), np.asarray(ref_sol.details.n_iter)
        )

    def test_batch_is_actually_sharded(self, mesh):
        qps = generate_osc_batch(QUADRUPED, 8, seed=1)
        batch = to_qpbatch(stack_qp_dicts(qps))
        sol, _, _ = solve_batched_sharded(batch, QUADRUPED.shape, OPTS, mesh=mesh)
        # output carries a non-trivial sharding across 8 devices
        assert len(sol.z.sharding.device_set) == 8

    def test_uneven_batch_padding(self, mesh):
        # 11 instances on 8 devices: padded internally, results unpadded
        qps = generate_osc_batch(QUADRUPED, 11, seed=2)
        batch = to_qpbatch(stack_qp_dicts(qps))
        ref_sol, _ = solve_batched(batch, QUADRUPED.shape, OPTS)
        sol, _, summary = solve_batched_sharded(
            batch, QUADRUPED.shape, OPTS, mesh=mesh
        )
        assert sol.z.shape[0] == 11
        np.testing.assert_allclose(
            np.asarray(sol.z), np.asarray(ref_sol.z), atol=1e-10, rtol=0
        )

    def test_summary_aggregates(self, mesh):
        qps = generate_osc_batch(CASSIE, 8, seed=3)
        batch = to_qpbatch(stack_qp_dicts(qps))
        sol, _, summary = solve_batched_sharded(batch, CASSIE.shape, OPTS, mesh=mesh)
        d = sol.details
        # padded instances included in summary counts; compare against
        # the padded batch aggregates via unpadded (8 divides 8: equal)
        assert int(summary.n_instances) == 8
        np.testing.assert_allclose(
            float(summary.max_residual_bounds),
            float(np.max(np.asarray(d.admm_residual_bounds))),
        )
        np.testing.assert_allclose(
            float(summary.max_iterations), float(np.max(np.asarray(d.n_iter)))
        )

    def test_replay_sharded_scenarios(self, mesh):
        # 8 scenario sequences of length 6 (MPC-tree shape), sharded
        seqs = [
            stack_qp_dicts(generate_osc_sequence(QUADRUPED, 6, seed=10 + i))
            for i in range(8)
        ]
        stacked = {
            k: np.stack([s[k] for s in seqs]) for k in seqs[0]
        }  # (B, T, ...)
        batch = to_qpbatch(stacked)
        sols, ws, summary = replay_sharded(batch, QUADRUPED.shape, OPTS, mesh=mesh)
        assert sols.z.shape[:2] == (8, 6)
        assert int(summary.n_instances) == 48
        # spot-check one scenario against the unsharded replay
        from fcc_qp_tpu import replay

        one = jax.tree.map(lambda a: a[3], batch)
        ref, _ = replay(one, QUADRUPED.shape, OPTS)
        np.testing.assert_allclose(
            np.asarray(sols.z[3]), np.asarray(ref.z), atol=1e-10, rtol=0
        )


class TestPadBatch:
    def test_pad_and_size(self):
        tree = {"a": jnp.arange(10.0).reshape(5, 2)}
        padded, b = pad_batch(tree, 4)
        assert b == 5
        assert padded["a"].shape == (8, 2)
        np.testing.assert_array_equal(padded["a"][5:], jnp.tile(padded["a"][4:5], (3, 1)))


class TestAutoPadDs:
    """VERDICT item 7: the ds sharded path (and the Pallas path) auto-pad
    uneven batches instead of asserting (`parallel/sharded.py`,
    `core/ds_engine.pad_batch_last`)."""

    def test_pad_batch_last(self):
        from fcc_qp_tpu.core.ds_engine import pad_batch_last

        tree = {"a": jnp.arange(10.0).reshape(2, 5)}
        padded, b = pad_batch_last(tree, 4)
        assert b == 5
        assert padded["a"].shape == (2, 8)
        np.testing.assert_array_equal(
            padded["a"][:, 5:], jnp.tile(padded["a"][:, 4:5], (1, 3))
        )

    def test_ds_sharded_uneven_batch(self, mesh):
        from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
        from fcc_qp_tpu.parallel.sharded import solve_batched_ds_sharded

        # B=5 does not divide the 8-device mesh: must pad + strip
        qps = generate_osc_sequence(QUADRUPED, 5, seed=3)
        bds = to_ds_batch(stack_qp_dicts(qps))
        o = OPTS.replace(rho=1.0)
        sol, ws, summary = solve_batched_ds_sharded(
            bds, QUADRUPED.shape, o, mesh=mesh
        )
        ref, _ = solve_batched_ds(bds, QUADRUPED.shape, o)
        assert sol.z.shape[0] == 5
        assert int(summary.n_instances) == 5
        np.testing.assert_allclose(
            np.asarray(sol.z), np.asarray(ref.z), atol=1e-8, rtol=0
        )
