"""Unit tests for L0 projection ops against hand cases and the numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcc_qp_tpu.ops import (
    calc_bound_violation,
    calc_friction_cone_violation,
    project_to_bounds,
    project_to_friction_cone,
    validate_bounds,
)
from oracle import (
    oracle_bound_violation,
    oracle_cone_violation,
    oracle_project_bounds,
    oracle_project_cone,
)


class TestConeProjection:
    def test_interior_identity(self):
        f = jnp.array([0.1, 0.1, 10.0])
        mu = jnp.array([1.0])
        np.testing.assert_allclose(project_to_friction_cone(f, mu), f)

    def test_polar_cone_zero(self):
        # fz strongly negative: closest point is the origin.
        f = jnp.array([0.1, 0.1, -10.0])
        mu = jnp.array([1.0])
        np.testing.assert_allclose(
            project_to_friction_cone(f, mu), jnp.zeros(3)
        )

    def test_surface_projection_hand_case(self):
        # mu=1, f=(1, 0, 0): project onto 45-degree cone -> (0.5, 0, 0.5)
        f = jnp.array([1.0, 0.0, 0.0])
        mu = jnp.array([1.0])
        np.testing.assert_allclose(
            project_to_friction_cone(f, mu), jnp.array([0.5, 0.0, 0.5]),
            atol=1e-15,
        )

    def test_fz_zero_no_nan(self):
        # The reference's ray normalization would 0/0 here; ours must not.
        f = jnp.array([3.0, 4.0, 0.0])
        mu = jnp.array([0.5])
        out = project_to_friction_cone(f, mu)
        assert np.all(np.isfinite(out))
        # result must lie on the cone surface: mu*fz == ||fxy||
        np.testing.assert_allclose(
            mu[0] * out[2], jnp.linalg.norm(out[:2]), rtol=1e-12
        )

    def test_zero_vector(self):
        f = jnp.zeros(3)
        mu = jnp.array([0.7])
        np.testing.assert_allclose(project_to_friction_cone(f, mu), f)

    def test_projection_is_idempotent_and_feasible(self, rng):
        f = jnp.asarray(rng.normal(size=(50, 12)) * 10)
        mu = jnp.asarray(rng.uniform(0.2, 1.5, size=(50, 4)))
        p = project_to_friction_cone(f, mu)
        # feasible: mu*fz >= ||fxy|| (up to fp slack)
        p3 = np.asarray(p).reshape(50, 4, 3)
        mus = np.asarray(mu)
        nxy = np.linalg.norm(p3[..., :2], axis=-1)
        assert np.all(mus * p3[..., 2] >= nxy - 1e-9)
        # idempotent
        np.testing.assert_allclose(
            project_to_friction_cone(p, mu), p, atol=1e-12
        )

    def test_matches_oracle_randomized(self, rng):
        f = rng.normal(size=(200, 12)) * 5
        mu = rng.uniform(0.1, 2.0, size=(200, 4))
        ours = np.asarray(project_to_friction_cone(jnp.asarray(f), jnp.asarray(mu)))
        for i in range(200):
            ref = oracle_project_cone(f[i], mu[i])
            np.testing.assert_allclose(ours[i], ref, atol=1e-12, err_msg=f"i={i}")

    def test_optimality_via_nearest_point(self, rng):
        # Projection must be closer to f than any other feasible point.
        f = rng.normal(size=(20, 3)) * 3
        mu = rng.uniform(0.3, 1.5, size=(20, 1))
        p = np.asarray(
            project_to_friction_cone(jnp.asarray(f), jnp.asarray(mu))
        )
        for i in range(20):
            d_star = np.linalg.norm(p[i] - f[i])
            # random feasible points
            for _ in range(100):
                xy = rng.normal(size=2)
                z = np.linalg.norm(xy) / mu[i, 0] + abs(rng.normal())
                cand = np.array([xy[0], xy[1], z])
                assert np.linalg.norm(cand - f[i]) >= d_star - 1e-9

    def test_empty_cone_segment(self):
        f = jnp.zeros((0,))
        mu = jnp.zeros((0,))
        assert project_to_friction_cone(f, mu).shape == (0,)

    def test_vmap_consistency(self, rng):
        f = jnp.asarray(rng.normal(size=(8, 6)))
        mu = jnp.asarray(rng.uniform(0.5, 1.0, size=(8, 2)))
        batched = project_to_friction_cone(f, mu)
        vmapped = jax.vmap(project_to_friction_cone)(f, mu)
        np.testing.assert_allclose(batched, vmapped, atol=1e-15)


class TestBoundsOps:
    def test_project_matches_oracle(self, rng):
        x = rng.normal(size=(100, 20)) * 10
        lb = rng.normal(size=(100, 20)) - 5
        ub = lb + rng.uniform(0, 10, size=(100, 20))
        ours = np.asarray(project_to_bounds(jnp.asarray(x), jnp.asarray(lb), jnp.asarray(ub)))
        for i in range(100):
            np.testing.assert_allclose(ours[i], oracle_project_bounds(x[i], lb[i], ub[i]))

    def test_infinite_bounds_identity(self, rng):
        x = jnp.asarray(rng.normal(size=30))
        inf = jnp.full(30, jnp.inf)
        np.testing.assert_allclose(project_to_bounds(x, -inf, inf), x)

    def test_bound_violation(self, rng):
        x = rng.normal(size=(50, 10)) * 4
        lb = np.full((50, 10), -1.0)
        ub = np.full((50, 10), 1.0)
        ours = np.asarray(calc_bound_violation(jnp.asarray(x), jnp.asarray(lb), jnp.asarray(ub)))
        for i in range(50):
            np.testing.assert_allclose(
                ours[i], oracle_bound_violation(x[i], lb[i], ub[i]), rtol=1e-12
            )

    def test_validate_bounds(self):
        lb = jnp.array([0.0, 1.0])
        ub = jnp.array([1.0, 2.0])
        assert bool(validate_bounds(lb, ub))
        assert not bool(validate_bounds(ub, lb))


class TestConeViolation:
    def test_zero_inside(self):
        f = jnp.array([0.0, 0.0, 5.0, 0.1, 0.0, 1.0])
        mu = jnp.array([1.0, 1.0])
        assert float(calc_friction_cone_violation(f, mu)) == 0.0

    def test_matches_oracle(self, rng):
        f = rng.normal(size=(100, 12)) * 5
        mu = rng.uniform(0.1, 2.0, size=(100, 4))
        ours = np.asarray(
            calc_friction_cone_violation(jnp.asarray(f), jnp.asarray(mu))
        )
        for i in range(100):
            np.testing.assert_allclose(
                ours[i], oracle_cone_violation(f[i], mu[i]), rtol=1e-12
            )
