"""Cone-aware Ruiz equilibration (`ops/scaling.py`)."""

import numpy as np

from fcc_qp_tpu.core.ds_engine import to_ds_batch
from fcc_qp_tpu.models.osc import CASSIE, generate_osc_batch
from fcc_qp_tpu.ops.scaling import apply_scaling, ruiz_scaling
from fcc_qp_tpu.utils.io import stack_qp_dicts

from oracle import oracle_project_cone

SHAPE = CASSIE.shape


def _scaled_batch(B=8, seed=1):
    bds = to_ds_batch(stack_qp_dicts(generate_osc_batch(CASSIE, B, seed=seed)))
    sc = ruiz_scaling(bds.Q.hi, bds.A_eq.hi, bds.b.hi, SHAPE, iters=8)
    return bds, sc, apply_scaling(bds, sc, SHAPE)


class TestRuiz:
    def test_equilibrates_kkt_rows(self):
        _, _, qs = _scaled_batch()
        Q = np.asarray(qs.Q.hi)
        A = np.asarray(qs.A_eq.hi)
        var_rows = np.maximum(np.abs(Q).max(axis=1), np.abs(A).max(axis=0))
        eq_rows = np.abs(A).max(axis=1)
        assert var_rows.min() > 0.3 and var_rows.max() < 3.0
        assert eq_rows.min() > 0.3 and eq_rows.max() < 3.0

    def test_cone_tangentials_share_scale(self):
        _, sc, _ = _scaled_batch()
        d = np.asarray(sc.d)
        ls, nc = SHAPE.lambda_c_start, SHAPE.nc
        seg = d[ls : ls + nc].reshape(nc // 3, 3, -1)
        np.testing.assert_allclose(seg[:, 0], seg[:, 1], rtol=1e-5)

    def test_infinite_bounds_pass_through(self):
        bds, _, qs = _scaled_batch()
        lb0 = np.asarray(bds.lb.hi)
        lbs = np.asarray(qs.lb.hi)
        inf_mask = ~np.isfinite(lb0)
        assert inf_mask.any()
        assert np.all(lbs[inf_mask] == lb0[inf_mask])
        assert np.all(np.isfinite(np.asarray(qs.lb.lo)))

    def test_cone_membership_invariance(self):
        """The scaled cone with effective coefficients contains exactly
        the scaled images of the original cone: f in K  <=>  f/d in K~.
        (Projection itself need not commute — ADMM in the scaled space
        projects in the scaled metric, which changes iterates but not
        the fixed point.)"""
        rng = np.random.default_rng(0)
        bds, sc, qs = _scaled_batch()
        d = np.asarray(sc.d, np.float64)
        ls, nc = SHAPE.lambda_c_start, SHAPE.nc
        B = d.shape[-1]
        mu0 = np.asarray(bds.friction_coeffs.hi, np.float64)
        mu_eff = np.asarray(qs.friction_coeffs.hi, np.float64) + np.asarray(
            qs.friction_coeffs.lo, np.float64
        )

        def margin(f, mus):
            f3 = f.reshape(-1, 3)
            return mus * f3[:, 2] - np.linalg.norm(f3[:, :2], axis=1)

        checked = 0
        for b in range(B):
            for _ in range(16):
                f = rng.normal(scale=100.0, size=nc)
                dseg = d[ls : ls + nc, b]
                m1 = margin(f, mu0[:, b])
                m2 = margin(f / dseg, mu_eff[:, b])
                # compare membership only where it is numerically
                # unambiguous (exact boundary points flip with rounding)
                clear = np.abs(m1) > 1e-6 * (1.0 + np.abs(f.reshape(-1, 3)).max(1))
                np.testing.assert_array_equal(m1[clear] > 0, m2[clear] > 0)
                checked += int(clear.sum())
        assert checked > 100
