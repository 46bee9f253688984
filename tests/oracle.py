"""Serial NumPy oracle mirroring the reference FCCQP algorithm semantics.

This is a deliberately branchy, loop-based implementation of the algorithm
described by the reference (`/root/reference/src/fcc_qp.cpp:57-191` and
`constraint_utils.cpp:5-75`) used ONLY as a test oracle. The production
solver in `fcc_qp_tpu` is the branchless, batched, jitted implementation;
tests assert the two agree to tight tolerances.
"""

from __future__ import annotations

import numpy as np


def oracle_project_cone_single(f: np.ndarray, mu: float) -> np.ndarray:
    norm_fxy = np.linalg.norm(f[:2])
    if mu * f[2] >= norm_fxy:
        return f.copy()
    if f[2] < -mu * norm_fxy:
        return np.zeros(3)
    # Surface projection via the boundary ray, as in the reference.
    xy_ratio = mu * f[2] / norm_fxy
    cone_ray = np.array([xy_ratio * f[0], xy_ratio * f[1], f[2]])
    cone_ray = cone_ray / np.linalg.norm(cone_ray)
    return float(cone_ray @ f) * cone_ray


def oracle_project_cone(f: np.ndarray, mus) -> np.ndarray:
    out = np.zeros_like(f)
    for i in range(len(f) // 3):
        out[3 * i : 3 * i + 3] = oracle_project_cone_single(
            f[3 * i : 3 * i + 3], mus[i]
        )
    return out


def oracle_project_bounds(x, lb, ub):
    return np.minimum(np.maximum(x, lb), ub)


def oracle_cone_violation(f, mus):
    viol = 0.0
    for i in range(len(f) // 3):
        fz = f[3 * i + 2]
        viol += max(0.0, np.linalg.norm(f[3 * i : 3 * i + 2]) - mus[i] * fz)
    return viol


def oracle_bound_violation(x, lb, ub):
    return float(np.linalg.norm(x - oracle_project_bounds(x, lb, ub)))


class OracleFCCQP:
    """Serial mirror of the reference solver (LDLT replaced by np solve)."""

    def __init__(self, num_vars, num_eq, nc, lambda_c_start):
        assert nc % 3 == 0
        assert lambda_c_start + nc <= num_vars
        self.nv = num_vars
        self.ne = num_eq
        self.nc = nc
        self.ls = lambda_c_start
        self.max_iter = 1000
        self.rho = 1e-6
        self.eps_fcone = 1e-3
        self.eps_bound = 1e-6
        self.warm_start = False
        self.x = np.zeros(self.nv)
        self.mu_x = np.zeros(self.nv)
        self.mu_lam = np.zeros(self.nc)

    def solve(self, Q, b, A_eq, b_eq, friction_coeffs, lb, ub):
        nv, ne, nc, ls = self.nv, self.ne, self.nc, self.ls
        N = nv + ne
        eq_constrained = nc == 0 and np.all(np.isinf(lb)) and np.all(np.isinf(ub))

        if not self.warm_start:
            self.mu_x[:] = 0.0
            self.mu_lam[:] = 0.0

        M_pre = np.zeros((N, N))
        M_pre[:nv, :nv] = Q
        M_pre[nv:, :nv] = A_eq
        M_pre[:nv, nv:] = A_eq.T
        b_kkt = np.concatenate([-b, b_eq])

        if eq_constrained or not self.warm_start:
            try:
                sol = np.linalg.solve(M_pre, b_kkt)
            except np.linalg.LinAlgError:
                sol, *_ = np.linalg.lstsq(M_pre, b_kkt, rcond=None)
            if not np.all(np.isfinite(sol)):
                sol, *_ = np.linalg.lstsq(M_pre, b_kkt, rcond=None)
            self.x = sol[:nv]

        n_iter = 0
        x_res_norm = 0.0
        lam_res_norm = 0.0
        if not eq_constrained:
            M_kkt = M_pre.copy()
            M_kkt[:nv, :nv] += self.rho * np.eye(nv)
            # factorize once per solve (mirrors the per-solve LDLT);
            # rank-deficient A_eq makes M_kkt exactly singular — fall
            # back to the pseudoinverse, the analog of the reference's
            # COD fallback (fcc_qp.cpp:163-177)
            try:
                Minv = np.linalg.inv(M_kkt)
                if not np.all(np.isfinite(Minv)) or (
                    np.linalg.norm(M_kkt @ Minv - np.eye(N)) > 1e-6 * N
                ):
                    raise np.linalg.LinAlgError
            except np.linalg.LinAlgError:
                Minv = np.linalg.pinv(M_kkt)

            x = self.x.copy()
            x_bar = x.copy()
            lam_bar = x[ls : ls + nc].copy()
            n_iter = self.max_iter
            for it in range(self.max_iter):
                q_rho = -self.rho * (x_bar - self.mu_x)
                q_rho[ls : ls + nc] = -self.rho * (lam_bar - self.mu_lam)
                rhs = np.concatenate([-(b + q_rho), b_eq])
                x = (Minv @ rhs)[:nv]
                x_bar = oracle_project_bounds(x + self.mu_x, lb, ub)
                lam_bar = oracle_project_cone(
                    x[ls : ls + nc] + self.mu_lam, friction_coeffs
                )
                x_res = x - x_bar
                lam_res = x[ls : ls + nc] - lam_bar
                x_res_norm = float(np.max(np.abs(x_res))) if nv else 0.0
                lam_res_norm = float(np.max(np.abs(lam_res))) if nc else 0.0
                self.mu_x += x_res
                self.mu_lam += lam_res
                if lam_res_norm < self.eps_fcone and x_res_norm < self.eps_bound:
                    n_iter = it
                    break
            self.x = x

        return {
            "z": self.x.copy(),
            "n_iter": n_iter,
            "eps_bounds": x_res_norm,
            "eps_friction_cone": lam_res_norm,
            "bounds_viol": oracle_bound_violation(self.x, lb, ub),
            "friction_cone_viol": oracle_cone_violation(
                self.x[ls : ls + nc], friction_coeffs
            ),
            "solve_status": 1 if n_iter == self.max_iter else 0,
        }
