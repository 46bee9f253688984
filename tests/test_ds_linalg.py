"""ds linear algebra vs f64 references (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import fcc_qp_tpu.ops.ds as ds
from fcc_qp_tpu.ops.ds_linalg import (
    chol_regularized_ds,
    cholesky_ds,
    matmul_ds,
    matvec_ds,
    schur_kkt_factor_ds,
    transpose_ds,
    tri_solve_lower_ds,
    tri_solve_upper_ds,
)


def as_ds(a):
    """Convert (B, ...) batch-leading numpy to batch-LAST ds."""
    a = np.moveaxis(np.asarray(a, np.float64), 0, -1)
    return ds.from_f64(jnp.asarray(a))


def back(x_ds):
    """ds batch-last -> numpy f64 batch-leading."""
    return np.moveaxis(np.asarray(ds.to_f64(x_ds), np.float64), -1, 0)


def spd(rng, B, n, cond=100.0):
    G = rng.normal(size=(B, n, n))
    H = np.einsum("bij,bkj->bik", G, G)
    return H + n * np.eye(n) / cond * np.trace(H, axis1=1, axis2=2)[:, None, None] / n


class TestCholeskyDS:
    def test_matches_f64(self, rng):
        H = spd(rng, 4, 20)
        L = cholesky_ds(as_ds(H))
        got = back(L)
        ref = np.linalg.cholesky(H)
        rel = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-3))
        assert rel < 1e-10

    def test_regularized_fallback_indefinite(self, rng):
        H = spd(rng, 3, 10)
        H[1] -= 2.0 * np.eye(10) * np.abs(H[1]).max()  # make instance 1 indefinite
        L = chol_regularized_ds(as_ds(H))
        assert np.all(np.isfinite(np.asarray(L.hi)))
        # healthy instances unaffected
        ref = np.linalg.cholesky(H[0])
        got = back(L)[0]
        assert np.max(np.abs(got - ref)) < 1e-8


class TestTriSolveDS:
    def test_forward_backward(self, rng):
        B, n, r = 3, 25, 7
        H = spd(rng, B, n)
        L = np.linalg.cholesky(H)
        X = rng.normal(size=(B, n, r)) * 10
        rhs = np.einsum("bij,bjr->bir", L, X)
        got = tri_solve_lower_ds(as_ds(L), as_ds(rhs))
        assert np.max(np.abs(back(got) - X)) < 1e-9
        rhs2 = np.einsum("bji,bjr->bir", L, X)
        got2 = tri_solve_upper_ds(as_ds(L), as_ds(rhs2))
        assert np.max(np.abs(back(got2) - X)) < 1e-9


class TestMatmulDS:
    def test_matmul(self, rng):
        X = rng.normal(size=(2, 12, 30))
        Y = rng.normal(size=(2, 30, 9)) * 100
        got = matmul_ds(as_ds(X), as_ds(Y))
        ref = X @ Y
        assert np.max(np.abs(back(got) - ref)) < 1e-10

    def test_matvec(self, rng):
        F = rng.normal(size=(5, 60, 60))
        v = rng.normal(size=(5, 60)) * 400
        # matvec_ds is j-major: pass F^T so y = F v
        got = matvec_ds(as_ds(np.swapaxes(F, 1, 2)), as_ds(v))
        ref = np.einsum("bij,bj->bi", F, v)
        assert np.max(np.abs(back(got) - ref)) < 1e-9


class TestSchurFactorDS:
    def test_inverse_blocks_match_f64(self, rng):
        from fcc_qp_tpu.ops.kkt import kkt_factor_blocks

        B, n, m = 3, 22, 9
        G = rng.normal(size=(B, n, n))
        Q = np.einsum("bij,bkj->bik", G, G) + 0.5 * np.eye(n)
        A = rng.normal(size=(B, m, n))
        rho = np.full(B, 0.7)

        Fd, Gd = schur_kkt_factor_ds(
            as_ds(Q), as_ds(A), jnp.asarray(rho, jnp.float32)
        )
        Fref, Gref = jax.vmap(
            lambda q, a: kkt_factor_blocks(q, a, jnp.float64(0.7))
        )(jnp.asarray(Q), jnp.asarray(A))
        assert np.max(np.abs(back(Fd) - np.asarray(Fref))) < 1e-9
        assert np.max(np.abs(back(Gd) - np.asarray(Gref))) < 1e-9

    def test_kkt_identity(self, rng):
        """[Q+rho I, A'; A, 0] @ [F; G'] columns == [I; 0]."""
        B, n, m = 2, 15, 6
        G_ = rng.normal(size=(B, n, n))
        Q = np.einsum("bij,bkj->bik", G_, G_) + np.eye(n)
        A = rng.normal(size=(B, m, n))
        rho = np.full(B, 0.3)
        Fd, Gd = schur_kkt_factor_ds(
            as_ds(Q), as_ds(A), jnp.asarray(rho, jnp.float32)
        )
        F = back(Fd)
        Gm = back(Gd)
        H = Q + 0.3 * np.eye(n)
        # H F + A^T (G^T)^T... block identity: H F + A^T Gt = I, A F = 0
        Gt = np.swapaxes(Gm, 1, 2)
        r1 = np.einsum("bij,bjk->bik", H, F) + np.einsum("bji,bjk->bik", A, Gt)
        r2 = np.einsum("bij,bjk->bik", A, F)
        # full factor chain accumulates ~cond * eps_ds; leave headroom
        assert np.max(np.abs(r1 - np.eye(n))) < 1e-7
        assert np.max(np.abs(r2)) < 1e-7


class TestSeedGuard:
    """Guarded Newton-Schulz seed (`kkt_inverse_f32_seed`): on
    ill-conditioned/unequilibrated KKTs the polish residual would square
    UP each step; the guard keeps the best iterate and reports the
    residual, and the hybrid factorization falls back to the all-ds
    Schur route for the affected instances."""

    def _bad_kkt(self, rng, B=3, n=10, m=4, spread=3.0):
        # wildly unequilibrated curvature: kappa ~ 10^(4*spread) in f32
        s = 10.0 ** np.linspace(-spread, spread, n)
        G = rng.normal(size=(B, n, n))
        Q = np.einsum("bij,bkj->bik", G, G)
        Q = Q * s[None, :, None] * s[None, None, :]
        A = rng.normal(size=(B, m, n)) * s[None, None, :]
        return Q, A

    def test_seed_residual_reported_finite_and_flags_bad(self, rng):
        from fcc_qp_tpu.ops.ds_linalg import kkt_inverse_f32_seed

        Q, A = self._bad_kkt(rng)
        B, n = Q.shape[0], Q.shape[1]
        rho = jnp.full((B,), jnp.float32(5e-5))
        X, r = kkt_inverse_f32_seed(as_ds(Q), as_ds(A), rho)
        X = np.asarray(X)
        r = np.asarray(r)
        assert np.all(np.isfinite(X)), "guarded seed must never be NaN/inf"
        # this KKT is genuinely beyond the f32 seed: the residual must
        # say so (it is the signal the hybrid fallback keys on)
        assert (r > 0.5).any(), f"expected a non-contracting seed, got {r}"

    def test_hybrid_falls_back_to_ds_route(self, rng):
        from fcc_qp_tpu.core.ds_engine import (
            QPBatchDS, _factor_reduced, _factor_reduced_hybrid,
        )

        Q, A = self._bad_kkt(rng)
        B, n, m = Q.shape[0], Q.shape[1], A.shape[1]
        b = rng.normal(size=(B, n))
        beq = rng.normal(size=(B, m))
        inf = np.full((B, n), np.inf)
        qp = QPBatchDS(
            Q=as_ds(Q), b=as_ds(b), A_eq=as_ds(A), b_eq=as_ds(beq),
            friction_coeffs=as_ds(np.zeros((B, 1))),
            lb=as_ds(-inf), ub=as_ds(inf),
        )
        ci = np.arange(4, dtype=np.int64)
        mask = np.zeros((n,), np.float32)
        mask[ci] = 1.0
        rho = jnp.full((B,), jnp.float32(5e-5))

        _, xc_h, _, x_h, _ = _factor_reduced_hybrid(qp, rho, ci, mask, 2)
        # f64 oracle: x from [[Q + diag(rho mask), A'],[A, 0]] [x;y] = [-b;beq]
        for i in range(B):
            K = np.zeros((n + m, n + m))
            K[:n, :n] = Q[i] + np.diag(5e-5 * mask.astype(np.float64))
            K[:n, n:] = A[i].T
            K[n:, :n] = A[i]
            rhs = np.concatenate([-b[i], beq[i]])
            x_ref = np.linalg.solve(K, rhs)[:n]
            x_got = back(x_h)[i]
            rel = np.max(np.abs(x_got - x_ref)) / max(np.max(np.abs(x_ref)), 1.0)
            assert rel < 1e-6, f"instance {i}: rel err {rel}"
