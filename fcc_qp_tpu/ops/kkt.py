"""KKT system assembly and factorization as TPU-friendly batched ops.

The reference factorizes the dense symmetric-indefinite KKT matrix

    M = [[Q (+ rho*I),  A_eq^T],
         [A_eq,         0     ]]

once per solve with Eigen LDLT and back-substitutes each ADMM iteration
(`/root/reference/src/fcc_qp.cpp:62-71,86`). Neither pivoted LDLT nor LU
is the right primitive on TPU: sequential triangular back-substitution
per iteration wastes the MXU, and XLA's LU expander is f32-only on TPU.
This module therefore uses the **Schur-complement Cholesky** form, which
is mathematically equivalent for the documented problem class (A_eq full
row-rank, `src/fcc_qp.hpp:108-111`) and maps onto TPU-supported
primitives (batched Cholesky + triangular solves + matmuls, all of which
XLA lowers for f32 AND f64 on TPU):

    H = Q + rho*I               (SPD since rho > 0)
    S = A H^{-1} A^T            (SPD when A full row-rank)
    M^{-1} = [[F, G], [G^T, -S^{-1}]],
      W = H^{-1} A^T,  G = W S^{-1},  F = H^{-1} - W S^{-1} W^T

The "factorization" computes the explicit blocks ``F`` and ``x_const``
so that every ADMM primal update is a single batched mat-vec
``x = x_const + rho * F @ v`` — one MXU op per iteration, trivially
vmapped/sharded, no sequential dependency across the batch.

Robustness parity: where the reference falls back from LDLT to a
rank-revealing CompleteOrthogonalDecomposition (`fcc_qp.cpp:163-177`),
the TPU-native analog is branchless Tikhonov regularization: if a
Cholesky factor comes back non-finite (not PD / rank-deficient), the
factorization is retried with ``+ delta*scale*I`` via a `jnp.where`
select — per-instance, batch-friendly, no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.scipy.linalg import cho_solve


def assemble_kkt(Q: Array, A_eq: Array, rho) -> Array:
    """Build ``[[Q + rho*I, A'],[A, 0]]`` (reference `fcc_qp.cpp:141-148,62-64`).

    Exposed for tests and for dense-engine experiments; the solver's hot
    path never materializes M itself.
    """
    n = Q.shape[-1]
    m = A_eq.shape[-2]
    dtype = Q.dtype
    Qr = Q + rho * jnp.eye(n, dtype=dtype)
    top = jnp.concatenate([Qr, jnp.swapaxes(A_eq, -1, -2)], axis=-1)
    bot = jnp.concatenate(
        [A_eq, jnp.zeros((*A_eq.shape[:-2], m, m), dtype=dtype)], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def _chol_or_regularized(M: Array, return_shifted: bool = False):
    """Cholesky factor of M, escalating Tikhonov shifts until it exists.

    The TPU analog of the reference's LDLT -> COD retry
    (`fcc_qp.cpp:163-177`): when M is not numerically PD, retry with
    ``M + shift*I`` for dtype-scaled shifts ``eps*{1e2, 1e5, 1e8}*|M|``.
    Implemented as a `lax.while_loop` so the common case costs exactly
    one factorization, and retries are data-dependent (masked per
    instance so it vmaps correctly).
    """
    n = M.shape[-1]
    eps = jnp.finfo(M.dtype).eps
    scale = jnp.maximum(jnp.max(jnp.abs(M)), 1.0)
    shifts = scale * eps * jnp.asarray(
        [0.0, 1e2, 1e5, 1e8], dtype=M.dtype
    )
    eye = jnp.eye(n, dtype=M.dtype)
    # pivot-based singularity detection: an EXACTLY singular M (e.g.
    # Schur complement of a rank-deficient A_eq) produces trailing
    # Cholesky pivots at roundoff level with ~50% sign probability — a
    # positive one returns a finite factor of effectively infinite
    # condition. Flag pivots below ~1e3*eps relative so those instances
    # escalate to a shifted (COD-analog) factorization instead.
    pivot_floor = 1e3 * eps * scale

    def ok(L):
        dg = jnp.diagonal(L, axis1=-2, axis2=-1)
        return jnp.all(jnp.isfinite(L)) & jnp.all(dg * dg > pivot_floor)

    def cond(state):
        k, L = state
        return (k < shifts.shape[0]) & ~ok(L)

    def body(state):
        k, L = state
        Lk = jnp.linalg.cholesky(M + shifts[k] * eye)
        # masked commit: instances already factored keep their factor
        return k + 1, jnp.where(ok(L), L, Lk)

    init = (jnp.int32(0), jnp.full_like(M, jnp.nan))
    k, L = jax.lax.while_loop(cond, body, init)
    # all attempts failed (pathological input): zeros rather than NaN so
    # downstream stays finite and violations surface in the details.
    final_ok = ok(L)
    L = jnp.where(final_ok, L, jnp.zeros_like(L))
    if return_shifted:
        # k == 1 means the first (zero-shift) attempt succeeded
        return L, (k > 1) | ~final_ok
    return L


def kkt_factor_blocks(Q: Array, A_eq: Array, rho) -> tuple[Array, Array]:
    """Schur-complement factorization of the KKT matrix.

    Returns the explicit inverse blocks ``(F, G)`` with
    ``F = M^{-1}[:n,:n]`` and ``G = M^{-1}[:n,n:]``. All ops are batched
    Cholesky / triangular-solve / matmul, f64-safe on TPU.
    """
    n = Q.shape[-1]
    m = A_eq.shape[-2]
    dtype = Q.dtype
    H = Q + rho * jnp.eye(n, dtype=dtype)
    L_H, sh_H = _chol_or_regularized(H, return_shifted=True)
    At = jnp.swapaxes(A_eq, -1, -2)
    # W = H^{-1} A^T  and  Hinv = H^{-1}
    W = cho_solve((L_H, True), At)
    S = A_eq @ W
    L_S, sh_S = _chol_or_regularized(S, return_shifted=True)
    # T = S^{-1} W^T  (ne x nv)
    T = cho_solve((L_S, True), jnp.swapaxes(W, -1, -2))
    Hinv = cho_solve((L_H, True), jnp.eye(n, dtype=dtype))
    F = Hinv - W @ T
    G = jnp.swapaxes(T, -1, -2)

    def _rescue(FG):
        # a shift was taken (singular H or S: rank-deficient A_eq, the
        # reference's COD fallback territory, `fcc_qp.cpp:163-177`):
        # the shifted inverse has range-space residual ~shift/lambda+.
        # Fixed-preconditioner Richardson refinement against the TRUE
        # KKT contracts it geometrically; the (bounded-growth) null-
        # space garbage stays in the dual-dual block, which F and G
        # never read.
        F0, G0 = FG
        Sinv = cho_solve((L_S, True), jnp.eye(m, dtype=dtype))
        top = jnp.concatenate([F0, G0], axis=-1)
        bot = jnp.concatenate([T, -Sinv], axis=-1)
        X0 = jnp.concatenate([top, bot], axis=-2)
        M = assemble_kkt(Q, A_eq, rho)
        eyeN = jnp.eye(n + m, dtype=dtype)
        X = X0
        for _ in range(4):
            X = X + X0 @ (eyeN - M @ X)
        return X[..., :n, :n], X[..., :n, n:]

    return jax.lax.cond(
        jnp.any(sh_H | sh_S), _rescue, lambda FG: FG, (F, G)
    )


def kkt_solve(Q: Array, A_eq: Array, rho, r: Array, s: Array) -> Array:
    """Solve ``[[Q+rho*I, A'],[A, 0]] [x; y] = [r; s]`` for ``x`` only.

    Single-RHS Schur solve used by the presolve
    (`fcc_qp.cpp:159-178`): cheaper than building the full operator.
    """
    n = Q.shape[-1]
    dtype = Q.dtype
    H = Q + rho * jnp.eye(n, dtype=dtype)
    L_H, sh_H = _chol_or_regularized(H, return_shifted=True)
    At = jnp.swapaxes(A_eq, -1, -2)
    W = cho_solve((L_H, True), At)
    S = A_eq @ W
    L_S, sh_S = _chol_or_regularized(S, return_shifted=True)

    mv = lambda M_, v_: jnp.einsum("...ij,...j->...i", M_, v_)

    def solve_once(rv, sv):
        u = cho_solve((L_H, True), rv[..., None])[..., 0]
        y = cho_solve((L_S, True), (mv(A_eq, u) - sv)[..., None])[..., 0]
        return u - mv(W, y), y

    x, y = solve_once(r, s)

    def _rescue(xy):
        # shifted factor (singular H/S, see kkt_factor_blocks._rescue):
        # vector iterative refinement against the TRUE KKT — consistent
        # RHS, so the range-space error contracts geometrically
        xv, yv = xy
        for _ in range(4):
            rr = r - (mv(H, xv) + mv(At, yv))
            rs = s - mv(A_eq, xv)
            dx, dy = solve_once(rr, rs)
            xv, yv = xv + dx, yv + dy
        return xv, yv

    x, y = jax.lax.cond(
        jnp.any(sh_H | sh_S), _rescue, lambda xy: xy, (x, y)
    )
    return x


def admm_operator(
    Q: Array, b: Array, A_eq: Array, b_eq: Array, rho
) -> tuple[Array, Array]:
    """Precompute the per-solve ADMM primal-update operator.

    Returns ``(F, x_const)`` such that the primal update of every ADMM
    iteration (`fcc_qp.cpp:81-87`) is exactly

        ``x = x_const + rho * F @ v``,    v = slack - dual,

    because the KKT RHS is ``[-b + rho*v ; b_eq]`` and only its first
    block varies across iterations.
    """
    F, G = kkt_factor_blocks(Q, A_eq, rho)
    x_const = -jnp.einsum("...ij,...j->...i", F, b) + jnp.einsum(
        "...ij,...j->...i", G, b_eq
    )
    return F, x_const
