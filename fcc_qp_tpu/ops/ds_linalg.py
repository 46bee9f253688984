"""Batched dense linear algebra in double-single precision, batch-last.

Implements the Schur-complement KKT factorization of `ops/kkt.py` in ds
arithmetic (f32 pairs, ~2^-48 precision) so the solver's factorization
and primal updates run at f32-class speed on TPU instead of the 20-50x
slower emulated f64, while still resolving 1e-6-absolute convergence on
O(100)-scale solutions.

Layout: **batch-last** — matrices are ``(n, m, B)``, vectors ``(n, B)``.
On TPU the trailing axis maps to the 128-wide vector lanes, so a batch
of 128+ instances fills every lane of every VPU op; feature axes live in
sublanes. (Batch-leading ``(B, n, m)`` would waste ~half the lanes for
WBC-sized n.) All routines use static shapes and `fori_loop`s with
masked full-width updates: ~n^3/3 ds-MACs for Cholesky, n^2*r per
triangular solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

import fcc_qp_tpu.ops.ds as ds
from fcc_qp_tpu.ops.ds import DS


def _idx_row(n):
    return jnp.arange(n)[:, None, None]  # broadcast over (n, ., B)


def _take0(x: DS, i) -> DS:
    """x[i] along axis 0 (dynamic index)."""
    return DS(
        jax.lax.dynamic_index_in_dim(x.hi, i, 0, keepdims=False),
        jax.lax.dynamic_index_in_dim(x.lo, i, 0, keepdims=False),
    )


def _put0(x: DS, v: DS, i) -> DS:
    return DS(
        jax.lax.dynamic_update_index_in_dim(x.hi, v.hi, i, 0),
        jax.lax.dynamic_update_index_in_dim(x.lo, v.lo, i, 0),
    )


def cholesky_ds(H: DS, shift: Array | None = None) -> DS:
    """Lower-Cholesky of SPD ``H`` (n, n, B) in ds.

    ``shift``: optional (B,) diagonal shift (regularized retry support).
    """
    n, _, B = H.hi.shape
    f32 = H.hi.dtype
    row = jnp.arange(n)[:, None]        # (n, 1) for (n, B) masks
    rowm = jnp.arange(n)[:, None, None]  # (n, 1, 1)
    colm = jnp.arange(n)[None, :, None]  # (1, n, 1)

    if shift is not None:
        eye = jnp.eye(n, dtype=f32)[:, :, None]
        H = ds.add(H, DS(shift[None, None, :] * eye, jnp.zeros_like(H.hi)))

    def body(k, carry):
        A, L = carry
        arow = _take0(A, k)          # (n, B): column k of A (symmetric)
        akk = _take0(arow, k)        # (B,)
        d = ds.sqrt(akk)
        inv_d = ds.recip(ds.where(d.hi > 0, d, ds.from_f32(jnp.ones_like(d.hi))))

        col = ds.mul(arow, DS(inv_d.hi[None, :], inv_d.lo[None, :]))  # (n, B)
        below = row > k
        col = ds.where(below, col, ds.zeros((n, B), f32))
        l_col = ds.where(row == k, DS(d.hi[None, :], d.lo[None, :]), col)
        # L[:, k, :] = l_col  -> store as row of the transposed access:
        L = DS(
            jax.lax.dynamic_update_slice_in_dim(L.hi, l_col.hi[:, None, :], k, 1),
            jax.lax.dynamic_update_slice_in_dim(L.lo, l_col.lo[:, None, :], k, 1),
        )

        # trailing update: A[i, j] -= col[i] * col[j] for i, j > k
        outer = ds.mul(
            DS(col.hi[:, None, :], col.lo[:, None, :]),
            DS(col.hi[None, :, :], col.lo[None, :, :]),
        )
        tmask = (rowm > k) & (colm > k)
        A = ds.where(tmask, ds.sub(A, outer), A)
        return A, L

    L0 = ds.zeros((n, n, B), f32)
    _, L = jax.lax.fori_loop(0, n, body, (H, L0))
    return L


def _ds_sum_axis0(x: DS) -> DS:
    """ds-accurate sum over axis 0 via fori accumulation."""
    n = x.hi.shape[0]
    rest = x.hi.shape[1:]
    f32 = x.hi.dtype

    def body(j, acc):
        return ds.add(acc, _take0(x, j))

    return jax.lax.fori_loop(0, n, body, ds.zeros(rest, f32))


def tri_solve_lower_ds(L: DS, Bmat: DS) -> DS:
    """Solve ``L X = Bmat`` (forward substitution). L (n, n, B) lower,
    Bmat (n, r, B) -> X (n, r, B)."""
    n, _, B = L.hi.shape
    f32 = L.hi.dtype
    col = jnp.arange(n)[:, None, None]  # masks over (n, r, B) via axis 0

    def body(i, X):
        li = _take0(L, i)            # (n, B): row i of L (entries L[i, j] at index j)
        lii = _take0(li, i)          # (B,)
        jmask = col < i              # (n, 1, 1)
        prod = ds.mul(DS(li.hi[:, None, :], li.lo[:, None, :]), X)
        prod = ds.where(jmask, prod, ds.zeros(prod.hi.shape, f32))
        acc = _ds_sum_axis0(prod)    # (r, B)
        bi = _take0(Bmat, i)         # (r, B)
        num = ds.sub(bi, acc)
        inv = ds.recip(ds.where(lii.hi != 0, lii, ds.from_f32(jnp.ones_like(lii.hi))))
        xi = ds.mul(num, DS(inv.hi[None, :], inv.lo[None, :]))
        return DS(
            jax.lax.dynamic_update_slice_in_dim(X.hi, xi.hi[None], i, 0),
            jax.lax.dynamic_update_slice_in_dim(X.lo, xi.lo[None], i, 0),
        )

    X0 = ds.zeros(Bmat.hi.shape, f32)
    return jax.lax.fori_loop(0, n, body, X0)


def tri_solve_upper_ds(L: DS, Bmat: DS) -> DS:
    """Solve ``L^T X = Bmat`` (backward substitution with the lower
    factor's transpose)."""
    n, _, B = L.hi.shape
    f32 = L.hi.dtype
    col = jnp.arange(n)[:, None, None]

    def body(step, X):
        i = n - 1 - step
        # row i of L^T = column i of L: entries L[j, i] at index j
        ci = DS(
            jax.lax.dynamic_index_in_dim(L.hi, i, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(L.lo, i, 1, keepdims=False),
        )  # (n, B)
        lii = _take0(ci, i)
        jmask = col > i
        prod = ds.mul(DS(ci.hi[:, None, :], ci.lo[:, None, :]), X)
        prod = ds.where(jmask, prod, ds.zeros(prod.hi.shape, f32))
        acc = _ds_sum_axis0(prod)
        bi = _take0(Bmat, i)
        num = ds.sub(bi, acc)
        inv = ds.recip(ds.where(lii.hi != 0, lii, ds.from_f32(jnp.ones_like(lii.hi))))
        xi = ds.mul(num, DS(inv.hi[None, :], inv.lo[None, :]))
        return DS(
            jax.lax.dynamic_update_slice_in_dim(X.hi, xi.hi[None], i, 0),
            jax.lax.dynamic_update_slice_in_dim(X.lo, xi.lo[None], i, 0),
        )

    X0 = ds.zeros(Bmat.hi.shape, f32)
    return jax.lax.fori_loop(0, n, body, X0)


def matmul_ds(X: DS, Y: DS) -> DS:
    """ds matmul: (m, k, B) @ (k, r, B) -> (m, r, B).

    Thin RHS (r <= 32, e.g. the 22 refined inverse columns of the
    reduced factorization): unrolled per-column tree-EFT mat-vecs —
    ~log k fused passes per column instead of a k-step sequential fori
    chain. Wide RHS falls back to the fori accumulation (the transient
    product tensor of a full tree would be (m, k, r, B))."""
    k = X.hi.shape[1]
    f32 = X.hi.dtype
    m, _, B = X.hi.shape
    r = Y.hi.shape[1]

    if r <= 32:
        Xt = transpose_ds(X)  # (k, m, B) j-major for matvec_ds
        cols = [
            matvec_ds(Xt, DS(Y.hi[:, j], Y.lo[:, j])) for j in range(r)
        ]
        return DS(
            jnp.stack([c.hi for c in cols], axis=1),
            jnp.stack([c.lo for c in cols], axis=1),
        )

    def body(j, acc):
        xj = DS(
            jax.lax.dynamic_index_in_dim(X.hi, j, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(X.lo, j, 1, keepdims=False),
        )  # (m, B)
        yj = _take0(Y, j)  # (r, B)
        prod = ds.mul(
            DS(xj.hi[:, None, :], xj.lo[:, None, :]),
            DS(yj.hi[None, :, :], yj.lo[None, :, :]),
        )
        return ds.add(acc, prod)

    return jax.lax.fori_loop(0, k, body, ds.zeros((m, r, B), f32))


def _ds_tree_sum0(p: DS) -> DS:
    """ds-accurate sum over axis 0 by a BALANCED TREE of full-width
    `ds.add`s (log2 n fused VPU passes) instead of a sequential fori
    chain. Identical error class to sequential EFT accumulation
    (~2^-48 per level, 6-7 levels), but ~100x faster on TPU where a
    fori chain pays per-step serialization (measured 126 ms vs ~2 ms
    for a (60, 60, 4096) mat-vec on v5e)."""
    n = p.hi.shape[0]
    while n > 1:
        m = n // 2
        a = DS(p.hi[:m], p.lo[:m])
        b = DS(p.hi[m : 2 * m], p.lo[m : 2 * m])
        s = ds.add(a, b)
        if n % 2:
            s = DS(
                jnp.concatenate([s.hi, p.hi[2 * m :]], axis=0),
                jnp.concatenate([s.lo, p.lo[2 * m :]], axis=0),
            )
            n = m + 1
        else:
            n = m
        p = s
    return DS(p.hi[0], p.lo[0])


# Largest transient (n_j, n_i, B) f32 tile matvec_ds will materialize
# at once (elements PER ARRAY; the EFT pass holds ~4 such arrays). 64M
# elements = 256 MB/array, ~1 GB of transients — comfortably inside v5e
# HBM while the flagship shapes (98*98*4096 ~ 39M) stay on the single-
# pass fast path. Bigger contractions are chunked along the contraction
# axis so the working set stays bounded (an (129,129,8192) humanoid
# batch would otherwise claim >2 GB of fused transients).
_MATVEC_TILE_ELEMS = 64 * 1024 * 1024


def matvec_ds(F: DS, v: DS) -> DS:
    """ds mat-vec: F (n_j, n_i, B) j-major, v (n_j, B) -> (n_i, B).

    Elementwise error-free products over the full (n_j, n_i, B) tile in
    ONE fused pass, then a balanced-tree ds reduction over the
    contraction axis (`_ds_tree_sum0`). The transient product tensor is
    n_j * n_i * B * 4 floats — ~300 MB for the largest (98, 98, 4096)
    KKT residual mat-vecs, well within HBM, and XLA fuses the multiply
    into the first reduction level. Contractions whose tile exceeds
    `_MATVEC_TILE_ELEMS` are chunked along the contraction axis
    (static shapes, so the chunking unrolls at trace time) and the
    partial sums combined with `ds.add` — same error class, bounded
    working set.
    """
    n_j, n_i, B = F.hi.shape
    if n_j * n_i * B <= _MATVEC_TILE_ELEMS:
        return _ds_tree_sum0(
            ds.mul(F, DS(v.hi[:, None, :], v.lo[:, None, :]))
        )
    chunk = max(1, _MATVEC_TILE_ELEMS // (n_i * B))
    acc = None
    for s in range(0, n_j, chunk):
        e = min(n_j, s + chunk)
        part = _ds_tree_sum0(
            ds.mul(
                DS(F.hi[s:e], F.lo[s:e]),
                DS(v.hi[s:e, None, :], v.lo[s:e, None, :]),
            )
        )
        acc = part if acc is None else ds.add(acc, part)
    return acc


def transpose_ds(X: DS) -> DS:
    """Swap the two leading (feature) axes; batch axis stays last."""
    return DS(jnp.swapaxes(X.hi, 0, 1), jnp.swapaxes(X.lo, 0, 1))


def chol_regularized_ds(
    H: DS,
    delta_levels=(0.0, 1e-10, 1e-8, 1e-6, 1e-4, 1e-2),
    return_shifted: bool = False,
):
    """ds Cholesky with escalating relative diagonal shifts — the ds
    analog of `ops.kkt._chol_or_regularized` (reference COD fallback,
    `fcc_qp.cpp:163-177`). The final level ``2n`` makes the shifted
    matrix strictly diagonally dominant (Gershgorin), so a factor always
    exists: finite output, degradation surfaced via violation metrics.

    Detection is PIVOT-BASED, not just finiteness: an exactly singular
    H (e.g. the Schur complement of a rank-deficient A_eq with
    duplicated rows) has trailing pivots at roundoff level with ~50%
    sign probability — a positive roundoff pivot yields a finite factor
    of effectively infinite condition that silently destroys every
    downstream solve. Such instances are flagged and re-factored with a
    shift; the caller's refinement-vs-true-KKT then heals the O(shift)
    error on the range space."""
    n = H.hi.shape[0]
    B = H.hi.shape[-1]
    f32 = H.hi.dtype
    scale = jnp.maximum(jnp.max(jnp.abs(H.hi), axis=(0, 1)), 1.0)  # (B,)
    # smallest acceptable pivot^2 relative to scale: ds effective eps is
    # ~2^-48; pivots of a genuinely PD H sit at >= lambda_min >> this,
    # while singular instances land at roundoff (~n * eps_ds * scale)
    pivot_floor = (1e-11 * scale).astype(f32)

    def _ok(Lc: DS) -> Array:
        dg = jnp.diagonal(Lc.hi, axis1=0, axis2=1)  # (B, n)
        return (
            jnp.all(jnp.isfinite(Lc.hi), axis=(0, 1))
            & jnp.all(jnp.isfinite(Lc.lo), axis=(0, 1))
            & jnp.all(dg * dg > pivot_floor[:, None], axis=1)
        )

    L = cholesky_ds(H)
    shifted = jnp.zeros((B,), jnp.bool_)
    for delta in tuple(delta_levels[1:]) + (2.0 * n,):
        ok = _ok(L)
        need = ~ok
        shifted = shifted | need

        def retry(_):
            shift = jnp.where(need, delta * scale, jnp.zeros_like(scale))
            L2 = cholesky_ds(H, shift=shift.astype(f32))
            return ds.where(need[None, None, :], L2, L)

        L = jax.lax.cond(jnp.any(need), retry, lambda _: L, operand=None)
    if return_shifted:
        return L, shifted
    return L


def _rho_diag_mat(rho: Array, n: int, dtype) -> Array:
    """Embed the ADMM penalty as a (n, n, B) diagonal.

    rho may be (B,) — uniform rho*I, the reference form
    (`fcc_qp.cpp:62-64`) — or (n, B), a per-coordinate diagonal (partial
    splitting: rho only on the constrained coordinates)."""
    eye = jnp.eye(n, dtype=dtype)[:, :, None]
    if rho.ndim == 1:
        return rho[None, None, :] * eye
    return eye * rho[:, None, :]


def schur_kkt_factor_ds(Q: DS, A: DS, rho: Array):
    """ds Schur-complement KKT factorization (math of
    `ops.kkt.kkt_factor_blocks`): returns inverse blocks ``(F, G)`` with
    F = M^{-1}[:n,:n], G = M^{-1}[:n,n:].

    Q: (n, n, B) ds;  A: (m, n, B) ds;  rho: (B,) or (n, B) f32.
    Returns F: (n, n, B), G: (n, m, B).
    """
    n, _, B = Q.hi.shape
    m = A.hi.shape[0]
    f32 = Q.hi.dtype

    eye = jnp.eye(n, dtype=f32)[:, :, None]
    H = ds.add(Q, DS(_rho_diag_mat(rho, n, f32), jnp.zeros_like(Q.hi)))
    L = chol_regularized_ds(H)

    At = transpose_ds(A)  # (n, m, B)
    # solve H [W | Hinv] = [A^T | I] in one pass (n x (m+n) RHS)
    rhs = DS(
        jnp.concatenate(
            [At.hi, jnp.broadcast_to(eye, (n, n, B)).astype(f32)], axis=1
        ),
        jnp.concatenate([At.lo, jnp.zeros((n, n, B), f32)], axis=1),
    )
    Y = tri_solve_lower_ds(L, rhs)
    Z = tri_solve_upper_ds(L, Y)  # (n, m+n, B) = [W | Hinv]
    W = DS(Z.hi[:, :m], Z.lo[:, :m])       # (n, m, B)
    Hinv = DS(Z.hi[:, m:], Z.lo[:, m:])    # (n, n, B)

    S = matmul_ds(A, W)  # (m, m, B)
    Ls = chol_regularized_ds(S)
    # T = S^{-1} W^T  (m, n, B)
    Yt = tri_solve_lower_ds(Ls, transpose_ds(W))
    T = tri_solve_upper_ds(Ls, Yt)

    WT = matmul_ds(W, T)  # (n, n, B)
    F = ds.sub(Hinv, WT)
    G = transpose_ds(T)
    return F, G


def kkt_solve_ds(Q: DS, A: DS, rho: Array, r: DS, s: DS) -> DS:
    """Solve ``[[Q+rho I, A'],[A, 0]] [x; y] = [r; s]`` for x only —
    single-RHS presolve path (`fcc_qp.cpp:159-178` analog).

    r: (n, B) ds; s: (m, B) ds -> x (n, B) ds.
    """
    n, _, B = Q.hi.shape
    m = A.hi.shape[0]
    f32 = Q.hi.dtype

    eye = jnp.eye(n, dtype=f32)[:, :, None]
    H = ds.add(Q, DS(rho[None, None, :] * eye, jnp.zeros_like(Q.hi)))
    L = chol_regularized_ds(H)
    At = transpose_ds(A)

    rhs = DS(
        jnp.concatenate([At.hi, r.hi[:, None, :]], axis=1),
        jnp.concatenate([At.lo, r.lo[:, None, :]], axis=1),
    )
    Y = tri_solve_lower_ds(L, rhs)
    Z = tri_solve_upper_ds(L, Y)      # (n, m+1, B) = [W | u]
    W = DS(Z.hi[:, :m], Z.lo[:, :m])
    u = DS(Z.hi[:, m], Z.lo[:, m])    # (n, B)

    S = matmul_ds(A, W)
    Ls = chol_regularized_ds(S)
    # y = S^{-1} (A u - s); matvec_ds is j-major, so transpose A
    Au = matvec_ds(transpose_ds(A), u)  # (m, B)
    rhs_y = ds.sub(Au, s)
    Yy = tri_solve_lower_ds(Ls, DS(rhs_y.hi[:, None, :], rhs_y.lo[:, None, :]))
    yv = tri_solve_upper_ds(Ls, Yy)
    y = DS(yv.hi[:, 0], yv.lo[:, 0])  # (m, B)
    # x = u - W y ; W is (n, m, B): j-major over m -> transpose
    Wy = matvec_ds(transpose_ds(W), y)  # (n, B)
    return ds.sub(u, Wy)


def assemble_kkt_ds(Q: DS, A: DS, rho: Array) -> DS:
    """Assemble the full KKT matrix [[Q+diag(rho), A'],[A, 0]] in ds,
    batch-last: (n+m, n+m, B). rho (B,) uniform or (n, B) diagonal.

    Assembly happens in batch-LEADING (B, N, N) layout — block writes
    there are contiguous minor-dim updates the TPU handles at stream
    rate, whereas the same `.at` block sets in batch-last layout cost
    ~100x (measured 3 s vs 30 ms for (98, 98, 4096)) — then one
    transposed copy back to the batch-last compute layout."""
    n, _, B = Q.hi.shape
    m = A.hi.shape[0]
    f32 = Q.hi.dtype
    H = ds.add(Q, DS(_rho_diag_mat(rho, n, f32), jnp.zeros_like(Q.hi)))
    N = n + m

    def build(Hw, Aw):
        Mb = jnp.zeros((B, N, N), f32)
        Hb = jnp.moveaxis(Hw, -1, 0)
        Ab = jnp.moveaxis(Aw, -1, 0)
        Mb = Mb.at[:, :n, :n].set(Hb)
        Mb = Mb.at[:, :n, n:].set(jnp.swapaxes(Ab, -1, -2))
        Mb = Mb.at[:, n:, :n].set(Ab)
        return jnp.moveaxis(Mb, 0, -1)

    return DS(build(H.hi, A.hi), build(H.lo, A.lo))


def newton_schulz_refine_ds(X: DS, M: DS, steps: int = 1) -> DS:
    """Refine an approximate inverse X0 of M with a FIXED
    preconditioner: X <- X + X0 (I - M X).

    Step 1 is identical to a Newton-Schulz step and squares the relative
    error, scrubbing the conditioning amplification the explicit
    Schur-complement factorization suffers when kappa(S) >> kappa(KKT)
    (e.g. OSC problems where kappa(Q)~1e8 but kappa(KKT)~1e5); further
    steps contract geometrically at ratio ||I - X0 M||. The fixed
    preconditioner matters for SINGULAR M (rank-deficient A_eq,
    reference COD territory `fcc_qp.cpp:163-177`): the residual operator
    has eigenvalue exactly 1 on null(M), which true Newton-Schulz
    (X <- X(2I - MX)) amplifies EXPONENTIALLY; with X0 fixed the null
    component grows only linearly and stays confined to the dual-dual
    block, which the extracted primal rows (F, G) never read. Cost: 2 ds
    matmuls of the KKT size per step.
    """
    N = M.hi.shape[0]
    f32 = M.hi.dtype
    eyeN = DS(
        jnp.broadcast_to(jnp.eye(N, dtype=f32)[:, :, None], M.hi.shape).astype(f32),
        jnp.zeros_like(M.hi),
    )
    X0 = X
    for _ in range(steps):
        R = ds.sub(eyeN, matmul_ds(M, X))
        X = ds.add(X, matmul_ds(X0, R))
    return X


def _jacobi_kkt_scales(H: DS, A: DS, sweeps: int = 3):
    """Ruiz equilibration scales for the KKT [[H, A'],[A, 0]].

    Returns ``(d (n, B), e (m, B))``: the scaled KKT is ``P M P`` with
    ``P = blkdiag(D, E)``, so ``M^{-1} = P Ms^{-1} P``. Each sweep
    divides the scales by the sqrt of the current scaled column max-abs
    norm over the FULL KKT column — including the A entries, so
    zero-curvature coordinates (costless force variables, the norm in
    OSC Hessians) are scaled by their constraint-column magnitude
    rather than an arbitrary clamp. Diagonal pathologies (per-coordinate
    curvature spreads, raw kappa up to ~1e12 on unequilibrated OSC data)
    are removed; the downstream Cholesky pivots and Newton-Schulz
    contraction see only the essential (scaling-invariant)
    conditioning."""
    n, _, B = H.hi.shape
    m = A.hi.shape[0]
    f32 = H.hi.dtype
    absH = jnp.abs(H.hi)
    absA = jnp.abs(A.hi) if m else None
    d = jnp.ones((n, B), f32)
    e = jnp.ones((m, B), f32)
    for _ in range(sweeps):
        # scaled primal column i: max(max_j |H_ij| d_i d_j,
        #                             max_r |A_ri| e_r d_i)
        ch = jnp.max(absH * d[None, :, :], axis=1) * d  # (n, B)
        if m:
            ca = jnp.max(absA * e[:, None, :], axis=0) * d  # (n, B)
            c = jnp.maximum(ch, ca)
            g = jnp.max(absA * d[None, :, :], axis=1) * e  # (m, B)
            e = e * jnp.where(
                g > 0, jax.lax.rsqrt(jnp.maximum(g, 1e-30)), 1.0
            )
        else:
            c = ch
        d = d * jnp.where(
            c > 0, jax.lax.rsqrt(jnp.maximum(c, 1e-30)), 1.0
        )
    return d, e


def _scale_sym(Xm: DS, a: Array, b: Array) -> DS:
    """rows (axis 0) by ``a``, cols (axis 1) by ``b``; batch-last."""
    return ds.mul_f32(ds.mul_f32(Xm, a[:, None, :]), b[None, :, :])


def kkt_inverse_blocks_refined_ds(
    Q: DS, A: DS, rho: Array, refine_steps: int = 1,
    equilibrate: bool = True,
):
    """Full KKT inverse blocks (F, G) via Schur factorization plus
    Newton-Schulz refinement of the complete inverse.

    Returns (F, G) like `schur_kkt_factor_ds`, but accurate to
    ~kappa(KKT)^2 * eps_ds^2 after one refinement step instead of
    ~kappa(S) * eps_ds. rho (B,) uniform or (n, B) per-coordinate.

    ``equilibrate`` (default on) applies internal symmetric Jacobi
    scaling (`_jacobi_kkt_scales`) before factorizing and unscales the
    returned blocks — the route is then robust to per-coordinate scale
    spreads (unequilibrated OSC data) that would otherwise defeat both
    the Cholesky pivot logic and the refinement contraction. This is
    the all-ds fallback that rescues bad-seed instances of the hybrid
    factorization, so it must not assume Ruiz-scaled input.
    """
    n, _, B = Q.hi.shape
    f32 = Q.hi.dtype
    H = ds.add(Q, DS(_rho_diag_mat(rho, n, f32), jnp.zeros_like(Q.hi)))
    if equilibrate:
        dsc, esc = _jacobi_kkt_scales(H, A)
        Hs = _scale_sym(H, dsc, dsc)
        As = _scale_sym(A, esc, dsc) if A.hi.shape[0] else A
        Fs, Gs = _kkt_inverse_blocks_core(Hs, As, refine_steps)
        F = _scale_sym(Fs, dsc, dsc)
        G = _scale_sym(Gs, dsc, esc) if A.hi.shape[0] else Gs
        return F, G
    return _kkt_inverse_blocks_core(H, A, refine_steps)


def _kkt_inverse_blocks_core(H: DS, A: DS, refine_steps: int):
    """Schur factorization + NS refinement of [[H, A'],[A, 0]] with the
    rho already folded into H (see `kkt_inverse_blocks_refined_ds`)."""
    n, _, B = H.hi.shape
    m = A.hi.shape[0]
    f32 = H.hi.dtype

    eye = jnp.eye(n, dtype=f32)[:, :, None]
    L, sh_H = chol_regularized_ds(H, return_shifted=True)
    At = transpose_ds(A)
    rhs = DS(
        jnp.concatenate(
            [At.hi, jnp.broadcast_to(eye, (n, n, B)).astype(f32)], axis=1
        ),
        jnp.concatenate([At.lo, jnp.zeros((n, n, B), f32)], axis=1),
    )
    Y = tri_solve_lower_ds(L, rhs)
    Z = tri_solve_upper_ds(L, Y)
    W = DS(Z.hi[:, :m], Z.lo[:, :m])
    Hinv = DS(Z.hi[:, m:], Z.lo[:, m:])

    S = matmul_ds(A, W)
    Ls, sh_S = chol_regularized_ds(S, return_shifted=True)
    Yt = tri_solve_lower_ds(Ls, transpose_ds(W))
    T = tri_solve_upper_ds(Ls, Yt)  # (m, n, B) = S^{-1} W^T
    # E = -S^{-1}
    eyem = DS(
        jnp.broadcast_to(jnp.eye(m, dtype=f32)[:, :, None], (m, m, B)).astype(f32),
        jnp.zeros((m, m, B), f32),
    )
    Ym = tri_solve_lower_ds(Ls, eyem)
    Sinv = tri_solve_upper_ds(Ls, Ym)

    F = ds.sub(Hinv, matmul_ds(W, T))
    G = transpose_ds(T)

    if refine_steps > 0:
        # assemble X = [[F, G],[G^T, -S^{-1}]] and refine vs the true KKT
        X_hi = jnp.concatenate(
            [
                jnp.concatenate([F.hi, G.hi], axis=1),
                jnp.concatenate([T.hi, -Sinv.hi], axis=1),
            ],
            axis=0,
        )
        X_lo = jnp.concatenate(
            [
                jnp.concatenate([F.lo, G.lo], axis=1),
                jnp.concatenate([T.lo, -Sinv.lo], axis=1),
            ],
            axis=0,
        )
        X = DS(X_hi, X_lo)
        M = assemble_kkt_ds(H, A, jnp.zeros((B,), f32))
        X = newton_schulz_refine_ds(X, M, refine_steps)
        # singular-input rescue (rank-deficient A_eq / rho-free singular
        # (1,1) block — the reference's COD territory): a shifted factor
        # starts with range-space residual ~shift/lambda_plus, which the
        # standard 1-step refinement cannot fully contract. Run extra
        # Richardson passes only when some instance actually took a
        # shift (lax.cond: free on healthy batches).
        X = jax.lax.cond(
            jnp.any(sh_H | sh_S),
            lambda Xc: newton_schulz_refine_ds(Xc, M, 6),
            lambda Xc: Xc,
            X,
        )
        F = DS(X.hi[:n, :n], X.lo[:n, :n])
        G = DS(X.hi[:n, n:], X.lo[:n, n:])
    return F, G


def kkt_solve_refined_ds(
    Q: DS,
    A: DS,
    r: DS,
    s: DS,
    delta_rel: float = 1e-6,
    refine_steps: int = 8,
    equilibrate: bool = True,
):
    """Accurate ds solve of the UNREGULARIZED KKT system for x:

        [[Q, A'],[A, 0]] [x; y] = [r; s]

    (the reference presolve, `fcc_qp.cpp:159-178`). The raw Schur route
    is numerically destroyed when kappa(S) >> kappa(KKT); instead this
    factors a delta-regularized KKT (benign Schur complement) and runs
    vector iterative refinement against the TRUE KKT with ds residuals:
    converges at rate ~delta * ||KKT^{-1}|| per step.

    ``equilibrate`` applies internal Jacobi scaling (see
    `kkt_inverse_blocks_refined_ds`) so raw unscaled OSC data does not
    defeat the refinement contraction.
    """
    if equilibrate:
        dsc, esc = _jacobi_kkt_scales(Q, A)
        Qs = _scale_sym(Q, dsc, dsc)
        As = _scale_sym(A, esc, dsc) if A.hi.shape[0] else A
        rs_ = ds.mul_f32(r, dsc)
        ss_ = ds.mul_f32(s, esc) if A.hi.shape[0] else s
        xs = kkt_solve_refined_ds(
            Qs, As, rs_, ss_, delta_rel, refine_steps, equilibrate=False
        )
        return ds.mul_f32(xs, dsc)
    n, _, B = Q.hi.shape
    m = A.hi.shape[0]
    f32 = Q.hi.dtype

    scale = jnp.maximum(jnp.max(jnp.abs(Q.hi), axis=(0, 1)), 1.0)
    delta = (delta_rel * scale).astype(f32)

    eye = jnp.eye(n, dtype=f32)[:, :, None]
    H = ds.add(Q, DS(delta[None, None, :] * eye, jnp.zeros_like(Q.hi)))
    L = chol_regularized_ds(H)
    At = transpose_ds(A)
    rhsW = DS(At.hi, At.lo)
    W = tri_solve_upper_ds(L, tri_solve_lower_ds(L, rhsW))  # (n, m, B)
    S = matmul_ds(A, W)
    Ls = chol_regularized_ds(S)

    Atj = A  # for matvec A @ v use transpose_ds(A) j-major
    Wj = transpose_ds(W)

    def solve_delta(rv: DS, sv: DS):
        """Apply the delta-regularized KKT inverse to [rv; sv]."""
        u = tri_solve_upper_ds(
            L, tri_solve_lower_ds(L, DS(rv.hi[:, None, :], rv.lo[:, None, :]))
        )
        u = DS(u.hi[:, 0], u.lo[:, 0])
        Au = matvec_ds(transpose_ds(A), u)
        rhs_y = ds.sub(Au, sv)
        yv = tri_solve_upper_ds(
            Ls,
            tri_solve_lower_ds(
                Ls, DS(rhs_y.hi[:, None, :], rhs_y.lo[:, None, :])
            ),
        )
        y = DS(yv.hi[:, 0], yv.lo[:, 0])
        x = ds.sub(u, matvec_ds(Wj, y))
        return x, y

    x, y = solve_delta(r, s)
    # iterative refinement against the true (delta-free) KKT
    Qj = transpose_ds(Q)  # symmetric; j-major orientation for matvec
    Aj = transpose_ds(A)

    def refine(_, xy):
        x, y = xy
        # residuals: rr = r - (Q x + A^T y); rs = s - A x
        Qx = matvec_ds(Qj, x)
        Aty = matvec_ds(A, y)      # A^T y: j-major of A^T is A itself
        rr = ds.sub(r, ds.add(Qx, Aty))
        Ax = matvec_ds(Aj, x)
        rs = ds.sub(s, Ax)
        dx, dy = solve_delta(rr, rs)
        return ds.add(x, dx), ds.add(y, dy)

    x, y = jax.lax.fori_loop(0, refine_steps, refine, (x, y))
    return x


# ---------------------------------------------------------------------------
# hybrid f32-seed factorization: XLA batched Cholesky/matmuls (MXU) for the
# Schur-complement inverse in f32, then thin ds refinement of only the
# blocks the ADMM loop needs. The all-ds Schur route above is ~latency
# bound (O(n^2) sequential fori micro-steps); this path replaces it with
# O(1) XLA batched linalg calls + O(N) ds refinement steps.
# ---------------------------------------------------------------------------


def _chol_f32_jittered(H: Array) -> Array:
    """Batch-leading (B, n, n) f32 Cholesky with one jittered retry for
    instances whose factor comes back non-finite (the f32 analog of
    `chol_regularized_ds`; accuracy is healed downstream by ds
    refinement against the true KKT)."""
    L = jnp.linalg.cholesky(H)  # internal dots inherit default_matmul_precision
    bad = ~jnp.all(jnp.isfinite(L), axis=(-1, -2))  # (B,)
    n = H.shape[-1]
    scale = jnp.max(jnp.abs(H), axis=(-1, -2))
    shift = jnp.where(bad, 1e-4 * jnp.maximum(scale, 1.0), 0.0)
    L2 = jnp.linalg.cholesky(H + shift[:, None, None] * jnp.eye(n, dtype=H.dtype))
    return jnp.where(bad[:, None, None], L2, L)


def spd_inverse_ns_f32(H: Array, iters: int = 30) -> Array:
    """Batched f32 SPD inverse by Newton-Schulz iteration, pure MXU
    matmuls (batch-leading (B, n, n)).

    X0 = H / ||H||_F^2 guarantees ||I - X0 H||_2 < 1 for SPD H
    (lambda_max <= ||H||_F); convergence is linear until the residual
    drops below ~1, then quadratic — `iters` ~ log2(kappa * n) + 6.
    ~2 matmuls per iteration, each a (B, n, n) MXU pass at HIGHEST
    precision (TPU f32 matmuls default to bf16 otherwise); 30
    iterations of a (4096, 60, 60) batch cost ~2 ms on v5e.
    """
    n = H.shape[-1]
    f32 = H.dtype
    hi_p = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi_p)
    mm_h = lambda a, b: jnp.matmul(a, b, precision="high")
    fro2 = jnp.sum(H * H, axis=(-1, -2))                      # (B,)
    alpha = 1.0 / jnp.maximum(fro2, 1e-30)
    X = jnp.swapaxes(H, -1, -2) * alpha[:, None, None]
    eye2 = 2.0 * jnp.eye(n, dtype=f32)

    # approach phase at HIGH (3-pass bf16, eps ~2e-6 — still
    # contracting for the equilibrated kappa here), HIGHEST tail to
    # reach the f32 floor; see ops/polish._polish_seed_f32 for the
    # precision-ladder rationale (DEFAULT would not contract at all)
    tail = min(6, iters)

    def body_h(_, X):
        return mm_h(X, eye2 - mm_h(H, X))

    def body(_, X):
        return mm(X, eye2 - mm(H, X))

    X = jax.lax.fori_loop(0, iters - tail, body_h, X)
    return jax.lax.fori_loop(0, tail, body, X)


def kkt_inverse_f32_seed(Q: DS, A: DS, rho: Array, delta: float = 1e-2):
    """f32 inverse SEED for the KKT [[Q+diag(rho), A'],[A,0]].

    Returns ``(X, resid)`` — the seed and a per-instance ``(B,)``
    inf-norm estimate of ``I - X M`` against the TRUE KKT, so callers
    can detect instances where the Newton-Schulz polish failed to
    contract and route them to a robust fallback.

    Batch-last ds inputs; X is the full (N, N, B) f32 inverse of a
    DELTA-REGULARIZED KKT — [[H + delta*I, A'],[A, 0]] — NOT of the true
    system: the (1,1) block H alone can be near-singular even when the
    full KKT is well-conditioned (rank-deficient task Hessians are the
    norm in OSC; the reference hits the same issue and falls back to a
    rank-revealing decomposition, `fcc_qp.cpp:163-177`). The downstream
    ds refinement runs against the TRUE KKT and contracts the delta
    away at ~delta * ||KKT^-1|| per pass.

    rho: (B,) uniform or (n, B) per-coordinate.

    Implementation is MXU-only: Newton-Schulz SPD inverses of H_delta
    and of the Schur complement S = A H_delta^-1 A'. (XLA's batched
    Cholesky/triangular-solve are latency-bound on TPU: ~100 ms for
    (4096, 60, 60) vs ~5 ms for this route.)
    """
    n, _, B = Q.hi.shape
    m = A.hi.shape[0]
    f32 = Q.hi.dtype
    hi_p = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi_p)
    Qb = jnp.moveaxis(Q.hi, -1, 0)              # (B, n, n)
    Ab = jnp.moveaxis(A.hi, -1, 0)              # (B, m, n)
    rho_nb = rho if rho.ndim == 2 else jnp.broadcast_to(rho[None, :], (n, B))
    dvec = jnp.moveaxis(rho_nb, -1, 0)          # (B, n)
    eye_n = jnp.eye(n, dtype=f32)
    H = Qb + dvec[:, :, None] * eye_n
    dscale = delta * jnp.max(jnp.abs(H), axis=(-1, -2))  # (B,)
    H = H + dscale[:, None, None] * eye_n

    Hinv = spd_inverse_ns_f32(H)
    At = jnp.swapaxes(Ab, -1, -2)               # (B, n, m)
    W = mm(Hinv, At)                            # (B, n, m)
    S = mm(Ab, W)                               # (B, m, m)
    Sinv = spd_inverse_ns_f32(S)
    T = mm(Sinv, jnp.swapaxes(W, -1, -2))       # (B, m, n)
    F = Hinv - mm(W, T)
    G = jnp.swapaxes(T, -1, -2)
    X = jnp.concatenate(
        [
            jnp.concatenate([F, G], axis=-1),
            jnp.concatenate([T, -Sinv], axis=-1),
        ],
        axis=-2,
    )                                           # (B, N, N)

    # polish the delta away against the TRUE (unregularized) f32 KKT:
    # each full Newton-Schulz step squares ||I - X M|| (~delta*||M^-1||
    # from the regularization) down to the f32 floor — two MXU matmuls
    # of (B, N, N) per step. GUARDED: when delta*||M^-1|| >= 1
    # (ill-conditioned/unequilibrated KKT) the NS residual squares UP
    # instead of down, so each step keeps the best-residual iterate
    # per instance (monotone non-increasing), and the final residual is
    # returned so callers can detect a non-contracting seed and fall
    # back (the hybrid factorization routes those instances through the
    # all-ds Schur factorization).
    N = n + m
    Mb = jnp.zeros((B, N, N), f32)
    Mb = Mb.at[:, :n, :n].set(Qb + dvec[:, :, None] * eye_n)
    Mb = Mb.at[:, :n, n:].set(At)
    Mb = Mb.at[:, n:, :n].set(Ab)
    X_best, r_best = _ns_polish_guarded(X, Mb, steps=3)
    return jnp.moveaxis(X_best, 0, -1), r_best  # (N, N, B), (B,)


def _ns_polish_guarded(X: Array, Mb: Array, steps: int):
    """Guarded Newton-Schulz polish of an f32 inverse iterate against
    Mb (batch-leading). Keeps the best-residual iterate per instance
    (monotone non-increasing; NS squares the residual UP when >= 1) and
    returns ``(X_best (B,N,N), resid (B,))``."""
    N = Mb.shape[-1]
    f32 = Mb.dtype
    hi_p = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi_p)
    eyeN = jnp.eye(N, dtype=f32)
    eye2N = 2.0 * eyeN

    def resid_inf(P):
        # ||I - X M||_inf estimated from the (already needed) product
        # P = M X; NaN/inf-safe: non-finite products report inf.
        r = jnp.max(jnp.sum(jnp.abs(P - eyeN), axis=-1), axis=-1)  # (B,)
        return jnp.where(jnp.isfinite(r), r, jnp.inf)

    P = mm(Mb, X)
    r_best = resid_inf(P)
    X_best = X
    for _ in range(steps):
        X = mm(X, eye2N - P)
        P = mm(Mb, X)
        r = resid_inf(P)
        better = r < r_best
        X_best = jnp.where(better[:, None, None], X, X_best)
        r_best = jnp.minimum(r, r_best)
    return X_best, r_best


def kkt_inverse_f32_refresh(X_prev: Array, Q: DS, A: DS, rho: Array,
                            steps: int = 3):
    """Refresh a carried f32 KKT inverse seed against the CURRENT
    (unregularized) KKT — the warm-operator path for sequential replay.

    A control-rate replay changes (Q, A_eq) by ~0.1%/step, so the
    previous step's inverse has NS residual ~||X|| * ||dM|| << 1 and a
    couple of guarded Newton-Schulz steps restore it to the f32 floor —
    replacing the full Schur seed build (two SPD NS inversions + block
    assembly, `kkt_inverse_f32_seed`) with ~2*steps MXU matmuls.

    X_prev (N, N, B) batch-last; returns ``(X (N,N,B), resid (B,))`` —
    same contract as `kkt_inverse_f32_seed`, so callers route
    non-contracting instances (resid large: the data jumped, e.g. a
    stream boundary) to the same fallback.
    """
    n, _, B = Q.hi.shape
    m = A.hi.shape[0]
    f32 = Q.hi.dtype
    Qb = jnp.moveaxis(Q.hi, -1, 0)
    Ab = jnp.moveaxis(A.hi, -1, 0)
    rho_nb = rho if rho.ndim == 2 else jnp.broadcast_to(rho[None, :], (n, B))
    dvec = jnp.moveaxis(rho_nb, -1, 0)
    eye_n = jnp.eye(n, dtype=f32)
    N = n + m
    Mb = jnp.zeros((B, N, N), f32)
    Mb = Mb.at[:, :n, :n].set(Qb + dvec[:, :, None] * eye_n)
    Mb = Mb.at[:, :n, n:].set(jnp.swapaxes(Ab, -1, -2))
    Mb = Mb.at[:, n:, :n].set(Ab)
    X_best, r_best = _ns_polish_guarded(
        jnp.moveaxis(X_prev, -1, 0), Mb, steps=steps
    )
    return jnp.moveaxis(X_best, 0, -1), r_best


def refine_inverse_columns_ds(
    X32: Array, M: DS, cols: np.ndarray, passes: int = 2
) -> DS:
    """ds-accurate selected columns of M^{-1} from an f32 inverse seed.

    Newton-Schulz restricted to the needed columns: per pass, the
    residual R = E_cols - M C is computed in ds (exactness matters: R is
    what carries the correction), while the correction X32 @ R.hi runs
    as one f32 MXU matmul (R ~ 1e-4, so f32 relative error lands at
    ~1e-11 absolute). Two passes take a kappa~1e5 f32 seed to ds level.

    X32 (N, N, B) f32, M (N, N, B) ds, cols static -> C (N, k, B) ds.
    """
    N, _, B = M.hi.shape
    f32 = M.hi.dtype
    k = len(cols)
    C = ds.from_f32(X32[:, cols])
    E = DS(
        jnp.broadcast_to(jnp.eye(N, dtype=f32)[:, cols, None], (N, k, B)),
        jnp.zeros((N, k, B), f32),
    )
    X32b = jnp.moveaxis(X32, -1, 0)             # (B, N, N)
    hi_p = jax.lax.Precision.HIGHEST
    for _ in range(passes):
        R = ds.sub(E, matmul_ds(M, C))
        dC = jnp.matmul(
            X32b, jnp.moveaxis(R.hi, -1, 0), precision=hi_p
        )                                       # (B, N, k) on the MXU
        C = ds.add(C, ds.from_f32(jnp.moveaxis(dC, 0, -1)))
    return C


def solve_from_seed_ds(X32: Array, M: DS, r: DS, passes: int = 2) -> DS:
    """ds-accurate solve M x = r via the f32 inverse seed + iterative
    refinement with ds residuals (M symmetric). r (N, B) -> x (N, B)."""
    X32b = jnp.moveaxis(X32, -1, 0)             # (B, N, N)
    hi_p = jax.lax.Precision.HIGHEST

    def apply32(v: Array) -> Array:
        return jnp.moveaxis(
            jnp.matmul(
                X32b, jnp.moveaxis(v, -1, 0)[:, :, None], precision=hi_p
            )[:, :, 0],
            0, -1,
        )

    x = ds.from_f32(apply32(r.hi))
    for _ in range(passes):
        resid = ds.sub(r, matvec_ds(M, x))      # M symmetric: j-major ok
        x = ds.add(x, ds.from_f32(apply32(resid.hi)))
    return x
