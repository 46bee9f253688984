"""Pallas TPU kernels: fused ADMM iteration chunks (ds and f32).

The XLA ds engine (`core/ds_engine.py`) dispatches ~60 fused micro-steps
per ADMM iteration, each materializing (n, B) intermediates; measured
~23 us/iteration for B=512 on v5e. These kernels fuse a whole chunk of
iterations per batch tile: the KKT inverse operator stays resident in
VMEM, every iteration is pure VPU work over (n, TB) tiles with the batch
in the 128-wide lane dimension, and a tile whose instances have all
converged exits its while-loop early (per-tile early exit — the global
XLA loop can only exit when the whole batch converges).

Two precisions share the structure:

* ``_kernel`` — double-single (`ops/ds.py`): ~2^-48 effective mantissa,
  the endgame phase that resolves 1e-6-absolute convergence.
* ``_kernel32`` — plain f32 (~4x fewer VPU ops/iteration): the approach
  phase, run until the residuals cross a coarse switch tolerance, after
  which the engine lifts the state to ds and finishes with `_kernel`.

Math mirrors `_solve_ds_reduced_jit`'s iteration (reference ADMM,
`/root/reference/src/fcc_qp.cpp:79-110`): mat-vec primal update,
box/cone projections, scaled dual ascent, weighted inf-norm convergence
check. Iteration counts are carried PER INSTANCE (`itv`) so a two-phase
solve reports exact per-instance n_iter.

The kernels run ONE chunk (<= K iterations); the adaptive-rho outer
structure (refactorization etc.) stays in the XLA engine, which calls
the kernel once per chunk.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import fcc_qp_tpu.ops.ds as ds
from fcc_qp_tpu.config import ProblemShape
from fcc_qp_tpu.ops.ds import DS

TILE = 128  # instances per grid cell = TPU lane width


def _kernel(
    # refs (all VMEM): ds pairs are separate hi/lo refs
    Fj_hi, Fj_lo, xc_hi, xc_lo, lb_hi, lb_lo, ub_hi, ub_lo,
    mu_f_hi, mu_f_lo, wx_ref, wl_ref, rho_ref, eps_ref,
    x_hi, x_lo, xb_hi, xb_lo, lbar_hi, lbar_lo,
    mux_hi, mux_lo, mul_hi, mul_lo,
    done_ref, n_iter_ref, itv_ref,
    v_hi, v_lo,
    # outputs
    ox_hi, ox_lo, oxb_hi, oxb_lo, olbar_hi, olbar_lo,
    omux_hi, omux_lo, omul_hi, omul_lo, ov_hi, ov_lo,
    odone, on_iter, oitv, oxrn, olrn, oprim, odual,
    *, nv, nc, ls, K, max_iter, inc_gate,
):
    f32 = jnp.float32
    ncones = nc // 3

    Fj = DS(Fj_hi[:], Fj_lo[:])
    x_const = DS(xc_hi[:], xc_lo[:])
    lb = DS(lb_hi[:], lb_lo[:])
    ub = DS(ub_hi[:], ub_lo[:])
    mu_f = DS(mu_f_hi[:], mu_f_lo[:]) if nc else None
    wx = wx_ref[:]            # (nv, TILE) residual weights (unscaling)
    wl = wl_ref[:]            # (nc|1, TILE)
    rho = rho_ref[:]          # (1, TILE)
    eps_bound = eps_ref[0, 0]
    eps_fcone = eps_ref[0, 1]

    def seg(v: DS) -> DS:
        return DS(v.hi[ls:ls + nc], v.lo[ls:ls + nc])

    def set_seg(v: DS, s: DS) -> DS:
        # static-slice concatenation (Mosaic has no dynamic_update_slice)
        if nc == 0:
            return v

        def cat(a, b):
            parts = []
            if ls > 0:
                parts.append(a[:ls])
            parts.append(b)
            if ls + nc < nv:
                parts.append(a[ls + nc:])
            return jnp.concatenate(parts, axis=0)

        return DS(cat(v.hi, s.hi), cat(v.lo, s.lo))

    def matvec(v: DS) -> DS:
        # statically unrolled over the (small) contraction axis: Mosaic
        # does not lower dynamic_slice on values, and static slices let
        # it register-allocate the whole chain
        acc = ds.mul(DS(Fj.hi[0], Fj.lo[0]), DS(v.hi[0:1], v.lo[0:1]))
        for j in range(1, nv):
            acc = ds.fma(
                acc, DS(Fj.hi[j], Fj.lo[j]), DS(v.hi[j:j + 1], v.lo[j:j + 1])
            )
        return acc

    def project_cone(f: DS) -> DS:
        f3 = DS(f.hi.reshape(ncones, 3, TILE), f.lo.reshape(ncones, 3, TILE))
        fx = DS(f3.hi[:, 0], f3.lo[:, 0])
        fy = DS(f3.hi[:, 1], f3.lo[:, 1])
        fz = DS(f3.hi[:, 2], f3.lo[:, 2])
        norm = ds.sqrt(ds.add(ds.mul(fx, fx), ds.mul(fy, fy)))
        inside = ds.sub(ds.mul(mu_f, fz), norm).hi >= 0
        polar = ds.add(fz, ds.mul(mu_f, norm)).hi < 0
        one_p = ds.add_f32(ds.mul(mu_f, mu_f), jnp.ones_like(mu_f.hi))
        t = ds.div(ds.add(ds.mul(mu_f, norm), fz), one_p)
        safe = ds.where(norm.hi > 0, norm, ds.from_f32(jnp.ones_like(norm.hi)))
        scale = ds.div(ds.mul(t, mu_f), safe)
        px, py, pz = ds.mul(scale, fx), ds.mul(scale, fy), t
        zero = ds.zeros(fx.hi.shape, f32)

        def sel(surf, orig):
            return ds.where(inside, orig, ds.where(polar, zero, surf))

        ox_, oy_, oz_ = sel(px, fx), sel(py, fy), sel(pz, fz)
        hi = jnp.stack([ox_.hi, oy_.hi, oz_.hi], axis=1).reshape(nc, TILE)
        lo = jnp.stack([ox_.lo, oy_.lo, oz_.lo], axis=1).reshape(nc, TILE)
        return DS(hi, lo)

    class Carry(NamedTuple):
        k: jnp.ndarray
        x: DS
        x_bar: DS
        lam_bar: DS
        mu_x: DS
        mu_lam: DS
        v: DS  # the s-mu that produced x (accepted-iterate recovery)
        itv: jnp.ndarray   # per-instance iteration counters
        xrn: jnp.ndarray
        lrn: jnp.ndarray
        prim: jnp.ndarray
        dual: jnp.ndarray
        n_iter: jnp.ndarray
        done: jnp.ndarray

    init = Carry(
        k=jnp.int32(0),
        x=DS(x_hi[:], x_lo[:]),
        x_bar=DS(xb_hi[:], xb_lo[:]),
        lam_bar=DS(lbar_hi[:], lbar_lo[:]),
        mu_x=DS(mux_hi[:], mux_lo[:]),
        mu_lam=DS(mul_hi[:], mul_lo[:]),
        v=DS(v_hi[:], v_lo[:]),
        itv=itv_ref[:],
        xrn=jnp.zeros((1, TILE), f32),
        lrn=jnp.zeros((1, TILE), f32),
        prim=jnp.zeros((1, TILE), f32),
        dual=jnp.zeros((1, TILE), f32),
        n_iter=n_iter_ref[:],
        done=done_ref[:],  # int32 mask: bool vectors don't legalize in
                           # Mosaic loop carries
    )

    def cond(c: Carry):
        alive = ((c.done == 0) & (c.itv < max_iter)).astype(jnp.int32)
        return (c.k < K) & (jnp.max(alive) > 0)

    def body(c: Carry) -> Carry:
        s_prev = set_seg(c.x_bar, c.lam_bar)
        u = set_seg(c.mu_x, c.mu_lam)
        v = ds.sub(s_prev, u)

        y = matvec(v)
        x = ds.add(x_const, ds.mul_f32(y, rho))

        x_bar = ds.clip(ds.add(x, c.mu_x), lb, ub)
        if nc:
            lam_bar = project_cone(ds.add(seg(x), c.mu_lam))
        else:
            lam_bar = c.lam_bar

        s_now = set_seg(x_bar, lam_bar)
        x_res = ds.sub(x, x_bar)
        lam_res = ds.sub(seg(x), lam_bar) if nc else None
        xrn = jnp.max(jnp.abs(x_res.hi) * wx, axis=0, keepdims=True)
        lrn = (
            jnp.max(jnp.abs(lam_res.hi) * wl, axis=0, keepdims=True)
            if nc
            else jnp.zeros((1, TILE), f32)
        )

        mu_x = ds.add(c.mu_x, x_res)
        mu_lam = (
            ds.add(c.mu_lam, lam_res) if nc else c.mu_lam
        )

        dprim = ds.sub(x, s_now).hi * wx
        dchange = ds.sub(s_now, s_prev).hi * wx
        prim = jnp.sqrt(jnp.sum(dprim * dprim, axis=0, keepdims=True))
        dual = rho * jnp.sqrt(jnp.sum(dchange * dchange, axis=0, keepdims=True))

        conv = (lrn < eps_fcone) & (xrn < eps_bound)
        if inc_gate:
            # primal-increment gate, mirroring the XLA loops exactly
            # (core/ds_engine.py `iteration`): with operator presolve,
            # zero projection residual does not imply the primal has
            # finished contracting. Box term = non-cone rows (static
            # slices — Mosaic-friendly), cone term = the segment.
            dx = jnp.abs(ds.sub(x, c.x).hi)
            dxw = dx * wx
            parts = []
            if ls > 0:
                parts.append(jnp.max(dxw[:ls], axis=0, keepdims=True))
            if ls + nc < nv:
                parts.append(
                    jnp.max(dxw[ls + nc:], axis=0, keepdims=True)
                )
            if parts:
                x_inc = (
                    parts[0] if len(parts) == 1
                    else jnp.maximum(parts[0], parts[1])
                )
                conv = conv & (x_inc < eps_bound)
            if nc:
                lam_inc = jnp.max(
                    dx[ls:ls + nc] * wl, axis=0, keepdims=True
                )
                conv = conv & (lam_inc < eps_fcone)
        active = (c.done == 0) & (c.itv < max_iter)
        n_iter = jnp.where(conv & active, c.itv, c.n_iter)

        def commit_ds(new: DS, old: DS) -> DS:
            return ds.where(active, new, old)

        def commit(new, old):
            return jnp.where(active, new, old)

        return Carry(
            k=c.k + 1,
            x=commit_ds(x, c.x),
            x_bar=commit_ds(x_bar, c.x_bar),
            lam_bar=commit_ds(lam_bar, c.lam_bar) if nc else c.lam_bar,
            mu_x=commit_ds(mu_x, c.mu_x),
            mu_lam=commit_ds(mu_lam, c.mu_lam) if nc else c.mu_lam,
            v=commit_ds(v, c.v),
            itv=jnp.where(active, c.itv + 1, c.itv),
            xrn=commit(xrn, c.xrn),
            lrn=commit(lrn, c.lrn),
            prim=commit(prim, c.prim),
            dual=commit(dual, c.dual),
            n_iter=commit(n_iter, c.n_iter),
            done=jnp.where(conv & active, jnp.int32(1), c.done),
        )

    out = jax.lax.while_loop(cond, body, init)

    ox_hi[:], ox_lo[:] = out.x.hi, out.x.lo
    oxb_hi[:], oxb_lo[:] = out.x_bar.hi, out.x_bar.lo
    olbar_hi[:], olbar_lo[:] = out.lam_bar.hi, out.lam_bar.lo
    omux_hi[:], omux_lo[:] = out.mu_x.hi, out.mu_x.lo
    omul_hi[:], omul_lo[:] = out.mu_lam.hi, out.mu_lam.lo
    ov_hi[:], ov_lo[:] = out.v.hi, out.v.lo
    odone[:] = out.done
    on_iter[:] = out.n_iter
    oitv[:] = out.itv
    oxrn[:] = out.xrn
    olrn[:] = out.lrn
    oprim[:] = out.prim
    odual[:] = out.dual


def _kernel32(
    # refs (all VMEM, f32/int32 only — the approach-phase kernel)
    Fj_ref, xc_ref, lb_ref, ub_ref, mu_f_ref, wx_ref, wl_ref,
    rho_ref, eps_ref,
    x_ref, xb_ref, lbar_ref, mux_ref, mul_ref,
    done_ref, n_iter_ref, itv_ref, v_ref,
    # outputs
    ox, oxb, olbar, omux, omul, ov,
    odone, on_iter, oitv, oxrn, olrn, oprim, odual,
    *, nv, nc, ls, K, max_iter,
):
    f32 = jnp.float32
    ncones = nc // 3

    Fj = Fj_ref[:]
    x_const = xc_ref[:]
    lb = lb_ref[:]
    ub = ub_ref[:]
    mu_f = mu_f_ref[:] if nc else None
    wx = wx_ref[:]
    wl = wl_ref[:]
    rho = rho_ref[:]
    eps_bound = eps_ref[0, 0]
    eps_fcone = eps_ref[0, 1]

    def seg(v):
        return v[ls:ls + nc]

    def set_seg(v, s):
        if nc == 0:
            return v
        parts = []
        if ls > 0:
            parts.append(v[:ls])
        parts.append(s)
        if ls + nc < nv:
            parts.append(v[ls + nc:])
        return jnp.concatenate(parts, axis=0)

    def matvec(v):
        acc = Fj[0] * v[0:1]
        for j in range(1, nv):
            acc = acc + Fj[j] * v[j:j + 1]
        return acc

    def project_cone(f):
        f3 = f.reshape(ncones, 3, TILE)
        fx, fy, fz = f3[:, 0], f3[:, 1], f3[:, 2]
        norm = jnp.sqrt(fx * fx + fy * fy)
        inside = mu_f * fz - norm >= 0
        polar = fz + mu_f * norm < 0
        t = (mu_f * norm + fz) / (mu_f * mu_f + 1.0)
        safe = jnp.where(norm > 0, norm, jnp.ones_like(norm))
        scale = t * mu_f / safe
        px, py, pz = scale * fx, scale * fy, t
        zero = jnp.zeros_like(fx)

        def sel(surf, orig):
            return jnp.where(inside, orig, jnp.where(polar, zero, surf))

        return jnp.stack(
            [sel(px, fx), sel(py, fy), sel(pz, fz)], axis=1
        ).reshape(nc, TILE)

    class Carry(NamedTuple):
        k: jnp.ndarray
        x: jnp.ndarray
        x_bar: jnp.ndarray
        lam_bar: jnp.ndarray
        mu_x: jnp.ndarray
        mu_lam: jnp.ndarray
        v: jnp.ndarray
        itv: jnp.ndarray
        xrn: jnp.ndarray
        lrn: jnp.ndarray
        prim: jnp.ndarray
        dual: jnp.ndarray
        n_iter: jnp.ndarray
        done: jnp.ndarray

    init = Carry(
        k=jnp.int32(0),
        x=x_ref[:], x_bar=xb_ref[:], lam_bar=lbar_ref[:],
        mu_x=mux_ref[:], mu_lam=mul_ref[:], v=v_ref[:],
        itv=itv_ref[:],
        xrn=jnp.zeros((1, TILE), f32),
        lrn=jnp.zeros((1, TILE), f32),
        prim=jnp.zeros((1, TILE), f32),
        dual=jnp.zeros((1, TILE), f32),
        n_iter=n_iter_ref[:],
        done=done_ref[:],
    )

    def cond(c: Carry):
        alive = ((c.done == 0) & (c.itv < max_iter)).astype(jnp.int32)
        return (c.k < K) & (jnp.max(alive) > 0)

    def body(c: Carry) -> Carry:
        s_prev = set_seg(c.x_bar, c.lam_bar)
        u = set_seg(c.mu_x, c.mu_lam)
        v = s_prev - u

        x = x_const + rho * matvec(v)
        x_bar = jnp.clip(x + c.mu_x, lb, ub)
        lam_bar = project_cone(seg(x) + c.mu_lam) if nc else c.lam_bar

        s_now = set_seg(x_bar, lam_bar)
        x_res = x - x_bar
        lam_res = seg(x) - lam_bar if nc else None
        xrn = jnp.max(jnp.abs(x_res) * wx, axis=0, keepdims=True)
        lrn = (
            jnp.max(jnp.abs(lam_res) * wl, axis=0, keepdims=True)
            if nc else jnp.zeros((1, TILE), f32)
        )

        mu_x = c.mu_x + x_res
        mu_lam = c.mu_lam + lam_res if nc else c.mu_lam

        dprim = (x - s_now) * wx
        dchange = (s_now - s_prev) * wx
        prim = jnp.sqrt(jnp.sum(dprim * dprim, axis=0, keepdims=True))
        dual = rho * jnp.sqrt(
            jnp.sum(dchange * dchange, axis=0, keepdims=True)
        )

        conv = (lrn < eps_fcone) & (xrn < eps_bound)
        active = (c.done == 0) & (c.itv < max_iter)
        n_iter = jnp.where(conv & active, c.itv, c.n_iter)

        def commit(new, old):
            return jnp.where(active, new, old)

        return Carry(
            k=c.k + 1,
            x=commit(x, c.x),
            x_bar=commit(x_bar, c.x_bar),
            lam_bar=commit(lam_bar, c.lam_bar) if nc else c.lam_bar,
            mu_x=commit(mu_x, c.mu_x),
            mu_lam=commit(mu_lam, c.mu_lam) if nc else c.mu_lam,
            v=commit(v, c.v),
            itv=jnp.where(active, c.itv + 1, c.itv),
            xrn=commit(xrn, c.xrn),
            lrn=commit(lrn, c.lrn),
            prim=commit(prim, c.prim),
            dual=commit(dual, c.dual),
            n_iter=commit(n_iter, c.n_iter),
            done=jnp.where(conv & active, jnp.int32(1), c.done),
        )

    out = jax.lax.while_loop(cond, body, init)

    ox[:] = out.x
    oxb[:] = out.x_bar
    olbar[:] = out.lam_bar
    omux[:] = out.mu_x
    omul[:] = out.mu_lam
    ov[:] = out.v
    odone[:] = out.done
    on_iter[:] = out.n_iter
    oitv[:] = out.itv
    oxrn[:] = out.xrn
    olrn[:] = out.lrn
    oprim[:] = out.prim
    odual[:] = out.dual


def _dup(spec_shape, index_map):
    return pl.BlockSpec(spec_shape, index_map, memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("shape", "K", "max_iter", "interpret", "inc_gate"),
)
def admm_chunk_pallas(
    Fj: DS,
    x_const: DS,
    lb: DS,
    ub: DS,
    mu_f: DS,
    rho,
    eps_bound,
    eps_fcone,
    x: DS,
    x_bar: DS,
    lam_bar: DS,
    mu_x: DS,
    mu_lam: DS,
    v: DS,
    done,
    n_iter,
    itv,
    shape: ProblemShape,
    K: int,
    max_iter: int,
    interpret: bool = False,
    weights=None,
    cone_weights=None,
    inc_gate: bool = False,
):
    """Run up to K fused ds ADMM iterations per batch tile.

    All arrays batch-last with B a multiple of 128 (caller pads).
    ``itv`` (B,) int32: per-instance iteration counters (continue across
    chunks and phases — n_iter records the counter value at the
    converging iteration). Returns the updated state plus per-instance
    residual norms.

    ``weights`` (nv, B) / ``cone_weights`` (nc, B): multiplied into the
    residuals before the inf-norms so convergence is checked in
    unscaled units when the problem is Ruiz-equilibrated
    (`ops/scaling.py`); default all-ones.
    """
    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    B = x.hi.shape[-1]
    assert B % TILE == 0, f"batch {B} must be a multiple of {TILE}"
    grid = (B // TILE,)
    f32 = jnp.float32
    if weights is None:
        weights = jnp.ones((nv, B), f32)
    if cone_weights is None or nc == 0:
        cone_weights = jnp.ones((max(nc, 1), B), f32)

    mat = _dup((nv, nv, TILE), lambda i: (i * 0, i * 0, i))
    vec = _dup((nv, TILE), lambda i: (i * 0, i))
    cvec = _dup((max(nc, 1), TILE), lambda i: (i * 0, i))
    cone = _dup((max(nc // 3, 1), TILE), lambda i: (i * 0, i))
    one = _dup((1, TILE), lambda i: (i * 0, i))
    smem2 = pl.BlockSpec((1, 2), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)

    eps = jnp.array([[eps_bound, eps_fcone]], f32)
    rho2 = rho.reshape(1, B).astype(f32)
    done2 = done.reshape(1, B).astype(jnp.int32)
    n_iter2 = n_iter.reshape(1, B)
    itv2 = itv.reshape(1, B).astype(jnp.int32)

    def pad_c(a):
        # give zero-cone problems a dummy row so specs stay rank-2
        return a if nc else jnp.zeros((1, B), f32)

    out_shapes = (
        jax.ShapeDtypeStruct((nv, B), f32),  # x hi
        jax.ShapeDtypeStruct((nv, B), f32),
        jax.ShapeDtypeStruct((nv, B), f32),  # x_bar
        jax.ShapeDtypeStruct((nv, B), f32),
        jax.ShapeDtypeStruct((max(nc, 1), B), f32),  # lam_bar
        jax.ShapeDtypeStruct((max(nc, 1), B), f32),
        jax.ShapeDtypeStruct((nv, B), f32),  # mu_x
        jax.ShapeDtypeStruct((nv, B), f32),
        jax.ShapeDtypeStruct((max(nc, 1), B), f32),  # mu_lam
        jax.ShapeDtypeStruct((max(nc, 1), B), f32),
        jax.ShapeDtypeStruct((nv, B), f32),  # v
        jax.ShapeDtypeStruct((nv, B), f32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),  # done
        jax.ShapeDtypeStruct((1, B), jnp.int32),  # n_iter
        jax.ShapeDtypeStruct((1, B), jnp.int32),  # itv
        jax.ShapeDtypeStruct((1, B), f32),  # xrn
        jax.ShapeDtypeStruct((1, B), f32),  # lrn
        jax.ShapeDtypeStruct((1, B), f32),  # prim
        jax.ShapeDtypeStruct((1, B), f32),  # dual
    )
    out_specs = (
        vec, vec, vec, vec, cvec, cvec, vec, vec, cvec, cvec, vec, vec,
        one, one, one, one, one, one, one,
    )

    kernel = functools.partial(
        _kernel, nv=nv, nc=nc, ls=ls, K=K, max_iter=max_iter,
        inc_gate=inc_gate,
    )

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            mat, mat, vec, vec, vec, vec, vec, vec, cone, cone,
            vec, cvec, one, smem2,
            vec, vec, vec, vec, cvec, cvec, vec, vec, cvec, cvec,
            one, one, one, vec, vec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        Fj.hi, Fj.lo, x_const.hi, x_const.lo, lb.hi, lb.lo, ub.hi, ub.lo,
        pad_c(mu_f.hi) if nc == 0 else mu_f.hi,
        pad_c(mu_f.lo) if nc == 0 else mu_f.lo,
        weights, cone_weights,
        rho2, eps,
        x.hi, x.lo, x_bar.hi, x_bar.lo,
        pad_c(lam_bar.hi), pad_c(lam_bar.lo),
        mu_x.hi, mu_x.lo, pad_c(mu_lam.hi), pad_c(mu_lam.lo),
        done2, n_iter2, itv2, v.hi, v.lo,
    )

    (oxh, oxl, oxbh, oxbl, olbh, olbl, omxh, omxl, omlh, omll, ovh, ovl,
     odone, on_iter, oitv, oxrn, olrn, oprim, odual) = res

    def unpad_c(h, l):
        if nc == 0:
            return ds.zeros((0, B), f32)
        return DS(h, l)

    return (
        DS(oxh, oxl),
        DS(oxbh, oxbl),
        unpad_c(olbh, olbl),
        DS(omxh, omxl),
        unpad_c(omlh, omll),
        DS(ovh, ovl),
        odone[0] > 0,
        on_iter[0],
        oitv[0],
        oxrn[0],
        olrn[0],
        oprim[0],
        odual[0],
    )


@functools.partial(
    jax.jit,
    static_argnames=("shape", "K", "max_iter", "interpret"),
)
def admm_chunk_pallas32(
    Fj,
    x_const,
    lb,
    ub,
    mu_f,
    rho,
    eps_bound,
    eps_fcone,
    x,
    x_bar,
    lam_bar,
    mu_x,
    mu_lam,
    v,
    done,
    n_iter,
    itv,
    shape: ProblemShape,
    K: int,
    max_iter: int,
    interpret: bool = False,
    weights=None,
    cone_weights=None,
):
    """f32 approach-phase chunk: same structure as `admm_chunk_pallas`
    but plain f32 state (~4x fewer VPU ops per iteration). All array
    args are bare f32 arrays (no ds pairs); the engine lifts the result
    to ds before the endgame phase."""
    nv, nc, ls = shape.num_vars, shape.nc, shape.lambda_c_start
    B = x.shape[-1]
    assert B % TILE == 0, f"batch {B} must be a multiple of {TILE}"
    grid = (B // TILE,)
    f32 = jnp.float32
    if weights is None:
        weights = jnp.ones((nv, B), f32)
    if cone_weights is None or nc == 0:
        cone_weights = jnp.ones((max(nc, 1), B), f32)

    mat = _dup((nv, nv, TILE), lambda i: (i * 0, i * 0, i))
    vec = _dup((nv, TILE), lambda i: (i * 0, i))
    cvec = _dup((max(nc, 1), TILE), lambda i: (i * 0, i))
    cone = _dup((max(nc // 3, 1), TILE), lambda i: (i * 0, i))
    one = _dup((1, TILE), lambda i: (i * 0, i))
    smem2 = pl.BlockSpec((1, 2), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)

    eps = jnp.array([[eps_bound, eps_fcone]], f32)
    rho2 = rho.reshape(1, B).astype(f32)
    done2 = done.reshape(1, B).astype(jnp.int32)
    n_iter2 = n_iter.reshape(1, B)
    itv2 = itv.reshape(1, B).astype(jnp.int32)

    def pad_c(a):
        return a if nc else jnp.zeros((1, B), f32)

    out_shapes = (
        jax.ShapeDtypeStruct((nv, B), f32),          # x
        jax.ShapeDtypeStruct((nv, B), f32),          # x_bar
        jax.ShapeDtypeStruct((max(nc, 1), B), f32),  # lam_bar
        jax.ShapeDtypeStruct((nv, B), f32),          # mu_x
        jax.ShapeDtypeStruct((max(nc, 1), B), f32),  # mu_lam
        jax.ShapeDtypeStruct((nv, B), f32),          # v
        jax.ShapeDtypeStruct((1, B), jnp.int32),     # done
        jax.ShapeDtypeStruct((1, B), jnp.int32),     # n_iter
        jax.ShapeDtypeStruct((1, B), jnp.int32),     # itv
        jax.ShapeDtypeStruct((1, B), f32),           # xrn
        jax.ShapeDtypeStruct((1, B), f32),           # lrn
        jax.ShapeDtypeStruct((1, B), f32),           # prim
        jax.ShapeDtypeStruct((1, B), f32),           # dual
    )
    out_specs = (
        vec, vec, cvec, vec, cvec, vec,
        one, one, one, one, one, one, one,
    )

    kernel = functools.partial(
        _kernel32, nv=nv, nc=nc, ls=ls, K=K, max_iter=max_iter
    )

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            mat, vec, vec, vec, cone, vec, cvec, one, smem2,
            vec, vec, cvec, vec, cvec,
            one, one, one, vec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        Fj, x_const, lb, ub,
        mu_f if nc else jnp.zeros((1, B), f32),
        weights, cone_weights, rho2, eps,
        x, x_bar, pad_c(lam_bar), mu_x, pad_c(mu_lam),
        done2, n_iter2, itv2, v,
    )

    (ox, oxb, olb, omx, oml, ov,
     odone, on_iter, oitv, oxrn, olrn, oprim, odual) = res

    if nc == 0:
        olb = jnp.zeros((0, B), f32)
        oml = jnp.zeros((0, B), f32)

    return (
        ox, oxb, olb, omx, oml, ov,
        odone[0] > 0, on_iter[0], oitv[0],
        oxrn[0], olrn[0], oprim[0], odual[0],
    )
