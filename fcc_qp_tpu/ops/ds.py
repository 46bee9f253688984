"""Double-single ("ds") arithmetic: ~2^-48 precision from f32 pairs.

TPU has no native f64 ALU — XLA emulates f64 at a 20-50x slowdown for
the shapes this solver cares about (measured: 2.5 ms vs ~0.1 ms per
batched ADMM mat-vec iteration). This module implements the classic
double-single / double-word arithmetic (Dekker 1971; Knuth TAOCP v2;
Hida-Li-Bailey QD) on f32 pairs ``(hi, lo)`` with ``|lo| <= ulp(hi)/2``,
giving ~49 bits of effective mantissa — far more than the ~31 bits the
1e-6-absolute convergence target needs on O(100)-scale solutions.

Every function is pure jnp elementwise math, so the SAME code runs:
  * inside Pallas TPU kernels (VPU ops on f32 tiles), and
  * in plain XLA (for CPU tests against f64 references).

Correctness requirement: error-free transforms rely on strict IEEE f32
single-rounding per op. XLA does not reassociate user arithmetic, and
contraction of ``a*b - p`` into an FMA only *improves* `two_prod`.
Tested against f64 on CPU and on TPU hardware.

A ds value is a ``DS`` NamedTuple of two equal-shaped f32 arrays; it is
a pytree, so ds state flows through `lax.while_loop` / `fori_loop`
carries unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


# Compiler-robustness notes (hard-won, verified empirically):
#   * XLA:CPU's AVX backend contracts mul+add into FMA inside fused
#     loops, silently corrupting EFT chains (ds degraded to ~f32; the
#     optimized HLO is faithful — numpy emulation of it is correct —
#     the corruption happens in LLVM codegen). `optimization_barrier`
#     is stripped by the CPU pipeline and does not protect. Mitigation
#     for CPU runs: `XLA_FLAGS=--xla_cpu_max_isa=SSE4_2` (no FMA ISA;
#     set automatically in tests/conftest.py).
#   * XLA:TPU does NOT contract: all ds ops verified on hardware
#     against f64 (matvec err ~1e-10 on O(400)-scale data).
#   * `_split` uses integer mantissa masking instead of the
#     multiplicative Dekker split: exact by construction, immune to fp
#     rewrites, and makes every partial product in `two_prod` exactly
#     representable.


class DS(NamedTuple):
    hi: Array
    lo: Array

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape


# ---------------------------------------------------------------------------
# error-free transforms (f32 in, f32 pair out)
# ---------------------------------------------------------------------------

def two_sum(a: Array, b: Array) -> DS:
    """Exact sum: a + b = s + err with s = fl(a+b). (Knuth/Moller)"""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return DS(s, err)


def fast_two_sum(a: Array, b: Array) -> DS:
    """Exact sum assuming |a| >= |b| (Dekker)."""
    s = a + b
    err = b - (s - a)
    return DS(s, err)


def _split(a: Array) -> tuple[Array, Array]:
    """Bitmask split of f32 into 12-bit-mantissa halves.

    ``hi`` keeps the sign, exponent, and top 11 mantissa bits (12
    significant bits with the implicit one); ``lo = a - hi`` is exact
    (same-exponent subtraction) and carries the remaining 12 mantissa
    bits. Unlike the multiplicative Dekker split this uses integer ops,
    so no compiler fp rewrite can perturb it.
    """
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        ai & jnp.uint32(0xFFFFF000), a.dtype
    )
    return hi, a - hi


def two_prod(a: Array, b: Array) -> DS:
    """Exact product: a * b = p + err with p = fl(a*b). (Dekker, with
    exact 12-bit component products -> FMA-contraction-proof)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return DS(p, err)


# ---------------------------------------------------------------------------
# ds arithmetic
# ---------------------------------------------------------------------------

def from_f32(a: Array) -> DS:
    return DS(a, jnp.zeros_like(a))


def from_f64(a) -> DS:
    """Lossless-ish f64 -> ds conversion (for tests / host data prep)."""
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(a.dtype)).astype(jnp.float32)
    return DS(hi, lo)


def to_f64(x: DS):
    if jax.config.jax_enable_x64:
        return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)
    # Without x64 there is no wider dtype to reconstruct into; the
    # normalized pair's hi word already IS the correctly-rounded f32
    # value (|lo| <= ulp(hi)/2). Summing in f32 avoids the noisy
    # "float64 truncated to float32" UserWarning an astype would emit
    # (previously the first thing in every TPU bench artifact tail).
    return x.hi + x.lo


def renorm(hi: Array, lo: Array) -> DS:
    return fast_two_sum(hi, lo)


def neg(x: DS) -> DS:
    return DS(-x.hi, -x.lo)


def add(x: DS, y: DS) -> DS:
    """ds + ds (Knuth two-sum cascade)."""
    s = two_sum(x.hi, y.hi)
    e = s.lo + (x.lo + y.lo)
    return fast_two_sum(s.hi, e)


def add_f32(x: DS, c: Array) -> DS:
    s = two_sum(x.hi, c)
    return fast_two_sum(s.hi, s.lo + x.lo)


def sub(x: DS, y: DS) -> DS:
    return add(x, neg(y))


def mul(x: DS, y: DS) -> DS:
    """ds * ds."""
    p = two_prod(x.hi, y.hi)
    e = p.lo + (x.hi * y.lo + x.lo * y.hi)
    return fast_two_sum(p.hi, e)


def mul_f32(x: DS, c: Array) -> DS:
    p = two_prod(x.hi, c)
    return fast_two_sum(p.hi, p.lo + x.lo * c)


def fma(acc: DS, a: DS, b: DS) -> DS:
    """acc + a*b, the ds MAC used by mat-vec/factorization loops."""
    return add(acc, mul(a, b))


def div(x: DS, y: DS) -> DS:
    """ds / ds via f32 seed + one Newton step on the reciprocal, then a
    correction term; ~full ds accuracy for well-scaled inputs."""
    q1 = x.hi / y.hi
    # r = x - y*q1 computed exactly-ish in ds
    r = sub(x, mul_f32(y, q1))
    q2 = r.hi / y.hi
    q = fast_two_sum(q1, q2)
    # one more correction digit
    r2 = sub(x, mul(y, q))
    q3 = r2.hi / y.hi
    return fast_two_sum(q.hi, q.lo + q3)


def recip(y: DS) -> DS:
    return div(from_f32(jnp.ones_like(y.hi)), y)


def sqrt(x: DS) -> DS:
    """ds sqrt via f32 seed + one Heron/Newton correction:
    s = s0 + (x - s0^2) / (2 s0)."""
    s0 = jnp.sqrt(x.hi)
    # guard zero to avoid 0/0 (sqrt(0) = 0 exactly)
    safe = jnp.where(s0 > 0, s0, jnp.ones_like(s0))
    r = sub(x, DS(*two_prod(s0, s0)))
    corr = r.hi / (2.0 * safe)
    out = fast_two_sum(s0, jnp.where(s0 > 0, corr, jnp.zeros_like(corr)))
    return out


def where(mask: Array, x: DS, y: DS) -> DS:
    return DS(jnp.where(mask, x.hi, y.hi), jnp.where(mask, x.lo, y.lo))


def clip(x: DS, lb: DS, ub: DS) -> DS:
    """Elementwise ds clip by hi/lo lexicographic comparison.

    Comparison uses the hi words first and breaks ties on lo — exact for
    normalized ds values."""
    lt_lb = lt(x, lb)
    gt_ub = gt(x, ub)
    return where(lt_lb, lb, where(gt_ub, ub, x))


def lt(x: DS, y: DS) -> Array:
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def gt(x: DS, y: DS) -> Array:
    return (x.hi > y.hi) | ((x.hi == y.hi) & (x.lo > y.lo))


def abs_(x: DS) -> DS:
    m = x.hi < 0
    return where(m, neg(x), x)


def zeros(shape, dtype=jnp.float32) -> DS:
    z = jnp.zeros(shape, dtype)
    return DS(z, z)


# ---------------------------------------------------------------------------
# small linear-algebra helpers (loop-based; shapes static)
# ---------------------------------------------------------------------------

def matvec(F: DS, v: DS) -> DS:
    """y[i, ...] = sum_j F[j, i, ...] * v[j, ...].

    F is stored j-major — leading axis is the contraction index — so
    per-step slices are contiguous. Unrolled over the (static, small)
    contraction dim; each step is one ds MAC over the trailing axes.
    """
    n = F.hi.shape[0]
    acc = mul(DS(F.hi[0], F.lo[0]), DS(v.hi[0], v.lo[0]))
    for j in range(1, n):
        acc = fma(acc, DS(F.hi[j], F.lo[j]), DS(v.hi[j], v.lo[j]))
    return acc
