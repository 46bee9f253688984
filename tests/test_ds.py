"""Double-single arithmetic tests against f64 references (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

import fcc_qp_tpu.ops.ds as ds


def rand(rng, shape, scale=1.0):
    return rng.normal(size=shape) * scale


def as_ds(a64):
    return ds.from_f64(jnp.asarray(a64, jnp.float64))


def err(x_ds, ref64):
    got = np.asarray(ds.to_f64(x_ds), np.float64)
    denom = np.maximum(np.abs(ref64), 1.0)
    return np.max(np.abs(got - ref64) / denom)


TOL = 1e-13  # ds carries ~49 bits ~ 1.8e-15; leave headroom for cascades


class TestDSCore:
    def test_roundtrip(self, rng):
        a = rand(rng, (1000,), 100.0)
        assert err(as_ds(a), a) < 1e-14

    def test_add(self, rng):
        a, b = rand(rng, (1000,)), rand(rng, (1000,), 1e-4)
        assert err(ds.add(as_ds(a), as_ds(b)), a + b) < TOL

    def test_add_cancellation(self, rng):
        a = rand(rng, (1000,), 1e6)
        b = -a + rand(rng, (1000,), 1e-3)
        # representation floor: lo of a ~1e6 ds value bottoms out at
        # ~ulp(ulp(1e6)) ~ 4e-9 absolute, which dominates after the
        # cancellation leaves ~1e-3 values
        assert err(ds.add(as_ds(a), as_ds(b)), a + b) < 1e-7

    def test_mul(self, rng):
        a, b = rand(rng, (1000,), 50.0), rand(rng, (1000,), 0.02)
        assert err(ds.mul(as_ds(a), as_ds(b)), a * b) < TOL

    def test_div(self, rng):
        a = rand(rng, (1000,), 10.0)
        b = rand(rng, (1000,), 5.0)
        b = np.where(np.abs(b) < 0.1, 1.0, b)
        assert err(ds.div(as_ds(a), as_ds(b)), a / b) < TOL

    def test_sqrt(self, rng):
        a = np.abs(rand(rng, (1000,), 100.0)) + 1e-6
        assert err(ds.sqrt(as_ds(a)), np.sqrt(a)) < TOL

    def test_sqrt_zero(self):
        out = ds.sqrt(ds.zeros((4,)))
        np.testing.assert_array_equal(np.asarray(out.hi), 0.0)
        assert np.all(np.isfinite(np.asarray(out.lo)))

    def test_clip_and_compare(self, rng):
        x = rand(rng, (1000,), 2.0)
        lb, ub = np.full(1000, -1.0), np.full(1000, 1.0)
        out = ds.clip(as_ds(x), as_ds(lb), as_ds(ub))
        assert err(out, np.clip(x, lb, ub)) < TOL

    def test_abs(self, rng):
        x = rand(rng, (100,))
        assert err(ds.abs_(as_ds(x)), np.abs(x)) < TOL


class TestDSMatvec:
    def test_matvec_vs_f64(self, rng):
        n, b = 60, 8
        F = rand(rng, (n, n, b), 1.0)
        v = rand(rng, (n, b), 100.0)
        ref = np.einsum("jib,jb->ib", F, v)
        out = ds.matvec(as_ds(F), as_ds(v))
        assert err(out, ref) < 1e-11

    def test_matvec_accumulation_precision(self, rng):
        # f32 would lose ~1e-6 relative here; ds must hold ~1e-12
        n = 98
        F = rand(rng, (n, n, 4), 1.0)
        v = rand(rng, (n, 4), 400.0)
        ref = np.einsum("jib,jb->ib", F, v)
        out = ds.matvec(as_ds(F), as_ds(v))
        f32 = np.einsum(
            "jib,jb->ib",
            F.astype(np.float32),
            v.astype(np.float32),
            dtype=np.float32,
        ).astype(np.float64)
        ds_err = np.max(np.abs(np.asarray(ds.to_f64(out)) - ref))
        f32_err = np.max(np.abs(f32 - ref))
        assert ds_err < 1e-9
        assert ds_err < f32_err * 1e-4  # orders better than f32
