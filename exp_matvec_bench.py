"""Microbench: tree-EFT matvec_ds vs shapes on the current backend,
with an f64 accuracy check."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

cpu = "--cpu" in sys.argv
if cpu:
    import os
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=SSE4_2"
    ).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fccqp_xla_cache")

import fcc_qp_tpu.ops.ds as ds
from fcc_qp_tpu.ops.ds import DS
from fcc_qp_tpu.ops.ds_linalg import matvec_ds
from fcc_qp_tpu.utils.timing import sync

rng = np.random.default_rng(0)
print("device:", jax.devices()[0])


def as_ds(a):
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return DS(jnp.asarray(hi), jnp.asarray(lo))


for (n, m, B) in [(22, 22, 4096), (60, 60, 4096), (98, 98, 4096)]:
    F = rng.normal(size=(n, m, B))
    v = rng.normal(size=(n, B))
    Fd, vd = as_ds(F), as_ds(v)
    f = jax.jit(matvec_ds)
    out = f(Fd, vd)
    sync(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(Fd, vd)
        sync(out)
        ts.append(time.perf_counter() - t0)
    # f64 reference
    ref = np.einsum("jib,jb->ib", F, v)
    got = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
    err = np.max(np.abs(got - ref) / (1.0 + np.abs(ref)))
    print(f"({n},{m},{B}): {min(ts)*1e3:7.2f} ms  rel_err={err:.2e}")
