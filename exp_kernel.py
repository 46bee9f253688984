"""Microbenchmark: per-iteration cost of the fused Pallas ADMM chunks."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fcc_qp_tpu.config import ProblemShape
from fcc_qp_tpu.ops.ds import DS
from fcc_qp_tpu.ops.pallas_admm import admm_chunk_pallas, admm_chunk_pallas32
from fcc_qp_tpu.utils.timing import sync

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
k, nc = 34, 12          # reduced Cassie: kb=22 box + 12 cone
kb = k - nc
shape = ProblemShape(num_vars=k, num_eq=0, nc=nc, lambda_c_start=kb)
rng = np.random.default_rng(0)
f32 = jnp.float32

Fj = jnp.asarray(rng.normal(size=(k, k, B)) * 0.01, f32)
xc = jnp.asarray(rng.normal(size=(k, B)), f32)
lb = jnp.concatenate([jnp.full((kb, B), -1.0), jnp.full((nc, B), -jnp.inf)])
ub = jnp.concatenate([jnp.full((kb, B), 1.0), jnp.full((nc, B), jnp.inf)])
mu_f = jnp.full((nc // 3, B), 0.8, f32)
rho = jnp.full((B,), 0.05, f32)
x = jnp.zeros((k, B), f32)
done = jnp.zeros((B,), bool)
n_iter = jnp.full((B,), 10_000, jnp.int32)
itv = jnp.zeros((B,), jnp.int32)

for K in (256, 1024, 4096):
    # f32 kernel — eps=0 so no tile exits early; all K iterations run
    args32 = (Fj, xc, lb, ub, mu_f, rho, jnp.float32(0), jnp.float32(0),
              x, x, x[kb:], x, x[kb:], x, done, n_iter, itv)
    out = admm_chunk_pallas32(*args32, shape=shape, K=K, max_iter=10_000)
    sync(out)
    t0 = time.perf_counter(); out = admm_chunk_pallas32(*args32, shape=shape, K=K, max_iter=10_000); sync(out)
    t32 = time.perf_counter() - t0
    # ds kernel
    z = DS(x, jnp.zeros_like(x))
    zc = DS(x[kb:], jnp.zeros_like(x[kb:]))
    argsds = (DS(Fj, jnp.zeros_like(Fj)), DS(xc, jnp.zeros_like(xc)),
              DS(lb, jnp.zeros_like(lb)), DS(ub, jnp.zeros_like(ub)),
              DS(mu_f, jnp.zeros_like(mu_f)), rho,
              jnp.float32(0), jnp.float32(0),
              z, z, zc, z, zc, z, done, n_iter, itv)
    out = admm_chunk_pallas(*argsds, shape=shape, K=K, max_iter=10_000)
    sync(out)
    t0 = time.perf_counter(); out = admm_chunk_pallas(*argsds, shape=shape, K=K, max_iter=10_000); sync(out)
    tds = time.perf_counter() - t0
    print(f"B={B} K={K}: f32 {t32*1e6/K:.1f}us/iter  ds {tds*1e6/K:.1f}us/iter "
          f"(chunk f32 {t32*1e3:.1f}ms ds {tds*1e3:.1f}ms)", flush=True)
