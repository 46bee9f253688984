"""Raw matmul roofline on the attached chip: batched (B,n,n) at each
precision + a big square matmul for peak reference."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fccqp_xla_cache")
from fcc_qp_tpu.utils.timing import sync

print("device:", jax.devices()[0])
rng = np.random.default_rng(0)


def bench(name, fn, flops, reps=5):
    out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name:44s} {t*1e3:8.2f} ms  {flops/t/1e12:7.2f} TF/s")


for n in (98, 102, 128):
    A = jnp.asarray(rng.normal(size=(4096, n, n)), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(4096, n, n)), jnp.float32)
    fl = 2 * 4096 * n**3
    for prec in ("default", "high", "highest"):
        f = jax.jit(lambda a, b, p=prec: jnp.matmul(a, b, precision=p).sum())
        bench(f"batched (4096,{n},{n}) {prec}", lambda f=f: f(A, Bm), fl)

# chained: 8 matmuls in one program (amortize dispatch)
A = jnp.asarray(rng.normal(size=(4096, 98, 98)), jnp.float32)


def chain(a):
    x = a
    for _ in range(8):
        x = jnp.matmul(a, x, precision="highest")
        x = x / jnp.max(jnp.abs(x))
    return x.sum()


bench("chain of 8 (4096,98,98) highest", lambda: jax.jit(chain)(A),
      8 * 2 * 4096 * 98**3)

M = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.float32)
sq = jax.jit(lambda m: jnp.matmul(m, m).sum())
bench("square 4096^2 default", lambda: sq(M), 2 * 4096**3)
sqh = jax.jit(lambda m: jnp.matmul(m, m, precision="highest").sum())
bench("square 4096^2 highest", lambda: sqh(M), 2 * 4096**3)
