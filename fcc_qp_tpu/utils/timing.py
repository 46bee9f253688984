"""Reliable device synchronization and timing.

`jax.block_until_ready` can return before execution completes on
remote-attached TPU runtimes (async dispatch through a relay), which
silently fakes wall-clock timings. `sync` forces completion by fetching
a (small) output buffer to the host: an executable's outputs only
materialize when the whole program has run, so fetching any output leaf
is a true barrier for that computation.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _smallest_leaf(tree):
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "size")]
    if not leaves:
        return None
    return min(leaves, key=lambda l: l.size)


def sync(tree):
    """True barrier: block until the computation producing `tree` has
    finished, by fetching its smallest output leaf to the host."""
    jax.block_until_ready(tree)  # cheap when it does work; harmless when not
    leaf = _smallest_leaf(tree)
    if leaf is not None:
        np.asarray(leaf)
    return tree


def stamp_solution_times(sol, solve_time: float, factor_time: float):
    """Broadcast host-measured per-phase wall times into a solution's
    details (batch-level: every instance in a batched program shares
    the wall clock; parity fields `src/fcc_qp.hpp:22-23`)."""
    import dataclasses

    import jax.numpy as jnp

    like = sol.details.admm_residual_bounds
    det = dataclasses.replace(
        sol.details,
        solve_time=jnp.full_like(like, solve_time),
        factorization_time=jnp.full_like(like, factor_time),
    )
    return type(sol)(details=det, z=sol.z)


def timed(fn, *args, reps: int = 3, **kw):
    """Best-of-N wall time of `fn(*args)` with true synchronization.

    Returns (best_seconds, last_result). The first (compile) call is
    excluded.
    """
    out = sync(fn(*args, **kw))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = sync(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best, out
