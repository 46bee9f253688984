"""Sharded batched solving and cross-shard telemetry.

`solve_batched_sharded` is the pod-scale entry point: QP batches live
sharded over the mesh's "batch" axis, the jitted vmapped solver runs
SPMD on every chip, and the small `BatchSummary` reduction (max/mean over
the global batch) is the only cross-chip communication — XLA lowers it
to `psum`-family collectives over ICI/DCN automatically from the
sharding annotations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fcc_qp_tpu.config import FCCQPOptions, ProblemShape
from fcc_qp_tpu.core.solver import solve
from fcc_qp_tpu.parallel.mesh import (
    BATCH_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch,
    shard_batch_tree,
)
from fcc_qp_tpu.types import FCCQPSolution, QPBatch, WarmStart


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class BatchSummary:
    """Global (cross-shard) aggregates of a batched solve — the
    batch-level analog of `FCCQPDetails` (SURVEY §5.5)."""

    n_solved: jnp.ndarray        # count with kSuccess status
    n_instances: jnp.ndarray
    max_residual_bounds: jnp.ndarray
    max_residual_fcone: jnp.ndarray
    mean_iterations: jnp.ndarray
    max_iterations: jnp.ndarray
    max_bounds_viol: jnp.ndarray
    max_fcone_viol: jnp.ndarray


def summarize(sol: FCCQPSolution) -> BatchSummary:
    """Reduce per-instance details to global aggregates. Under a sharded
    jit these reductions become the psum/pmax collectives of SURVEY §5.8."""
    d = sol.details
    return BatchSummary(
        n_solved=jnp.sum(d.solve_status == 0),
        n_instances=jnp.asarray(d.solve_status.size, jnp.int32),
        max_residual_bounds=jnp.max(d.admm_residual_bounds),
        max_residual_fcone=jnp.max(d.admm_residual_friction_cone),
        mean_iterations=jnp.mean(d.n_iter.astype(jnp.float32)),
        max_iterations=jnp.max(d.n_iter),
        max_bounds_viol=jnp.max(d.bounds_viol),
        max_fcone_viol=jnp.max(d.friction_cone_viol),
    )


@partial(
    jax.jit, static_argnames=("shape", "opts", "warm_start", "with_summary")
)
def _sharded_solve_jit(qp, warm, shape, opts, warm_start, with_summary):
    fn = partial(solve, shape=shape, opts=opts, warm_start=warm_start)
    sol, ws = jax.vmap(lambda q, w: fn(q, warm=w))(qp, warm)
    summary = summarize(sol) if with_summary else None
    return sol, ws, summary


def solve_batched_sharded(
    qp: QPBatch,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    warm: Optional[WarmStart] = None,
    warm_start: bool = False,
    mesh: Optional[Mesh] = None,
    with_summary: bool = True,
):
    """Solve a QP batch sharded across all devices of a mesh.

    Pads the batch to a multiple of the mesh size, shards the leading
    axis, and runs one SPMD program. Returns (solution, warm, summary)
    with solution/warm sharded the same way (padding stripped).
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    qp, b = pad_batch(qp, n_dev)
    if warm is None:
        warm = WarmStart.zeros(
            shape, batch_shape=(qp.b.shape[0],), dtype=qp.Q.dtype
        )
    else:
        warm, _ = pad_batch(warm, n_dev)

    qp = shard_batch_tree(qp, mesh)
    warm = shard_batch_tree(warm, mesh)

    sol, ws, summary = _sharded_solve_jit(
        qp, warm, shape, opts, warm_start, with_summary
    )
    unpad = lambda a: a[:b]
    sol = jax.tree.map(unpad, sol)
    ws = jax.tree.map(unpad, ws)
    return sol, ws, summary


def replay_sharded(
    qps: QPBatch,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    mesh: Optional[Mesh] = None,
):
    """Batch-of-sequences replay: axes (B, T, ...) with B sharded over
    the mesh and T scanned with warm starting — the MPC-scenario-tree /
    multi-log configuration (BASELINE config 5)."""
    from fcc_qp_tpu.core.solver import replay as _replay

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    qps, b = pad_batch(qps, n_dev)
    qps = shard_batch_tree(qps, mesh)

    @partial(jax.jit, static_argnames=("shape", "opts"))
    def run(qps, shape, opts):
        # vmap over scenario axis; scan over time inside.
        sols, ws = jax.vmap(lambda q: _replay(q, shape, opts))(qps)
        return sols, ws, summarize(sols)

    sols, ws, summary = run(qps, shape, opts)
    unpad = lambda a: a[:b]
    return (
        jax.tree.map(unpad, sols),
        jax.tree.map(unpad, ws),
        summary,
    )


def shard_batch_last_tree(tree, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Shard the TRAILING axis of every leaf (the ds engine's batch-last
    layout) across the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    def place(a):
        spec = PartitionSpec(*([None] * (a.ndim - 1) + [axis_name]))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def solve_batched_ds_sharded(
    qp,
    shape: ProblemShape,
    opts: FCCQPOptions = FCCQPOptions(),
    warm=None,
    warm_start: bool = False,
    mesh: Optional[Mesh] = None,
    use_pallas: bool = False,
):
    """Sharded ds-precision batched solve: the pod-scale performance
    path. Uneven batches are auto-padded (replicated last instance) up
    to the mesh size — and to the 128-lane Pallas tile when
    ``use_pallas`` — then stripped on return.

    Returns (solution, warm, summary) like `solve_batched_sharded`;
    the summary is computed AFTER stripping so padding never pollutes
    the aggregates.
    """
    import math

    from fcc_qp_tpu.core.ds_engine import (
        _unpad_solution,
        pad_batch_last,
        solve_batched_ds,
    )

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    mult = (
        n_dev * 128 // math.gcd(n_dev, 128) if use_pallas else n_dev
    )
    qp, b0 = pad_batch_last(qp, mult)
    if warm is not None:
        warm, _ = pad_batch_last(warm, mult)

    qp = shard_batch_last_tree(qp, mesh)
    if warm is not None:
        warm = shard_batch_last_tree(warm, mesh)

    sol, ws = solve_batched_ds(
        qp, shape, opts, warm=warm, warm_start=warm_start,
        use_pallas=use_pallas,
    )
    sol, ws = _unpad_solution(sol, ws, b0)
    return sol, ws, summarize(sol)
