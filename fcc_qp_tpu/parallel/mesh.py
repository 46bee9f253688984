"""Device mesh and sharding helpers for batch-parallel QP solving.

The reference is single-thread, single-process (SURVEY §2: no threads,
no MPI). The TPU-native scaling model replacing it: QP instances are
embarrassingly parallel, so the batch axis is sharded over a 1-D named
mesh ("batch") spanning all chips (and hosts, over DCN); XLA partitions
the vmapped solver automatically from `NamedSharding` annotations and
inserts the only collectives needed — small reductions for batch-level
convergence telemetry.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(
    devices: Optional[Sequence] = None, axis_name: str = BATCH_AXIS
) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(tree, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place every array leaf with its leading axis sharded over the mesh.

    Batch size must divide evenly by mesh size for an even layout; uneven
    batches are padded by the caller (see `pad_batch`).
    """
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def pad_batch(tree, multiple: int):
    """Pad the leading axis of every leaf up to a multiple (returns the
    padded tree and the original batch size)."""
    import jax.numpy as jnp

    leaves = jax.tree.leaves(tree)
    b = leaves[0].shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return tree, b
    def _pad(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, mode="edge")
    return jax.tree.map(_pad, tree), b


def init_distributed(**kwargs) -> None:
    """Multi-host initialization (`jax.distributed.initialize`).

    No-op when running single-process; safe to call unconditionally at
    program start on pod slices.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass
