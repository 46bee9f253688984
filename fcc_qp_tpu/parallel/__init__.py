from fcc_qp_tpu.parallel.mesh import (
    BATCH_AXIS,
    batch_sharding,
    init_distributed,
    make_mesh,
    pad_batch,
    replicated,
    shard_batch_tree,
)
from fcc_qp_tpu.parallel.sharded import (
    BatchSummary,
    replay_sharded,
    shard_batch_last_tree,
    solve_batched_ds_sharded,
    solve_batched_sharded,
    summarize,
)

__all__ = [
    "BATCH_AXIS",
    "BatchSummary",
    "batch_sharding",
    "init_distributed",
    "make_mesh",
    "pad_batch",
    "replay_sharded",
    "replicated",
    "shard_batch_last_tree",
    "shard_batch_tree",
    "solve_batched_ds_sharded",
    "solve_batched_sharded",
    "summarize",
]
