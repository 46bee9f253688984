"""fcc_qp_tpu — a TPU-native batched ADMM solver framework for
friction-cone-constrained whole-body-control QPs.

Problem class (reference `/root/reference/src/fcc_qp.hpp:43-53`):

    minimize     (1/2) x'Qx + b'x
    subject to   A_eq x = b_eq
                 lb <= x <= ub
                 lambda_c in F   (second-order friction cones)

where ``lambda_c = x[lambda_c_start : lambda_c_start + nc]`` stacks 3-D
contact forces.

Design: a pure-functional solver over fixed-shape pytrees — `vmap` for
batching, `lax.scan` for warm-started replay, `NamedSharding` over a mesh
for multi-chip scale, and Pallas kernels on the hot path.
"""

from fcc_qp_tpu.config import FCCQPOptions, ProblemShape
from fcc_qp_tpu.types import (
    FCCQPDetails,
    FCCQPSolution,
    FCCQPSolveStatus,
    QPBatch,
    WarmStart,
)
from fcc_qp_tpu.core.solver import (
    solve,
    solve_batched,
    replay,
)
from fcc_qp_tpu.core.batched import solve_batched_fast
from fcc_qp_tpu.core.api import FCCQP
from fcc_qp_tpu.core.serving import FCCQPServer

__version__ = "0.1.0"

__all__ = [
    "FCCQP",
    "FCCQPServer",
    "FCCQPDetails",
    "FCCQPOptions",
    "FCCQPSolution",
    "FCCQPSolveStatus",
    "ProblemShape",
    "QPBatch",
    "WarmStart",
    "replay",
    "solve",
    "solve_batched",
    "solve_batched_fast",
]
