from fcc_qp_tpu.core.api import FCCQP
from fcc_qp_tpu.core.solver import replay, solve, solve_batched

__all__ = ["FCCQP", "replay", "solve", "solve_batched"]
