from fcc_qp_tpu.ops.projections import (
    calc_bound_violation,
    calc_friction_cone_violation,
    project_to_bounds,
    project_to_friction_cone,
    validate_bounds,
)

__all__ = [
    "calc_bound_violation",
    "calc_friction_cone_violation",
    "project_to_bounds",
    "project_to_friction_cone",
    "validate_bounds",
]
