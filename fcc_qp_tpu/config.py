"""Static configuration: solver options and problem shape.

Parity: `FCCQPOptions` mirrors the reference struct and defaults
(`/root/reference/src/fcc_qp.hpp:30-35`); `ProblemShape` mirrors the
constructor arguments (`fcc_qp.hpp:57-73`).

`max_iter` is a static Python int (it bounds the `lax.while_loop`);
`rho` / `eps_*` are passed into jitted code as traced scalars so they can
be changed (or adapted per-instance) without retracing.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class FCCQPOptions:
    """Solver options.

    The first four fields and their defaults match the reference struct
    (`src/fcc_qp.hpp:30-35`). The remaining fields are acceleration
    features this framework adds (all default-off/neutral, so default
    behavior is reference-exact):

    * ``alpha``: ADMM over-relaxation in (0, 2); 1.0 = reference.
    * ``adaptive_rho``: OSQP-style penalty adaptation (the feature the
      paper notes FCCQP lacks vs OSQP, `fccqp.pdf` Table 2). Requires
      the batch-level engine (`core.batched.solve_batched_fast`).
    * ``adaptive_rho_interval``: iterations between adaptation checks.
    * ``adaptive_rho_tolerance``: adapt when the sqrt primal/dual
      residual ratio leaves ``[1/tol, tol]``.
    * ``adaptive_rho_max_adaptations``: cap on refactorizations (each
      costs a full batched factorization).
    * ``rho_min`` / ``rho_max``: clamp for adapted rho.
    * ``presolve``: "exact" solves the unregularized equality-QP for
      the cold-start initial guess (reference behavior,
      `fcc_qp.cpp:159-178`); "operator" reuses the rho-regularized
      ADMM operator (x_const) as the guess — one factorization fewer
      per cold solve at the cost of a slightly longer ADMM trajectory.
      The equality-constrained fast path always uses the exact solve.
    * ``scaling``: cone-aware Ruiz equilibration (`ops/scaling.py`).
      Convergence tolerances remain in unscaled units. ds engine only.
    * ``scaling_iters``: Ruiz sweeps.
    * ``splitting``: "full" applies the ADMM splitting (and rho) to
      every coordinate, as the reference does (`fcc_qp.cpp:62-64`);
      "constrained" restricts it to finitely-bounded + cone
      coordinates, shrinking the hot-loop operator from n x n to
      k x k (k=22 vs n=60 for Cassie) with the identical fixed point.
      ds engine only.
    * ``kkt_refine_steps``: Newton-Schulz refinement steps on the ds
      KKT inverse (0 disables; with scaling on, the equilibrated KKT
      usually doesn't need refinement). The hybrid factorization runs
      ``kkt_refine_steps + 1`` thin refinement passes.
    * ``phase1_tol``: two-phase iteration switch tolerance (unscaled
      units). When > max(eps_bound, eps_fcone), the reduced engine runs
      plain-f32 iterations (~4x cheaper) until both residuals cross
      this value, then finishes in double-single. 0 disables.
    * ``kkt_factor``: "hybrid" (reduced path default) seeds the KKT
      inverse with batched f32 XLA Cholesky/matmuls (MXU) and refines
      only the blocks the ADMM loop needs in ds; "ds" runs the full
      double-single Schur factorization (latency-bound fori loops).
    * ``polish``: OSQP-style active-set polishing (`ops/polish.py`) —
      the acceleration the paper credits OSQP with (`fccqp.pdf` Table
      2). Runs the ADMM only to ``polish_tol`` (coarse, f32 phase),
      identifies the active set from the slack/dual state, and solves
      the reduced equality-KKT with `polish_newton_steps` Newton steps
      (cone-surface constraints are linearized and re-linearized).
      Acceptance is self-validating per instance: the polished point
      and reconstructed duals must pass the SAME projection-consistency
      residual test at full eps; rejected instances fall back to the
      plain ADMM endgame. Typically removes the O(100)-iteration linear
      ADMM tail between 1e-2 and 1e-6. Reduced ds path only.
    * ``polish_tol``: coarse ADMM tolerance (unscaled units) at which
      the active set is read off and polishing is attempted.
    * ``polish_act_tol``: active-set classification proximity (unscaled
      units): a coordinate counts as active when its projected slack
      sits within this distance of its bound / cone surface.
    * ``polish_newton_steps``: Newton re-linearization steps for
      cone-surface constraints (1 is exact for purely linear active
      sets; 2 recovers quadratic accuracy through the curved cone).
    * ``polish_rounds``: total active-set polish attempts per solve.
      After a rejected attempt (misclassified active set at the coarse
      point) the solver runs up to ``polish_interval`` further f32
      ADMM iterations at a tighter tolerance, then retries the polish
      with a Newton-Schulz-refreshed inverse seed. Rounds are
      `lax.cond`-skipped once every instance is accepted, so extra
      rounds are ~free on easy (fully warm) batches while removing the
      straggler tail — the batch otherwise pays max-over-batch
      iterations in the endgame while_loop.
    * ``polish_interval``: f32 ADMM iterations between polish retries.
    """

    max_iter: int = 1000
    rho: float = 1e-6
    eps_fcone: float = 1e-3
    eps_bound: float = 1e-6
    alpha: float = 1.0
    adaptive_rho: bool = False
    adaptive_rho_interval: int = 25
    adaptive_rho_tolerance: float = 2.0
    adaptive_rho_max_adaptations: int = 8
    rho_min: float = 1e-6
    rho_max: float = 1e6
    presolve: str = "exact"  # "exact" (reference parity) | "operator"
    scaling: bool = False
    scaling_iters: int = 8
    splitting: str = "full"  # "full" (reference parity) | "constrained"
    kkt_refine_steps: int = 1
    kkt_factor: str = "hybrid"  # "hybrid" (f32 seed + thin ds refine) | "ds"
    phase1_tol: float = 0.0
    polish: bool = False
    polish_tol: float = 1e-2
    polish_act_tol: float = 1e-3
    polish_newton_steps: int = 4
    polish_rounds: int = 1
    polish_interval: int = 64
    # Defer the ds-exact operator build until after the polish (hybrid
    # factorization + polish only; see `core.ds_engine._lazy_exact`).
    # False forces the exact operator from the start — mainly a
    # diagnostic/ablation knob.
    lazy_exact: bool = True

    def __post_init__(self):
        if self.max_iter <= 0:
            raise ValueError("max_iter must be > 0")
        if self.rho <= 0:
            raise ValueError("rho must be > 0")
        if not (0.0 < self.alpha < 2.0):
            raise ValueError("alpha must be in (0, 2)")
        if self.adaptive_rho_interval <= 0:
            raise ValueError("adaptive_rho_interval must be > 0")
        if self.adaptive_rho_tolerance < 1.0:
            raise ValueError("adaptive_rho_tolerance must be >= 1")
        if self.presolve not in ("exact", "operator"):
            raise ValueError("presolve must be 'exact' or 'operator'")
        if self.splitting not in ("full", "constrained"):
            raise ValueError("splitting must be 'full' or 'constrained'")
        if self.scaling_iters <= 0:
            raise ValueError("scaling_iters must be > 0")
        if self.kkt_refine_steps < 0:
            raise ValueError("kkt_refine_steps must be >= 0")
        if self.kkt_factor not in ("hybrid", "ds"):
            raise ValueError("kkt_factor must be 'hybrid' or 'ds'")
        if self.phase1_tol < 0:
            raise ValueError("phase1_tol must be >= 0")
        if self.polish_tol <= 0 or self.polish_act_tol <= 0:
            raise ValueError("polish tolerances must be > 0")
        if self.polish_newton_steps < 1:
            raise ValueError("polish_newton_steps must be >= 1")
        if self.polish_rounds < 1:
            raise ValueError("polish_rounds must be >= 1")
        if self.polish_interval < 1:
            raise ValueError("polish_interval must be >= 1")

    def replace(self, **kw) -> "FCCQPOptions":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ProblemShape:
    """Fixed problem shape — the analog of the reference constructor
    (`src/fcc_qp.cpp:24-55`): all shapes are static so every solve jits to
    a fixed-shape program with zero allocation in the hot path.

    Attributes:
      num_vars: total decision variables (n).
      num_eq: rows of A_eq (m).
      nc: number of contact-force variables; multiple of 3.
      lambda_c_start: index of the first contact-force variable; the
        contact forces are the contiguous segment
        ``x[lambda_c_start : lambda_c_start + nc]``.
    """

    num_vars: int
    num_eq: int
    nc: int
    lambda_c_start: int

    def __post_init__(self):
        if self.num_vars < 0 or self.num_eq < 0 or self.nc < 0:
            raise ValueError("dimensions must be non-negative")
        if self.nc % 3 != 0:
            raise ValueError("nc must be a multiple of 3")
        if self.lambda_c_start + self.nc > self.num_vars:
            raise ValueError("contact segment exceeds num_vars")

    @property
    def n_cones(self) -> int:
        return self.nc // 3

    @property
    def kkt_dim(self) -> int:
        return self.num_vars + self.num_eq


# Canonical robot shapes (see fcc_qp_tpu.models.osc for the generators).
CASSIE_SHAPE = ProblemShape(num_vars=60, num_eq=38, nc=12, lambda_c_start=38)
