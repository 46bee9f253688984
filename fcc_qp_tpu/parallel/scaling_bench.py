"""Host/device-count scaling-efficiency reporter (BASELINE north star:
>=80% scaling efficiency 1 -> N hosts).

Weak-scaling measurement: a fixed per-device batch is solved on
1, 2, 4, ... device submeshes of the current backend; the reported
efficiency at N devices is

    eff(N) = throughput(N) / (N * throughput(1))

Because the per-instance ADMM is embarrassingly parallel and the only
collectives are the O(1) telemetry reductions (`parallel/sharded.py`),
efficiency on real TPU meshes is limited only by dispatch overheads and
those reductions. NOTE: on the CPU test fixture (8 *virtual* devices
multiplexed over the host's physical cores) wall-clock efficiency is
bounded by cores/devices, not by the sharding design — run on real
hardware for meaningful numbers.

Run directly for a JSON report:
    python -m fcc_qp_tpu.parallel.scaling_bench --per-device-batch 512
"""

from __future__ import annotations

import json
import time
from typing import Sequence

import jax
import numpy as np

from fcc_qp_tpu.config import FCCQPOptions, ProblemShape
from fcc_qp_tpu.parallel.mesh import make_mesh
from fcc_qp_tpu.parallel.sharded import solve_batched_ds_sharded


def _device_counts(n_devices: int) -> tuple:
    counts, c = [], 1
    while c <= n_devices:
        counts.append(c)
        c *= 2
    if counts[-1] != n_devices:
        counts.append(n_devices)
    return tuple(counts)


def run_scaling_bench(
    shape: ProblemShape,
    qp_ds,
    opts: FCCQPOptions,
    device_counts: Sequence[int] | None = None,
    repeats: int = 3,
) -> dict:
    """Weak-scaling sweep over submeshes.

    ``qp_ds``: a batch-last `QPBatchDS` with batch >= per-device work x
    max(device_counts); each submesh run slices a proportional batch so
    per-device work stays constant.
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = _device_counts(len(devices))
    B_total = qp_ds.batch
    n_max = max(device_counts)
    per_dev = B_total // n_max
    assert per_dev > 0, "batch smaller than the largest device count"

    results = []
    for n in device_counts:
        mesh = make_mesh(devices[:n])
        B = per_dev * n
        sub = jax.tree.map(lambda a: a[..., :B], qp_ds)
        # warmup (compile) then timed repeats
        sol, _, _ = solve_batched_ds_sharded(sub, shape, opts, mesh=mesh)
        jax.block_until_ready(sol.z)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            sol, _, summary = solve_batched_ds_sharded(
                sub, shape, opts, mesh=mesh
            )
            jax.block_until_ready(sol.z)
            times.append(time.perf_counter() - t0)
        t = float(np.min(times))
        n_solved = int(summary.n_solved)
        # self-check: the sweep is a THROUGHPUT benchmark of the
        # flagship engine, whose demonstrated behavior on these
        # domain-randomized batches is 100% convergence at 1e-6
        # (BENCH_models artifacts). A sweep that records partial
        # convergence is measuring a broken config, not scaling —
        # fail loudly instead of committing a misleading artifact
        # (round-4's SCALING_r04.json recorded a stale 35%).
        if n_solved != B:
            raise AssertionError(
                f"scaling sweep at {n} device(s): only {n_solved}/{B} "
                "instances converged — fix the solver config before "
                "recording scaling numbers"
            )
        results.append(
            {
                "devices": n,
                "batch": B,
                "time_s": t,
                "solves_per_s": B / t,
                "n_solved": n_solved,
            }
        )

    base = results[0]["solves_per_s"]
    for r in results:
        r["efficiency_pct"] = 100.0 * r["solves_per_s"] / (r["devices"] * base)
    return {
        "mode": "weak_scaling",
        "platform": jax.devices()[0].platform,
        "per_device_batch": per_dev,
        "results": results,
    }


def run_overhead_probe(
    shape: ProblemShape, qp_ds, opts: FCCQPOptions, repeats: int = 5
) -> dict:
    """Measure what sharding ADDS on one real device: the sharded entry
    point's extra cost over the plain batched solve is exactly the
    dispatch/padding/`BatchSummary`-reduction overhead that multi-chip
    scaling pays per step (the psum-family collectives of SURVEY §5.8).
    On a real TPU this shows the overhead is O(ms) against an O(100ms)
    solve — the quantitative basis for the >=80% 1->N efficiency claim
    that virtual CPU meshes (devices multiplexed over shared cores)
    cannot demonstrate.
    """
    from fcc_qp_tpu.core.ds_engine import solve_batched_ds

    B = qp_ds.batch
    mesh = make_mesh(jax.devices()[:1])

    def timed(fn):
        out = fn()                      # compile + warm
        jax.block_until_ready(out)
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts)), out

    t_plain, sol_plain = timed(
        lambda: solve_batched_ds(qp_ds, shape, opts)[0].z
    )
    t_sharded, _ = timed(
        lambda: solve_batched_ds_sharded(qp_ds, shape, opts, mesh=mesh)[0].z
    )

    # the telemetry reduction alone (becomes psum/pmax cross-chip)
    from fcc_qp_tpu.parallel.sharded import summarize

    sol_full, _ = solve_batched_ds(qp_ds, shape, opts)
    sum_jit = jax.jit(summarize)
    t_summary, _ = timed(lambda: sum_jit(sol_full))

    return {
        "mode": "single_device_overhead",
        "platform": jax.devices()[0].platform,
        "batch": B,
        "plain_solve_s": t_plain,
        "sharded_entry_s": t_sharded,
        "sharding_overhead_s": t_sharded - t_plain,
        "sharding_overhead_pct": 100.0 * (t_sharded - t_plain) / t_plain,
        "summary_reduction_s": t_summary,
        "summary_reduction_pct_of_solve": 100.0 * t_summary / t_plain,
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=512)
    p.add_argument("--model", default="cassie",
                   choices=["cassie", "quadruped", "humanoid"])
    p.add_argument("--overhead", action="store_true",
                   help="run the single-device sharding-overhead probe "
                        "instead of the submesh sweep (meaningful on "
                        "real TPU hardware)")
    args = p.parse_args(argv)

    from fcc_qp_tpu.core.ds_engine import to_ds_batch
    from fcc_qp_tpu.models.osc import MODELS, generate_osc_batch
    from fcc_qp_tpu.utils.io import stack_qp_dicts

    model = MODELS[args.model]
    n_dev = 1 if args.overhead else len(jax.devices())
    B = args.per_device_batch * n_dev
    qps = generate_osc_batch(model, B, seed=0)
    qp_ds = to_ds_batch(stack_qp_dicts(qps))
    # flagship configuration — EXACTLY bench.py's defaults so the
    # recorded artifact is reproducible verbatim from committed flags
    opts = FCCQPOptions(
        max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
        adaptive_rho=False, adaptive_rho_interval=100,
        adaptive_rho_max_adaptations=1, presolve="operator",
        scaling=True, splitting="constrained", kkt_refine_steps=1,
        polish=True, polish_rounds=4, polish_newton_steps=4,
    )
    if args.overhead:
        report = run_overhead_probe(model.shape, qp_ds, opts)
    else:
        report = run_scaling_bench(model.shape, qp_ds, opts)
    report["opts"] = (
        "max_iter=3000 rho=0.05 eps=1e-6 scaling splitting=constrained "
        "presolve=operator kkt_refine_steps=1 polish rounds=4 "
        "newton_steps=4 (bench.py defaults)"
    )
    report["model"] = args.model
    print(json.dumps(report))


if __name__ == "__main__":
    main()
