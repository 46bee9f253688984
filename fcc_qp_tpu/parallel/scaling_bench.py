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
import os
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
    import jax.numpy as jnp

    from fcc_qp_tpu.core.ds_engine import solve_batched_ds
    from fcc_qp_tpu.parallel.sharded import (
        shard_batch_last_tree,
        summarize,
    )

    B = qp_ds.batch
    mesh = make_mesh(jax.devices()[:1])

    from fcc_qp_tpu.utils.timing import sync

    def timed(fn):
        # TRUE barrier via output fetch (`utils.timing.sync`):
        # jax.block_until_ready can no-op on remote-attached runtimes.
        # Every fn returns a SCALAR so the fetch costs one round trip,
        # identical across measurements (subtracted via t_floor).
        out = fn()                      # compile + warm
        sync(out)
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts)), out

    # per-dispatch+fetch floor of this attachment (remote tunnels:
    # ~25-50 ms) — what a trivial program costs end to end
    tiny = jax.jit(lambda x: x + 1.0)
    t_floor, _ = timed(lambda: tiny(jnp.float32(0.0)))

    t_plain, _ = timed(
        lambda: solve_batched_ds(qp_ds, shape, opts)[0].z.sum()
    )
    # solve on an ALREADY-placed sharded batch: the pure SPMD-partition
    # cost of the compiled program (what every steady-state step pays)
    qp_placed = shard_batch_last_tree(qp_ds, mesh)
    t_spmd, _ = timed(
        lambda: solve_batched_ds(qp_placed, shape, opts)[0].z.sum()
    )
    # full entry point incl. padding + device_put placement: the
    # ONE-TIME data-loading cost a pipeline pays when the batch is not
    # already resident/sharded
    t_entry, _ = timed(
        lambda: solve_batched_ds_sharded(
            qp_ds, shape, opts, mesh=mesh
        )[0].z.sum()
    )

    # telemetry reduction (the psum/pmax collectives of SURVEY §5.8):
    # dispatch-floor-subtracted single call
    sol_full, _ = solve_batched_ds(qp_ds, shape, opts)
    sum_jit = jax.jit(lambda d: summarize(d).max_residual_bounds)
    t_sum_raw, _ = timed(lambda: sum_jit(sol_full))
    t_summary = max(t_sum_raw - t_floor, 0.0)

    return {
        "mode": "single_device_overhead",
        "platform": jax.devices()[0].platform,
        "batch": B,
        "dispatch_floor_s": t_floor,
        "plain_solve_s": t_plain,
        "spmd_solve_s": t_spmd,
        "spmd_overhead_s": t_spmd - t_plain,
        "spmd_overhead_pct": 100.0 * (t_spmd - t_plain) / t_plain,
        "entry_with_placement_s": t_entry,
        "placement_cost_s": t_entry - t_spmd,
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
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (virtual-device mesh; "
                        "env vars alone cannot override a site-forced "
                        "TPU platform — this calls jax.config.update "
                        "before any backend is initialized)")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # ds correctness on CPU requires contraction-free codegen (see
        # tests/conftest.py); also use an ISA-dedicated cache dir — the
        # persistent cache does NOT key on the ISA flag, and loading an
        # FMA-ISA executable into a no-FMA run (or vice versa) silently
        # corrupts ds arithmetic (observed r5: one poisoned entry made
        # 1/1024 instances stall at 3e-6)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_cpu_max_isa" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_cpu_max_isa=SSE4_2"
            ).strip()
        cache_default = "/tmp/fccqp_xla_cache_sse42"
    else:
        cache_default = "/tmp/fccqp_xla_cache"
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("FCCQP_XLA_CACHE", cache_default),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from fcc_qp_tpu.core.ds_engine import to_ds_batch
    from fcc_qp_tpu.models.osc import MODELS, generate_osc_sequence
    from fcc_qp_tpu.utils.io import stack_qp_dicts

    model = MODELS[args.model]
    n_dev = 1 if args.overhead else len(jax.devices())
    B = args.per_device_batch * n_dev
    # the WALKING-LOG workload, exactly as bench.py's cold batch (the
    # reference's replay data distribution, fcc_qp_test.py:22-31): the
    # scaling question is "does the bench throughput scale", so the
    # sweep measures the bench's own workload with the bench's own
    # flags. (Domain-randomized `generate_osc_batch` sets are
    # deliberately wider-scatter than any real log; they leave a few
    # per-mille of fixed-rho stragglers and belong to robustness
    # testing, not throughput benchmarking.)
    qps = generate_osc_sequence(model, B, seed=0, smoothness=0.002)
    qp_ds = to_ds_batch(stack_qp_dicts(qps))
    opts = FCCQPOptions(
        max_iter=3000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
        adaptive_rho=False, adaptive_rho_interval=100,
        adaptive_rho_max_adaptations=1, presolve="operator",
        scaling=True, splitting="constrained", kkt_refine_steps=1,
        polish=True, polish_rounds=4,
        polish_newton_steps=model.polish_newton_steps,
    )
    if args.overhead:
        report = run_overhead_probe(model.shape, qp_ds, opts)
    else:
        report = run_scaling_bench(model.shape, qp_ds, opts)
    report["opts"] = (
        "walking-log workload (smoothness=0.002, seed=0); max_iter=3000 "
        "rho=0.05 eps=1e-6 scaling splitting=constrained "
        "presolve=operator kkt_refine_steps=1 polish rounds=4 "
        f"newton_steps={model.polish_newton_steps} (bench.py defaults)"
    )
    report["model"] = args.model
    print(json.dumps(report))


if __name__ == "__main__":
    main()
