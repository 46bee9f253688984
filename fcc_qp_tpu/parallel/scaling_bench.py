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
        results.append(
            {
                "devices": n,
                "batch": B,
                "time_s": t,
                "solves_per_s": B / t,
                "n_solved": int(summary.n_solved),
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


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=512)
    p.add_argument("--model", default="cassie",
                   choices=["cassie", "quadruped", "humanoid"])
    args = p.parse_args(argv)

    from fcc_qp_tpu.core.ds_engine import to_ds_batch
    from fcc_qp_tpu.models.osc import MODELS, generate_osc_batch
    from fcc_qp_tpu.utils.io import stack_qp_dicts

    model = MODELS[args.model]
    n_dev = len(jax.devices())
    B = args.per_device_batch * n_dev
    qps = generate_osc_batch(model, B, seed=0)
    qp_ds = to_ds_batch(stack_qp_dicts(qps))
    # flagship (bench.py) configuration — rho tuned for the equilibrated
    # Cassie log; retry rounds give ~100% polish acceptance
    opts = FCCQPOptions(
        max_iter=2000, rho=0.05, eps_fcone=1e-6, eps_bound=1e-6,
        scaling=True, splitting="constrained", presolve="operator",
        polish=True, polish_rounds=4, polish_newton_steps=6,
    )
    report = run_scaling_bench(model.shape, qp_ds, opts)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
