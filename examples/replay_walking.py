"""Walking-log replay harness with the reference's diagnostic plots.

TPU-native counterpart of the reference benchmark script
(`/root/reference/fcc_qp_test.py:22-95`): loads (or synthesizes) a
Cassie walking log with the reference npz schema, replays it, and
produces the same four diagnostic figures — solution traces sliced as
``vdot = z[:, :22], u = z[:, 22:32], lambda_h = z[:, 32:38],
lambda_c = z[:, 38:]`` (`fcc_qp_test.py:52-56`), solve times, iteration
counts, and constraint violations.

Two replay modes:

* ``--mode loop``   — serial warm-started loop through the drop-in
  `FCCQP` class, one solve per timestep (reference semantics,
  `fcc_qp_test.py:85-89`); reports per-solve latency.
* ``--mode batched`` (default) — the TPU-native path: the whole log as
  one equilibrated, reduced-splitting batched ds solve; reports
  amortized throughput.

Usage:
  python examples/replay_walking.py [--steps 400] [--mode batched]
      [--npz test_data/id_qp_log_walking.npz] [--out replay_plots.png]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--mode", choices=["batched", "loop"], default="batched")
    p.add_argument("--npz", type=str, default=None,
                   help="reference-schema npz log (default: synthesize)")
    p.add_argument("--out", type=str, default="replay_plots.png")
    p.add_argument("--rho", type=float, default=0.05)
    p.add_argument("--eps", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=3000)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fcc_qp_tpu import FCCQP, FCCQPOptions
    from fcc_qp_tpu.models.osc import CASSIE, generate_osc_sequence
    from fcc_qp_tpu.utils.io import load_qp_log_npz, stack_qp_dicts

    if args.npz and os.path.exists(args.npz):
        qps = load_qp_log_npz(args.npz)[: args.steps]
        print(f"loaded {len(qps)} steps from {args.npz}")
    else:
        qps = generate_osc_sequence(CASSIE, args.steps, seed=0)
        print(f"synthesized {len(qps)} Cassie walking steps "
              "(reference log is a missing blob; see SURVEY.md C17)")

    T = len(qps)
    shape = CASSIE.shape

    if args.mode == "loop":
        solver = FCCQP(shape.num_vars, shape.num_eq, shape.nc,
                       shape.lambda_c_start)
        solver.set_options(FCCQPOptions(
            rho=0.3, eps_fcone=args.eps, eps_bound=args.eps,
            max_iter=args.max_iter,
        ))
        zs, times, iters, fviol, bviol = [], [], [], [], []
        for i, qp in enumerate(qps):
            solver.set_warm_start(i > 0)
            solver.Solve(qp["Q"], qp["b"], qp["A_eq"], qp["b_eq"],
                         qp["friction_coeffs"], qp["lb"], qp["ub"])
            r = solver.GetSolution()
            zs.append(np.asarray(r.z))
            times.append(r.details.solve_time)
            iters.append(r.details.n_iter)
            fviol.append(r.details.friction_cone_viol)
            bviol.append(r.details.bounds_viol)
        z = np.stack(zs)
        times = np.asarray(times)
        iters = np.asarray(iters)
    else:
        from fcc_qp_tpu.core.ds_engine import solve_batched_ds, to_ds_batch
        from fcc_qp_tpu.utils.timing import sync

        stacked = stack_qp_dicts(qps)
        batch = jax.device_put(to_ds_batch(stacked))
        opts = FCCQPOptions(
            max_iter=args.max_iter, rho=args.rho,
            eps_fcone=args.eps, eps_bound=args.eps,
            scaling=True, splitting="constrained", presolve="operator",
        )
        use_pallas = (
            jax.devices()[0].platform not in ("cpu",) and T % 128 == 0
        )
        sol, _ = solve_batched_ds(batch, shape, opts, use_pallas=use_pallas)
        sync(sol)
        t0 = time.perf_counter()
        sol, _ = solve_batched_ds(batch, shape, opts, use_pallas=use_pallas)
        sync(sol)
        wall = time.perf_counter() - t0
        z = np.asarray(sol.z, np.float64)
        iters = np.asarray(sol.details.n_iter)
        times = np.full(T, wall / T)
        fviol = np.asarray(sol.details.friction_cone_viol)
        bviol = np.asarray(sol.details.bounds_viol)
        print(f"batched replay: {T / wall:.0f} solves/s "
              f"({wall / T * 1e6:.0f} us/solve amortized)")

    print(f"iters: p50={np.median(iters):.0f} max={np.max(iters)}  "
          f"viol max: cone={np.max(fviol):.2e} bounds={np.max(bviol):.2e}")
    if args.mode == "loop":
        warm_t = times[1:] if len(times) > 1 else times
        print(
            f"per-solve latency: cold={times[0]*1e3:.1f}ms "
            f"warm p50={np.median(warm_t)*1e3:.1f}ms "
            f"min={np.min(warm_t)*1e3:.1f}ms "
            f"(reference ~0.1 ms/solve on the robot CPU, fccqp.pdf "
            f"p.5 Fig. 1; the TPU drop-in single-solve floor is the "
            f"~25-50 ms per-call dispatch+fetch round-trip through "
            f"the remote tunnel — single-QP serving is a CPU "
            f"workload, the TPU wins at batch/stream scale)"
        )

    make_plots(z, times, iters, np.asarray(fviol), np.asarray(bviol),
               args.out)


def make_plots(z, times, iters, fviol, bviol, out):
    """The reference's four diagnostic panels (`fcc_qp_test.py:43-69`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.arange(z.shape[0])
    fig, axes = plt.subplots(3, 2, figsize=(13, 10))

    slices = {
        "vdot": z[:, :22],
        "u": z[:, 22:32],
        "lambda_h": z[:, 32:38],
        "lambda_c": z[:, 38:50],
    }
    for ax, (name, zz) in zip(axes.flat[:4], slices.items()):
        ax.plot(t, zz, lw=0.7)
        ax.set_title(name)
        ax.set_xlabel("timestep")

    ax = axes[2, 0]
    ax.plot(t, times * 1e6, lw=0.8, label="solve time (us)")
    ax.set_yscale("log")
    ax.set_title("solve time")
    ax.set_xlabel("timestep")
    ax2 = ax.twinx()
    ax2.plot(t, iters, lw=0.8, color="tab:orange", label="iterations")
    ax2.set_ylabel("iterations")

    ax = axes[2, 1]
    ax.semilogy(t, np.maximum(fviol, 1e-16), lw=0.8,
                label="friction cone violation")
    ax.semilogy(t, np.maximum(bviol, 1e-16), lw=0.8,
                label="bounds violation")
    ax.set_title("constraint violations")
    ax.set_xlabel("timestep")
    ax.legend()

    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
