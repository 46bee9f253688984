"""Measure drop-in serving latency/throughput vs pipeline depth.

VERDICT r4 item 6: replace the bare "102 ms FCCQP.Solve" number with a
measured curve. Runs a warm-started Cassie control-log stream through
`FCCQPServer` at depth 1/2/4/8 on the attached device and reports, per
depth: amortized per-solve wall (throughput^-1), p50/p95 submit->retire
latency, and convergence. Depth 1 is the synchronous drop-in floor
(dispatch + fetch round trip per solve); deeper pipelines hide the
round trip behind in-flight solves.

Usage:  python exp_serving.py [--steps 64] [--depths 1,2,4,8]
Output: one JSON line (stdout); progress to stderr.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--depths", default="1,2,4,8")
    p.add_argument("--rho", type=float, default=0.05)
    p.add_argument("--max-iter", type=int, default=3000)
    args = p.parse_args()
    depths = [int(d) for d in args.depths.split(",")]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fccqp_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from fcc_qp_tpu import FCCQPOptions, FCCQPServer
    from fcc_qp_tpu.models.osc import CASSIE, generate_osc_sequence

    log(f"device: {jax.devices()[0]}")
    qps = generate_osc_sequence(CASSIE, args.steps, seed=0)
    opts = FCCQPOptions(
        max_iter=args.max_iter, rho=args.rho,
        eps_fcone=1e-6, eps_bound=1e-6, presolve="operator",
        scaling=True, splitting="constrained", kkt_refine_steps=1,
        polish=True, polish_rounds=4, polish_newton_steps=4,
    )

    def run(depth):
        server = FCCQPServer(CASSIE.shape, opts, depth=depth, engine="ds")
        # warm the compile caches (cold + warm programs) off the clock
        for qp in qps[:2]:
            server.submit(
                qp["Q"], qp["b"], qp["A_eq"], qp["b_eq"],
                qp["friction_coeffs"], qp["lb"], qp["ub"],
            )
        server.drain()
        server.reset_warm_start()

        t0 = time.perf_counter()
        for qp in qps:
            server.submit(
                qp["Q"], qp["b"], qp["A_eq"], qp["b_eq"],
                qp["friction_coeffs"], qp["lb"], qp["ub"],
            )
        results = dict(server.drain())
        wall = time.perf_counter() - t0

        stats = [results[t].details for t in sorted(results)]
        lat = np.array([d.solve_time for d in stats])
        conv = np.mean([d.solve_status == 0 for d in stats])
        # skip the cold step 0 in the latency stats (it compiles the
        # warm program into the pipeline's view otherwise)
        warm_lat = lat[1:]
        return {
            "depth": depth,
            "amortized_ms_per_solve": 1e3 * wall / len(qps),
            "throughput_solves_per_s": len(qps) / wall,
            "latency_p50_ms": 1e3 * float(np.median(warm_lat)),
            "latency_p95_ms": 1e3 * float(np.percentile(warm_lat, 95)),
            "converged_pct": 100.0 * float(conv),
        }

    rows = []
    for d in depths:
        r = run(d)
        rows.append(r)
        log(
            f"depth={d}: {r['amortized_ms_per_solve']:.1f} ms/solve "
            f"({r['throughput_solves_per_s']:.1f}/s), "
            f"latency p50={r['latency_p50_ms']:.1f} ms "
            f"p95={r['latency_p95_ms']:.1f} ms, "
            f"converged={r['converged_pct']:.0f}%"
        )

    print(json.dumps({
        "experiment": "serving_latency_vs_depth",
        "steps": args.steps,
        "model": "cassie",
        "opts": "bench.py defaults (rho=0.05, eps=1e-6, polish)",
        "rows": rows,
        "reference": "fccqp.pdf p.5 Fig.1: ~100 us/solve on the robot's "
                     "own CPU at eps=1e-4; this curve is the remote-"
                     "attached-TPU drop-in serving trade (B=1; the "
                     "amortized fleet path is bench.py's 30k+/s)",
    }))


if __name__ == "__main__":
    main()
