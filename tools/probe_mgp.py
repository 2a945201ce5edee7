"""Per-step MG_PRODUCTION probe at very large grids (8192^2+).

Why per-step: a multi-step scan-fused rollout at these sizes exceeds
the axon tunnel's per-dispatch device-time budget and kills the remote
worker (docs/PERF.md "Operational notes"). One dispatch per step with
a scalar read between keeps every call far under the wall; the steady
ms/step is the mean of the best post-warmup steps, so the ~20 ms/call
tunnel cost inflates the reading by <10% at these step times.

Usage: python tools/probe_mgp.py [--n 8192] [--steps 10]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import cfd_demo_tpu as cfd  # noqa: E402
from cfd_demo_tpu import (Cylinder, Grid, PressureSolver,  # noqa: E402
                          Semantics, SimulationParams, solver_options_for)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=1,
                    help="steps per dispatch (lax.scan): amortizes the "
                         "~15-20 ms axon per-call cost 1/chunk for a "
                         "TRUE steady ms/step; keep chunk*step_time "
                         "well under the ~2-min device-time wall")
    args = ap.parse_args()
    n = args.n

    grid = Grid(nx=n, ny=n, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver.MG_PRODUCTION)
    opts = solver_options_for(Semantics.RUST, ramp_up_steps=4,
                              outer_corrector_rounds=0,
                              pressure_impl="auto")
    scene = cfd.make_scene(grid, params, opts)
    state = scene.init_state()
    times = []
    if args.chunk > 1:
        run = cfd.make_run(scene, args.chunk, donate=False)
        n_calls = -(-args.steps // args.chunk)
        for i in range(n_calls):
            t0 = time.perf_counter()
            state, diags = run(state)
            rp = float(state.res_p)
            dt_w = time.perf_counter() - t0
            times.append(dt_w / args.chunk)
            print(f"call {i} ({args.chunk} steps): {dt_w:.2f}s "
                  f"res_p={rp:.4g}", flush=True)
    else:
        step = cfd.make_step(scene, donate=False)
        for i in range(args.steps):
            t0 = time.perf_counter()
            state, diag = step(state)
            rp = float(state.res_p)  # forces completion (axon block is a no-op)
            dt_w = time.perf_counter() - t0
            times.append(dt_w)
            print(f"step {i}: {dt_w:.2f}s res_p={rp:.4g}", flush=True)
    warm = times[max(3, len(times) // 3):] or times[-1:]
    best = sorted(warm)[:max(1, len(warm) // 2)]
    msstep = 1e3 * sum(best) / len(best)
    print(f"steady ms/step ~{msstep:.1f}, cups {n * n / (msstep / 1e3):.3g}")
    print("finite:", np.isfinite(np.asarray(state.u)).all())


if __name__ == "__main__":
    main()
