#!/usr/bin/env python
"""Regenerate the docs/PERF.md headline table: bench every grid size /
solver / impl combination with amortized scan timing (run on the TPU).

    python tools/bench_matrix.py [--quick]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_case(n, steps, pressure_solver="jacobi", pressure_impl="auto",
               substep_impl="auto"):
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, PressureSolver, Semantics,
                              SimulationParams, solver_options_for)
    grid = Grid(nx=n, ny=n, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver(pressure_solver))
    opts = solver_options_for(
        Semantics.RUST, ramp_up_steps=10, jacobi_tol=0.0, jacobi_iters=50,
        outer_corrector_rounds=0, early_exit=False,
        pressure_impl=pressure_impl, substep_impl=substep_impl)
    scene = cfd.make_scene(grid, params, opts)
    run = cfd.make_run(scene, steps, donate=False)
    state, _ = run(scene.init_state())
    float(state.res_u)
    t0 = time.perf_counter()
    state, _ = run(state)
    float(state.res_u)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(state.res_u)).all()
    return n * n * steps / dt, dt / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="2048^2 only")
    ap.add_argument("--solvers", default="jacobi,sor,multigrid,mg-production",
                    help="comma list (round 5 adds the plain multigrid "
                         "column, VERDICT r4 item 5)")
    ap.add_argument("--impls", default="auto,jnp",
                    help="comma list; the jnp columns at >= 8192^2 cost "
                         "minutes-to-hours per cell (421 ms - 13.6 s per "
                         "STEP) -- use --impls auto for the headline regen")
    ap.add_argument("--sizes", default="512,1024,2048,4096,8192,16384",
                    help="comma list of grid edges")
    args = ap.parse_args()
    # Step counts auto-scaled so device work dominates the fixed
    # ~20-30 ms axon per-call cost (docs/PERF.md item 9).
    steps_for = {512: 1600, 1024: 400, 2048: 100, 4096: 50,
                 8192: 20, 16384: 10}
    cases = [(n, steps_for.get(n, 20))
             for n in (int(s) for s in args.sizes.split(","))]
    if args.quick:
        cases = [(2048, 100)]
    print(f"{'grid':>6} {'solver':>12} {'impl':>7} {'cu/s':>10} {'ms/step':>9}")
    for n, steps in cases:
        for solver in args.solvers.split(","):
            for impl in args.impls.split(","):
                try:
                    rate, per = bench_case(n, steps, solver, impl, impl)
                    print(f"{n:>6} {solver:>12} {impl:>7} "
                          f"{rate/1e9:>9.3f}e9 {per*1e3:>8.2f}", flush=True)
                except Exception as e:
                    print(f"{n:>6} {solver:>12} {impl:>7}   FAIL "
                          f"{type(e).__name__}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
