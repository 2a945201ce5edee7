#!/usr/bin/env python
"""Headline benchmark: cell-updates/sec/chip at 2048^2.

Target (BASELINE.md): >= 1e9 cell-updates/sec/chip, where one
cell-update = one pressure cell advanced through one full PISO substep
(predictor + 50-iteration Jacobi pressure solve + corrector + BCs).
``--sweeps`` mode also reports pressure-iteration throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # The axon tunnel has a ~20 ms fixed cost per jit CALL (dispatch +
    # readback), independent of the scan length inside; 100-step scans
    # amortize it so the metric reflects device work (docs/PERF.md
    # "Measurement traps").
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=0,
                    help="steps per timed scan; 0 = auto-scale so device "
                         "work dominates the ~20-30 ms fixed axon call "
                         "cost at every size (at 512^2, 100 steps are "
                         "~35 ms total, i.e. mostly tunnel overhead -- "
                         "the metric would reflect the tunnel, not the "
                         "chip)")
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--mode",
                    choices=["fast", "reference", "production", "fdm",
                             "sor"],
                    default="fast",
                    help="fast: fixed 50-iter Jacobi, 1 substep (deterministic "
                         "cost); reference: full Rust semantics incl. outer "
                         "corrector rounds; production: MG_PRODUCTION "
                         "projection (divergence-calibrated V-cycles, "
                         "docs/SPEC.md item 12); fdm: exact direct "
                         "projection (docs/SPEC.md item 13)")
    ap.add_argument("--impl", choices=["auto", "pallas", "jnp"],
                    default="auto",
                    help="pressure-solve implementation; auto picks the "
                         "fused-K Pallas kernel above ~6M cells and the "
                         "XLA-fused scan below (docs/PERF.md)")
    ap.add_argument("--fuse-k", type=int, default=0,
                    help="override the fused-Jacobi launch granularity "
                         "(0 = size-tuned auto, solver.piso.resolve_fuse_k)")
    ap.add_argument("--mgp-scheme", choices=["auto", "aligned", "legacy"],
                    default="auto",
                    help="production mode only: coarse-hierarchy scheme "
                         "(docs/SPEC.md item 12; aligned contracts "
                         "0.1-0.27/cycle, legacy stalls at ~0.76 but has "
                         "the single-launch whole-cycle Pallas kernels; "
                         "auto picks by the measured crossover)")
    ap.add_argument("--mgp-rtol", type=float, default=0.0,
                    help="production mode only: relative-reduction exit "
                         "(max|r| <= rtol * warm-start residual, combined "
                         "with the absolute div-calibrated tol); makes the "
                         "V-cycle count resolution-independent at >= 4096^2 "
                         "where the absolute tol alone needs ever more "
                         "cycles (docs/PERF.md)")
    args = ap.parse_args()

    import jax
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              solver_options_for)

    n = args.n
    if not args.steps:
        args.steps = min(2000, max(100, round(100 * (2048 / n) ** 2)))
    grid = Grid(nx=n, ny=n, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4)
    if args.mode == "fast":
        opts = solver_options_for(
            Semantics.RUST, ramp_up_steps=10,
            jacobi_tol=0.0, jacobi_iters=50, outer_corrector_rounds=0,
            early_exit=False, pressure_impl=args.impl,
            pallas_fuse_k=args.fuse_k)
    elif args.mode == "production":
        from cfd_demo_tpu import PressureSolver
        params = SimulationParams(dt=0.002, viscosity=1e-4,
                                  pressure_solver=PressureSolver.MG_PRODUCTION)
        opts = solver_options_for(Semantics.RUST, ramp_up_steps=10,
                                  outer_corrector_rounds=0,
                                  pressure_impl=args.impl,
                                  pallas_fuse_k=args.fuse_k,
                                  mgp_rtol=args.mgp_rtol,
                                  mgp_scheme=args.mgp_scheme)
    elif args.mode == "fdm":
        from cfd_demo_tpu import PressureSolver
        params = SimulationParams(dt=0.002, viscosity=1e-4,
                                  pressure_solver=PressureSolver.FDM)
        opts = solver_options_for(Semantics.RUST, ramp_up_steps=10,
                                  outer_corrector_rounds=0,
                                  pressure_impl=args.impl,
                                  pallas_fuse_k=args.fuse_k)
    elif args.mode == "sor":
        # fixed 50-iteration red/black SOR schedule (the fast-mode
        # shape on the JS-twin solver family; round 4 routes >= 2M
        # cells through the color-compressed kernel chain)
        from cfd_demo_tpu import PressureSolver
        params = SimulationParams(dt=0.002, viscosity=1e-4,
                                  pressure_solver=PressureSolver.SOR)
        opts = solver_options_for(
            Semantics.RUST, ramp_up_steps=10,
            jacobi_tol=0.0, jacobi_iters=50, outer_corrector_rounds=0,
            early_exit=False, pressure_impl=args.impl,
            pallas_fuse_k=args.fuse_k)
    else:
        opts = solver_options_for(Semantics.RUST, ramp_up_steps=10,
                                  pressure_impl=args.impl,
                                  pallas_fuse_k=args.fuse_k)
    scene = cfd.make_scene(grid, params, opts)

    state = scene.init_state()
    run_w = cfd.make_run(scene, args.warmup, donate=False)
    run = cfd.make_run(scene, args.steps, donate=False)
    state, _ = run_w(state)
    state, _ = run(state)           # compile + first timed shape
    float(state.res_u)              # force completion (axon's
    #                                 block_until_ready is a no-op)
    t0 = time.perf_counter()
    state, _ = run(state)
    float(state.res_u)
    dt = time.perf_counter() - t0

    assert np.isfinite(np.asarray(state.u)).all(), "non-finite fields"
    cell_updates = n * n * args.steps / dt
    result = {
        "metric": f"cell-updates/sec/chip at {n}^2 ({args.mode} PISO substep)",
        "value": round(cell_updates, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(cell_updates / 1e9, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
