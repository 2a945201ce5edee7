#!/usr/bin/env python
"""Round-3 A/B: SOR ensembles through the whole-scene kernel vs the
XLA batch path (VERDICT r2 item 8's measurement), B in {8, 64} at
256x96, RUST semantics, fixed 50-iteration schedule + the default
early-exit tolerance config.

    setsid python -u tools/probe_ensemble_sor_r3.py > /tmp/probe_ens_sor.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402

RESULTS = "/tmp/probe_ens_sor.json"
results = []


def run_cfg(tag, B, impl, steps=60, chunk=20, **opts_over):
    import jax
    import jax.numpy as jnp

    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, PressureSolver, Semantics,
                              SimulationParams, solver_options_for)
    from cfd_demo_tpu.solver.piso import step_fn

    grid = Grid(nx=256, ny=96, lx=30.0, ly=10.0,
                obstacles=(Cylinder(7.5, 5.0, 0.75),))
    params = SimulationParams(dt=0.004, viscosity=1e-4,
                              pressure_solver=PressureSolver.SOR)
    opts = solver_options_for(Semantics.RUST, early_exit=False,
                              pressure_impl=impl, substep_impl=impl,
                              **opts_over)
    scene = cfd.make_scene(grid, params, opts)
    nus = np.geomspace(1e-5, 1e-2, B).astype(np.float32)
    base = scene.init_state()
    batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                           base)
    batched = dataclasses.replace(batched, nu=jnp.asarray(nus))

    def chunk_fn(s):
        def body(s, _):
            s, _ = jax.vmap(partial(step_fn, scene))(s)
            return s, None
        return jax.lax.scan(body, s, None, length=chunk)[0]

    run = jax.jit(chunk_fn)
    out = {"tag": tag}
    try:
        batched = run(batched)
        float(batched.res_u[0])
        t0 = time.perf_counter()
        done = 0
        while done < steps:
            batched = run(batched)
            float(batched.res_u[0])
            done += chunk
        dt_w = time.perf_counter() - t0
        out.update(ok=True, ms_step=round(dt_w / done * 1e3, 2),
                   scene_steps_per_s=round(B * done / dt_w, 1),
                   finite=bool(np.isfinite(np.asarray(batched.u)).all()))
    except Exception as e:  # noqa: BLE001
        out.update(ok=False, error=f"{type(e).__name__}: {str(e)[:200]}")
    print(json.dumps(out), flush=True)
    results.append(out)
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=1)


for B in (8, 64):
    for impl in ("jnp", "auto"):
        run_cfg(f"B{B}_{impl}_tol", B, impl)
        run_cfg(f"B{B}_{impl}_fixed", B, impl, jacobi_tol=0.0,
                jacobi_iters=50)
print("DONE", flush=True)
