#!/usr/bin/env python
"""Round-5 re-probe (VERDICT r4 item 7): the ensemble SOR
whole-scene-kernel vs XLA-batch crossover, re-measured at round-5 HEAD.

The B <= 16 gate was measured in rounds 3-4; round 4's rb2 kernel
changed single-scene SOR >= 2M cells (not these scene sizes, whose
per-scene solves stay under the rb2 routing gate), but the gate's
justification must rest on CURRENT code, so re-measure both shapes:
256x96 and 512x192, kernel (auto) vs XLA batch (jnp), B in {8, 16}.

    setsid python -u tools/probe_ensemble_r5.py > /tmp/probe_ens_r5.log 2>&1 &
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

RESULTS = "/tmp/probe_ens_r5.json"
results = []


def run_cfg(tag, B, impl, solver, nx, ny, lx, ly, steps=60, chunk=20,
            **opts_over):
    import jax
    import jax.numpy as jnp

    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, PressureSolver, Semantics,
                              SimulationParams, solver_options_for)
    from cfd_demo_tpu.solver.piso import step_fn

    grid = Grid(nx=nx, ny=ny, lx=lx, ly=ly,
                obstacles=(Cylinder(lx / 4, ly / 2, ly / 13.3),))
    params = SimulationParams(dt=0.004, viscosity=1e-4,
                              pressure_solver=PressureSolver(solver))
    opts = solver_options_for(Semantics.RUST, early_exit=False,
                              pressure_impl=impl, substep_impl=impl,
                              outer_corrector_rounds=0, **opts_over)
    scene = cfd.make_scene(grid, params, opts)
    base = scene.init_state()
    nus = np.geomspace(1e-5, 1e-2, B).astype(np.float32)
    st = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                      base)
    st = dataclasses.replace(st, nu=jnp.asarray(nus))

    def chunk_fn(s):
        def body(s, _):
            s, _ = jax.vmap(partial(step_fn, scene))(s)
            return s, None
        return jax.lax.scan(body, s, None, length=chunk)[0]

    run = jax.jit(chunk_fn)
    out = {"tag": tag}
    try:
        st = run(st)
        float(st.res_u[0])
        t0 = time.perf_counter()
        done = 0
        while done < steps:
            st = run(st)
            float(st.res_u[0])
            done += chunk
        dt_w = time.perf_counter() - t0
        out.update(ok=True, ms_step=round(dt_w / done * 1e3, 2),
                   scene_steps_per_s=round(B * done / dt_w, 1),
                   finite=bool(np.isfinite(np.asarray(st.u)).all()))
    except Exception as e:  # noqa: BLE001
        out.update(ok=False, error=f"{type(e).__name__}: {str(e)[:200]}")
    print(json.dumps(out), flush=True)
    results.append(out)
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=1)


for nx, ny, ly in ((256, 96, 10.0), (512, 192, 11.25)):
    for B in (8, 16):
        for impl in ("jnp", "auto"):
            run_cfg(f"sor{nx}_B{B}_{impl}", B, impl, "sor", nx, ny,
                    30.0, ly, jacobi_tol=0.0, jacobi_iters=50)
print("DONE", flush=True)
