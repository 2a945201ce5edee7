#!/usr/bin/env python
"""Round-4 ensemble probes (VERDICT r3 item 6).

1. vmapped MG_PRODUCTION at B in {8, 64} (256x96 RUST, the BASELINE
   config-5 analog): ms/step of the XLA batch path the vmap gate
   routes these scenes to, against the B x single-scene sequential
   cost -- the measurement behind the documented gate (no whole-scene
   MGP kernel exists; at ensemble scene sizes the projection IS the
   batched-FDM eigenbasis matmuls, already MXU-batched under vmap).
2. SOR ensemble kernel crossover at a SECOND scene size (512x192):
   kernel (auto, B <= 16 gate) vs XLA batch at B in {8, 16} -- the
   round-3 B<=16 gate rests on one 256x96 measurement.

    setsid python -u tools/probe_ensemble_r4.py > /tmp/probe_ens_r4.log 2>&1 &
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

RESULTS = "/tmp/probe_ens_r4.json"
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
    if B == 1:
        st = base

        def chunk_fn(s):
            def body(s, _):
                s, _ = step_fn(scene, s)
                return s, None
            return jax.lax.scan(body, s, None, length=chunk)[0]
    else:
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
        float(st.res_u if B == 1 else st.res_u[0])
        t0 = time.perf_counter()
        done = 0
        while done < steps:
            st = run(st)
            float(st.res_u if B == 1 else st.res_u[0])
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


# 1. MGP ensembles at 256x96 (+ the single-scene sequential baseline).
run_cfg("mgp_B1_single", 1, "auto", "mg-production", 256, 96, 30.0, 10.0)
for B in (8, 64):
    run_cfg(f"mgp_B{B}_auto", B, "auto", "mg-production", 256, 96,
            30.0, 10.0)
# 2. SOR kernel crossover, second scene size 512x192.
for B in (8, 16):
    for impl in ("jnp", "auto"):
        run_cfg(f"sor512_B{B}_{impl}", B, impl, "sor", 512, 192,
                30.0, 11.25, jacobi_tol=0.0, jacobi_iters=50)
print("DONE", flush=True)
