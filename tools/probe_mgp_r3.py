#!/usr/bin/env python
"""Round-3 MGP ladder at 8192^2: knob attribution for the >= 1e9 push.

Per-step protocol (one dispatch + scalar read per step; see
tools/probe_mgp.py for why scan-fusing is unsafe at this size).

    setsid python -u tools/probe_mgp_r3.py > /tmp/probe_mgp_r3.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402

import cfd_demo_tpu as cfd  # noqa: E402
from cfd_demo_tpu import (Cylinder, Grid, PressureSolver,  # noqa: E402
                          Semantics, SimulationParams, solver_options_for)

N = int(os.environ.get("PROBE_N", "8192"))
STEPS = 12
RESULTS = "/tmp/probe_mgp_r3.json"


def run_cfg(tag, **over):
    grid = Grid(nx=N, ny=N, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver.MG_PRODUCTION)
    opts = solver_options_for(Semantics.RUST, ramp_up_steps=4,
                              outer_corrector_rounds=0, **over)
    out = {"tag": tag}
    try:
        scene = cfd.make_scene(grid, params, opts)
        step = cfd.make_step(scene, donate=False)
        state = scene.init_state()
        times, res = [], []
        for i in range(STEPS):
            t0 = time.perf_counter()
            state, diag = step(state)
            rp = float(state.res_p)
            times.append(time.perf_counter() - t0)
            res.append(rp)
        warm = times[max(3, len(times) // 3):]
        best = sorted(warm)[:max(1, len(warm) // 2)]
        ms = 1e3 * sum(best) / len(best)
        out.update(ok=True, ms_step=round(ms, 1),
                   cups=round(N * N / (ms / 1e3) / 1e9, 3),
                   res_p_last=round(res[-1], 1),
                   finite=bool(np.isfinite(np.asarray(state.u)).all()))
    except Exception as e:  # noqa: BLE001
        out.update(ok=False, error=f"{type(e).__name__}: {str(e)[:200]}")
    print(json.dumps(out), flush=True)
    results.append(out)
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=1)


results = []
run_cfg("baseline")
run_cfg("coarse_stop_512", mgp_coarse_stop=512)
run_cfg("coarse_stop_1024", mgp_coarse_stop=1024)
run_cfg("smooth2", mgp_smooth=2)
run_cfg("fixed2", mgp_fixed_cycles=2)
run_cfg("fixed1", mgp_fixed_cycles=1)
run_cfg("fixed2_cs512", mgp_fixed_cycles=2, mgp_coarse_stop=512)
print("DONE", flush=True)
