#!/usr/bin/env python
"""Round-3 probe: decompose the 8192^2 fast-mode step.

step = predict_div_pallas + jacobi solve (4 launches) +
correct_bc_pallas + scalar control. Solve measures 24.7 ms and the
full step ~39.7 (1.69e9 cups); this probe times the two substep
kernels in the same in-scan protocol to locate the remaining ~15 ms.

    setsid python -u tools/probe_substep_r3.py > /tmp/probe_substep_r3.log 2>&1 &
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

N = int(os.environ.get("PROBE_N", "8192"))
L_SHORT, L_LONG = 3, 13


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              solver_options_for)
    from cfd_demo_tpu.kernels.substep_pallas import (_round_up,
                                                     correct_bc_pallas,
                                                     predict_div_pallas)

    grid = Grid(nx=N, ny=N, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4)
    opts = solver_options_for(Semantics.RUST, ramp_up_steps=10,
                              jacobi_tol=0.0, jacobi_iters=50,
                              outer_corrector_rounds=0, early_exit=False)
    scene = cfd.make_scene(grid, params, opts)
    state = scene.init_state()
    nxp = _round_up(N + 1, 128)
    up = jnp.pad(state.u, ((0, 0), (0, nxp - (N + 1))))
    v, p, pp = state.v, state.p, state.p_prime
    dt, nu, inlet = 0.002, 1e-4, 1.0

    results = []

    def timed(tag, fn, carry0):
        out = {"tag": tag}
        try:
            fns = {}
            for L in (L_SHORT, L_LONG):
                fns[L] = jax.jit(functools.partial(
                    lambda c, L: lax.scan(lambda cc, _: (fn(cc), None),
                                          c, None, length=L)[0], L=L))
            ts = {}
            for L in (L_SHORT, L_LONG):
                o = fns[L](carry0)
                float(jax.tree.leaves(o)[0][5, 5])
                t0 = time.perf_counter()
                o = fns[L](carry0)
                float(jax.tree.leaves(o)[0][5, 5])
                ts[L] = time.perf_counter() - t0
            ms = (ts[L_LONG] - ts[L_SHORT]) / (L_LONG - L_SHORT) * 1e3
            out.update(ok=True, ms=round(ms, 2))
        except Exception as e:  # noqa: BLE001
            out.update(ok=False, error=f"{type(e).__name__}: {str(e)[:200]}")
        print(json.dumps(out), flush=True)
        results.append(out)
        with open("/tmp/probe_substep_r3.json", "w") as f:
            json.dump(results, f, indent=1)

    # (a) predictor+divergence kernel alone (carry u padded; v carried)
    def pred(c):
        u_, v_ = c
        us, vs, rhs = predict_div_pallas(u_, v_, dt, nu, grid,
                                         scene.params.velocity_scheme,
                                         opts.semantics, pad_io=False)
        return us, vs

    timed("predict_div", pred, (up, v))

    # (b) corrector kernel alone (u*,v* stand-ins = u,v)
    def corr(c):
        u_, v_, p_, pp_ = c
        u2, v2, p2, ru, rv, mv = correct_bc_pallas(
            u_, v_, p_, pp_, u_, v_, dt, inlet, grid,
            scene.params.inlet_profile, scene.params.flow_case,
            opts.semantics, pad_io=False, return_padded_u=True)
        return u2, v2, p2, pp_

    timed("correct_bc", corr, (up, v, p, pp))

    # (c) the full step for reference, same protocol
    from cfd_demo_tpu.solver.piso import step_fn

    def full(c):
        s, _ = step_fn(scene, c)
        return s

    def full_first(c):
        return jax.tree.leaves(full(c))[0]

    fns = {}
    for L in (L_SHORT, L_LONG):
        fns[L] = jax.jit(functools.partial(
            lambda s, L: lax.scan(lambda cc, _: (full(cc), None),
                                  s, None, length=L)[0], L=L))
    ts = {}
    for L in (L_SHORT, L_LONG):
        o = fns[L](state)
        float(o.res_p)
        t0 = time.perf_counter()
        o = fns[L](state)
        float(o.res_p)
        ts[L] = time.perf_counter() - t0
    ms = (ts[L_LONG] - ts[L_SHORT]) / (L_LONG - L_SHORT) * 1e3
    rec = {"tag": "full_step", "ok": True, "ms": round(ms, 2)}
    print(json.dumps(rec), flush=True)
    results.append(rec)
    with open("/tmp/probe_substep_r3.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
