#!/usr/bin/env python
"""Round-2 perf experiments (run detached on the TPU).

E1: reference-mode 2048^2 with pallas_fuse_k in {10, 25, 50} -- can a
    wider fused-K window (fewer launches, more redundant compute) cut
    the ~105-launch schedule's cost? (VERDICT item 3)
E2: 512^2 launch-overhead probe: per-launch fixed cost of a minimal
    Pallas kernel vs its DMA/compute content, to establish whether the
    512^2 wall (0.70e9 cups) is launch overhead or streaming
    (VERDICT item 2's roofline question).
E3: 512^2 fast-mode fuse_k ladder {10, 25, 50} (the 5b result
    re-checked end-to-end at the step level).

Writes /tmp/perf_experiments_r02.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def bench_mode(n, steps, mode, fuse_k, warm=True):
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              solver_options_for)
    grid = Grid(nx=n, ny=n, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4)
    if mode == "fast":
        opts = solver_options_for(
            Semantics.RUST, ramp_up_steps=10, jacobi_tol=0.0,
            jacobi_iters=50, outer_corrector_rounds=0, early_exit=False,
            pallas_fuse_k=fuse_k)
    else:
        opts = solver_options_for(Semantics.RUST, ramp_up_steps=10,
                                  pallas_fuse_k=fuse_k)
    scene = cfd.make_scene(grid, params, opts)
    run = cfd.make_run(scene, steps, donate=False)
    state, _ = run(scene.init_state())
    float(state.res_u)  # sync (block_until_ready is a no-op on axon)
    t0 = time.perf_counter()
    state, _ = run(state)
    float(state.res_u)
    dt = time.perf_counter() - t0
    assert np.isfinite(float(state.res_u))
    return {"cups": n * n * steps / dt, "ms_per_step": dt / steps * 1e3}


def launch_overhead_probe():
    """Chain N minimal one-block Pallas launches under lax.scan and
    time vs N: the slope is the per-launch fixed cost."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def one(x):
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)

    out = {}
    for rows in (512,):
        x = jnp.zeros((rows, 512), jnp.float32)
        for n_launch in (50, 200):
            @jax.jit
            def chain(x, n=n_launch):
                def body(c, _):
                    return one(c), None
                y, _ = lax.scan(body, x, None, length=n)
                return y
            y = chain(x)
            float(y[0, 0])
            t0 = time.perf_counter()
            y = chain(x)
            float(y[0, 0])
            dt = time.perf_counter() - t0
            out[f"{rows}x512_N{n_launch}"] = dt
    a, b = out["512x512_N50"], out["512x512_N200"]
    out["per_launch_us"] = (b - a) / 150 * 1e6
    return out


def main():
    results = {"date": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())}
    print("E2 launch overhead...", flush=True)
    results["launch_overhead"] = launch_overhead_probe()
    print(results["launch_overhead"], flush=True)
    for name, n, steps, mode, ks in (
            ("E3_512_fast", 512, 200, "fast", (10, 25, 50)),
            ("E1_2048_ref", 2048, 30, "reference", (10, 25, 50))):
        results[name] = {}
        for k in ks:
            print(f"{name} k={k}...", flush=True)
            try:
                results[name][f"k{k}"] = bench_mode(n, steps, mode, k)
            except Exception as e:  # noqa: BLE001
                results[name][f"k{k}"] = {"error": f"{type(e).__name__}: "
                                                   f"{str(e)[:160]}"}
            print(results[name][f"k{k}"], flush=True)
    with open("/tmp/perf_experiments_r02.json", "w") as f:
        json.dump(results, f, indent=2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
