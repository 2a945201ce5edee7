#!/usr/bin/env python
"""Multi-chip scaling benchmark -- ready for real pod hardware.

The dev environment tunnels ONE TPU chip, so the multi-chip tiers are
correctness-pinned on an 8-device CPU mesh (tests/test_shmap.py,
tests/test_sharding.py) but their SCALING is unmeasured (docs/PERF.md
"paths" item 4 predicts near-linear: ~1.5 MB/step of halo traffic vs
~55 ms/chip of compute at 8192^2 over 4 chips). Point this tool at a
pod and it measures weak and strong scaling of the explicit
shard_map tier (and the GSPMD tier for comparison) across every
visible device count in {1, 2, 4, ..., n_devices}:

    python tools/bench_pod.py --n 8192 --steps 50
    python tools/bench_pod.py --smoke   # 8-device CPU mesh dry run

Prints one JSON line per (tier, n_devices, mode) with
cell-updates/sec and parallel efficiency vs the 1-device run.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)


def _sync(x):
    import numpy as np
    # jax.block_until_ready is a no-op on axon: force a scalar read.
    return float(np.asarray(x.res_u if hasattr(x, "res_u") else x))


def bench_tier(scene, devices, tier, steps, interpret=False):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from cfd_demo_tpu.shard.mesh import (make_mesh, make_sharded_step,
                                         shard_state)

    mesh = make_mesh(devices)
    state = shard_state(scene.init_state(), mesh)
    if tier == "gspmd":
        step = make_sharded_step(scene, mesh)
    else:
        from cfd_demo_tpu.shard.step_shmap import make_run_shmap
        run = jax.jit(make_run_shmap(scene, mesh, steps,
                                     interpret=interpret))
        # warmup/compile
        s2, _ = run(state)
        _sync(s2)
        t0 = time.perf_counter()
        s2, _ = run(state)
        _sync(s2)
        return time.perf_counter() - t0

    s = state
    for _ in range(2):  # warmup/compile
        s, _ = step(s)
    _sync(s)
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        # Bound dispatch depth: queueing many un-synced per-step
        # dispatches can wedge the axon tunnel (CLAUDE.md); the sync
        # every 10 steps costs one scalar read per batch, amortized.
        n = min(10, steps - done)
        for _ in range(n):
            s, _ = step(s)
        _sync(s)
        done += n
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--tier", choices=["shmap", "gspmd", "both"],
                    default="both")
    ap.add_argument("--mode", choices=["strong", "weak", "both"],
                    default="both",
                    help="strong: fixed global grid; weak: n rows per "
                         "device held constant")
    ap.add_argument("--smoke", action="store_true",
                    help="8-virtual-device CPU mesh, tiny grid, "
                         "interpret-mode kernels (validates the tool "
                         "without a pod; timings are meaningless)")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="multi-host: jax.distributed coordinator "
                         "(launch one process per host; on TPU pods "
                         "with auto-detection pass 'auto')")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator is not None:
        from cfd_demo_tpu.shard.distributed import init_distributed
        idx, cnt = init_distributed(
            None if args.coordinator == "auto" else args.coordinator,
            args.num_processes, args.process_id)
        print(f"# process {idx}/{cnt}, "
              f"{len(jax.local_devices())} local / "
              f"{len(jax.devices())} global devices")
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              solver_options_for)

    devs = jax.devices()
    n = 128 if args.smoke else args.n
    steps = 3 if args.smoke else args.steps
    counts = []
    c = 1
    while c <= len(devs):
        counts.append(c)
        c *= 2
    if jax.process_count() > 1:
        # Multi-host: every process must join every computation, so a
        # submesh owned by a subset of hosts can't run -- bench the
        # full global mesh only (scaling curves come from re-running
        # the job at different host counts).
        counts = [len(devs)]
    tiers = ["shmap", "gspmd"] if args.tier == "both" else [args.tier]
    modes = ["strong", "weak"] if args.mode == "both" else [args.mode]

    def scene_for(ny, nx):
        grid = Grid(nx=nx, ny=ny, lx=30.0, ly=30.0 * ny / nx,
                    obstacles=(Cylinder(7.5, 15.0 * ny / nx, 0.75),))
        return cfd.make_scene(
            grid, SimulationParams(dt=0.002, viscosity=1e-4),
            solver_options_for(Semantics.RUST, ramp_up_steps=100,
                               jacobi_tol=0.0, outer_corrector_rounds=0))

    base = {}
    for mode in modes:
        for tier in tiers:
            for nd in counts:
                ny = n if mode == "strong" else (n // counts[-1]) * nd
                if ny % nd or (ny // nd) % 8:
                    continue
                sc = scene_for(ny, n)
                try:
                    wall = bench_tier(sc, devs[:nd], tier, steps,
                                      interpret=args.smoke)
                except ValueError as e:   # shard-size floor etc.
                    print(json.dumps({"tier": tier, "mode": mode,
                                      "devices": nd,
                                      "skipped": str(e)[:90]}))
                    continue
                cups = ny * n * steps / wall
                key = (tier, mode)
                if nd == counts[0]:
                    base[key] = cups
                eff = cups / (base[key] * nd / counts[0]) \
                    if key in base else None
                print(json.dumps({
                    "tier": tier, "mode": mode, "devices": nd,
                    "grid": f"{ny}x{n}", "steps": steps,
                    "wall_s": round(wall, 3),
                    "cell_updates_per_s": round(cups, 1),
                    "parallel_efficiency":
                        round(eff, 3) if eff is not None else None,
                }), flush=True)


if __name__ == "__main__":
    main()
