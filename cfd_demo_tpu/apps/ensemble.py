"""Batched scene ensemble via vmap (BASELINE config 5).

Runs B independent scenes (a viscosity sweep) as one batched program:
the pure step function vmaps for free, and masked-iteration mode keeps
per-element convergence exact (SURVEY.md section 2.7).

    python -m cfd_demo_tpu.apps.ensemble --batch 64 --steps 200
"""
from __future__ import annotations

import dataclasses
import sys
import time
from functools import partial

import numpy as np

from .. import Grid, Cylinder, Semantics, make_scene, solver_options_for
from ..solver.piso import step_fn
from .common import base_parser, params_from_args


def main(argv=None):
    ap = base_parser(__doc__)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--shard-batch", action="store_true",
                    help="shard the batch axis over all devices "
                         "(serving-style data parallelism; the device "
                         "count must divide the batch evenly)")
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--ny", type=int, default=96)
    ap.set_defaults(steps=200, dt=0.004, viscosity=1e-4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    grid = Grid(nx=args.nx, ny=args.ny, lx=30.0, ly=10.0,
                obstacles=(Cylinder(7.5, 5.0, 0.75),))
    # while_loop trip counts are per-element: use masked iteration.
    scene = make_scene(grid, params_from_args(args),
                       solver_options_for(Semantics.RUST, early_exit=False))
    B = args.batch
    nus = np.geomspace(1e-5, 1e-2, B).astype(np.float32)
    base = scene.init_state()
    batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                           base)
    batched = dataclasses.replace(batched, nu=jnp.asarray(nus))

    if args.shard_batch:
        # Serving-style data parallelism: place the batch axis over the
        # devices; GSPMD propagates the sharding through the vmapped
        # scan with ZERO collectives (tests/test_sharding.py). The
        # Pallas ensemble kernel carries no GSPMD rules -> jnp impls.
        import dataclasses as _dc
        from ..shard.mesh import make_mesh, shard_batch
        scene = make_scene(grid, scene.params, _dc.replace(
            scene.opts, pressure_impl="jnp", substep_impl="jnp"))
        mesh = make_mesh(axis="b")
        batched = shard_batch(batched, mesh)

    def chunk_fn(s):
        def body(s, _):
            s, d = jax.vmap(partial(step_fn, scene))(s)
            return s, None
        return jax.lax.scan(body, s, None, length=args.chunk)[0]

    run = jax.jit(chunk_fn)
    # First chunk compiles (60-180s on the axon remote compiler);
    # excluded from throughput.
    t0 = time.perf_counter()
    batched = run(batched)
    _ = float(batched.res_u[0])
    print(f"compile + first chunk: {time.perf_counter() - t0:.1f}s")
    done = args.chunk
    t_total = 0.0
    while done < args.steps:
        t0 = time.perf_counter()
        batched = run(batched)
        _ = float(batched.res_u[0])
        t_total += time.perf_counter() - t0
        done += args.chunk
        print(f"step {done}: {B * args.chunk / (t_total / max(1, (done - args.chunk) // args.chunk)):.1f} "
              f"scene-steps/s")

    u = np.asarray(batched.u)
    assert np.isfinite(u).all()
    timed_steps = done - args.chunk
    if timed_steps > 0 and t_total > 0:
        cu = B * timed_steps * grid.nx * grid.ny / t_total
        print(f"ensemble of {B} scenes x {timed_steps} timed steps: "
              f"{cu:.3e} cell-updates/s aggregate")
    # Spread across the sweep confirms per-element independence.
    print("max|u| per nu decile:",
          np.round([abs(u[k]).max() for k in range(0, B, max(B // 8, 1))], 3))
    return 0


if __name__ == "__main__":
    sys.exit(main())
