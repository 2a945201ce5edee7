#!/usr/bin/env python
"""Bench + numerics check: interleaved Pallas multigrid V-cycle
(kernels.mg_pallas) vs the XLA V-cycle kit (ops.poisson._mg_*) on the
real chip.

    python tools/bench_mg.py [--sizes 512 1024 2048 4096]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cfd_demo_tpu.core.config import Semantics, solver_options_for
    from cfd_demo_tpu.kernels.mg_pallas import (multigrid_pallas,
                                                multigrid_pallas_ok)
    from cfd_demo_tpu.ops.poisson import _mg_residual, _mg_vcycle

    print("backend:", jax.default_backend())
    opts = solver_options_for(Semantics.JS)

    def xla_mg(pp0, rhs, dx, dy):
        pp = jnp.zeros_like(pp0)
        for _ in range(opts.mg_cycles):
            pp = _mg_vcycle(pp, rhs, dx, dy, opts)
        return pp, jnp.max(jnp.abs(_mg_residual(pp, rhs, dx, dy)))

    for n in args.sizes:
        ny = nx = n
        dx = dy = 1.0 / n
        rhs = jnp.asarray(
            np.random.default_rng(0).standard_normal((ny, nx)), jnp.float32)
        pp0 = jnp.zeros((ny, nx), jnp.float32)
        print(f"n={n} pallas_ok={multigrid_pallas_ok(ny, nx)}")
        fx = jax.jit(lambda r: xla_mg(pp0, r, dx, dy))
        fp = jax.jit(lambda r: multigrid_pallas(pp0, r, dx, dy, opts))
        ref, err_ref = fx(rhs)
        got, err_got, _ = fp(rhs)
        float(err_ref), float(err_got)
        print(f"  maxdiff={float(jnp.max(jnp.abs(ref - got))):.3e} "
              f"err_ref={float(err_ref):.4e} err_got={float(err_got):.4e}")
        for name, f in (("xla", fx), ("pallas", fp)):
            out = f(rhs)
            float(out[1])  # axon: block_until_ready is a no-op
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = f(rhs)
            float(out[1])
            ms = (time.perf_counter() - t0) / args.reps * 1e3
            print(f"  {name}: {ms:.2f} ms/solve ({opts.mg_cycles} V-cycles)")


if __name__ == "__main__":
    main()
