#!/usr/bin/env python
"""Round-4 A/B: color-compressed red/black SOR kernel (sor_pallas_rb2)
vs the uncompressed fused kernel (sor_pallas), 50-iteration solves at
2048^2..16384^2 -- marginal in-scan protocol (L=3 vs 13).

Run detached, ONE AT A TIME on the chip:
    setsid python -u tools/probe_sor_rb2.py > /tmp/probe_sor_rb2.log 2>&1 &
"""
import functools
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def timed(tag, n, solve, iters):
    rng = np.random.default_rng(0)
    pp = jnp.asarray(rng.standard_normal((n, n)) * 0.1, jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    fns = {L: jax.jit(functools.partial(
        lambda p, r, L: lax.scan(lambda c, _: (solve(c, r), None),
                                 p, None, length=L)[0], L=L))
        for L in (3, 13)}
    ts = {}
    for L in (3, 13):
        o = fns[L](pp, rhs)
        float(o[5, 5])
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            o = fns[L](pp, rhs)
            float(o[5, 5])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ts[L] = best
    ms = (ts[13] - ts[3]) / 10 * 1e3
    rate = n * n * iters / (ms / 1e3)
    print(f"{tag}: {ms:.2f} ms/solve ({rate / 1e9:.0f}G cell-iters/s)",
          flush=True)


def main():
    from cfd_demo_tpu.kernels.sor_pallas import sor_pallas, sor_pallas_rb2
    print("backend:", jax.default_backend(), flush=True)
    for n in (2048, 4096, 8192, 16384):
        dx = 30.0 / n

        def base(p, r):
            return sor_pallas(p, r, dx, dx, 1.5, 0.0, 50, k=8,
                              early_exit=False)[0]

        def rb2(p, r):
            return sor_pallas_rb2(p, r, dx, dx, 1.5, 0.0, 50, k=8,
                                  early_exit=False)[0]

        timed(f"n={n} uncompressed k=8", n, base, 50)
        timed(f"n={n} rb2 compressed k=8", n, rb2, 50)


if __name__ == "__main__":
    main()
