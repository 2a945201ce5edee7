#!/usr/bin/env python
"""Round-3 probe: 8192^2 fast-mode Jacobi solve tile/k ladder.

VERDICT r2 item 2: the 50-iteration solve measures 40.2 ms at 8192^2 vs
a ~20 ms DMA+compute roofline; causes named as 2-D tile-read redundancy
(1.41-1.69x) and lane-roll cost. The round-3 lean-mask kernel rewrite
(1-D row/col predicates instead of window-sized iota/bool buffers)
frees Mosaic scoped-VMEM, so larger/taller tiles may now compile.

This ladder times the full 50-iteration solve (launch chain exactly as
jacobi_pallas builds it: floor(50/k) full launches + remainder) for a
grid of (k, bs, bsx) tile configs, in-scan amortized (marginal cost
between scan lengths, cancelling the fixed axon dispatch cost).

Run DETACHED on the TPU (compiles are 60-180 s each):
    setsid python -u tools/probe_jacobi_r3.py > /tmp/probe_jacobi_r3.log 2>&1 &
Writes /tmp/probe_jacobi_r3.json as it goes.
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
ITERS = 50
L_SHORT, L_LONG = 3, 13

RESULTS_PATH = "/tmp/probe_jacobi_r3.json"


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_demo_tpu.kernels import jacobi_pallas as K
    from cfd_demo_tpu.ops.poisson import _apply_pprime_bcs

    dx = dy = 30.0 / N
    rng = np.random.default_rng(0)
    pp0 = _apply_pprime_bcs(
        jnp.asarray(rng.standard_normal((N, N)) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)

    def chain_2d(pp, rhs, k, bs, bsx):
        n_full, rem = ITERS // k, ITERS % k
        for _ in range(n_full):
            pp, _ = K._fused_k_2d(pp, rhs, dx, dy, 0.75, k, bs, bsx, N,
                                  False)
        if rem:
            pp, _ = K._fused_k_2d(pp, rhs, dx, dy, 0.75, rem, bs, bsx, N,
                                  False)
        return pp

    def chain_auto(pp, rhs, k):
        n_full, rem = ITERS // k, ITERS % k
        for _ in range(n_full):
            pp, _ = K.jacobi_fused_k(pp, rhs, dx, dy, 0.75, k, deep=False)
        if rem:
            pp, _ = K.jacobi_fused_k(pp, rhs, dx, dy, 0.75, rem,
                                     deep=False)
        return pp

    def timed(tag, solve):
        """Marginal in-scan cost of one 50-iteration solve."""
        out = {"tag": tag}
        try:
            fns = {}
            for L in (L_SHORT, L_LONG):
                fns[L] = jax.jit(functools.partial(
                    lambda p, r, L: lax.scan(
                        lambda c, _: (solve(c, r), None),
                        p, None, length=L)[0], L=L))
            ts = {}
            for L in (L_SHORT, L_LONG):
                o = fns[L](pp0, rhs)
                float(o[5, 5])  # sync (block_until_ready no-op on axon)
                t0 = time.perf_counter()
                o = fns[L](pp0, rhs)
                float(o[5, 5])
                ts[L] = time.perf_counter() - t0
            ms = (ts[L_LONG] - ts[L_SHORT]) / (L_LONG - L_SHORT) * 1e3
            out.update(ok=True, ms_solve=round(ms, 2),
                       t_short=round(ts[L_SHORT], 3),
                       t_long=round(ts[L_LONG], 3))
        except Exception as e:  # noqa: BLE001 - record compile OOMs etc.
            out.update(ok=False, error=f"{type(e).__name__}: {str(e)[:300]}")
        print(json.dumps(out), flush=True)
        results.append(out)
        with open(RESULTS_PATH, "w") as f:
            json.dump(results, f, indent=1)
        return out

    results = []
    print(f"probe N={N} iters={ITERS} backend={jax.default_backend()}",
          flush=True)

    # Baseline: the current auto resolution at this size (k=25).
    timed("auto_k25", lambda p, r: chain_auto(p, r, 25))
    # k ladder at the current 128x2048 tiles.
    timed("2d_k25_128x2048", lambda p, r: chain_2d(p, r, 25, 128, 2048))
    timed("2d_k16_128x2048", lambda p, r: chain_2d(p, r, 16, 128, 2048))
    timed("2d_k10_128x2048", lambda p, r: chain_2d(p, r, 10, 128, 2048))
    # Taller tiles (same window area, less row redundancy).
    timed("2d_k25_256x1024", lambda p, r: chain_2d(p, r, 25, 256, 1024))
    # Bigger windows -- only compile if the lean-mask rewrite freed
    # enough scoped VMEM.
    timed("2d_k25_256x2048", lambda p, r: chain_2d(p, r, 25, 256, 2048))
    timed("2d_k10_256x2048", lambda p, r: chain_2d(p, r, 10, 256, 2048))
    timed("2d_k16_256x2048", lambda p, r: chain_2d(p, r, 16, 256, 2048))
    timed("2d_k10_512x2048", lambda p, r: chain_2d(p, r, 10, 512, 2048))
    timed("2d_k10_256x4096", lambda p, r: chain_2d(p, r, 10, 256, 4096))
    # Single launch, whole solve (DMA 1x, redundancy 2.11x).
    timed("2d_k50_128x2048", lambda p, r: chain_2d(p, r, 50, 128, 2048))

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
