#!/usr/bin/env python
"""Round-3 probe: 16384^2 solve -- large-window 2-D tiles vs the 1-D
bs=128 winner (109.9 ms). With the raised limit, 256x8192 tiles fit
(67 MB scoped) at 1.16x redundancy vs 1-D's 1.25x.

    setsid python -u tools/probe_16384_r3.py > /tmp/probe_16384_r3.log 2>&1 &
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

N = 16384
ITERS = 50
L_SHORT, L_LONG = 2, 6
LIMIT = 100 * 1024 * 1024
results = []


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

    def chain_1d(pp, rhs, k, bs):
        halo = K._halo8(k)
        budget = (2 * (bs + 2 * halo) + bs) * N * 4
        n_full, rem = ITERS // k, ITERS % k
        for kk in [k] * n_full + ([rem] if rem else []):
            pp, _ = K.jacobi_fused_k(pp, rhs, dx, dy, 0.75, kk,
                                     block_rows=bs, deep=False,
                                     window_budget=budget,
                                     vmem_limit=LIMIT)
        return pp

    def chain_2d(pp, rhs, k, bs, bsx):
        n_full, rem = ITERS // k, ITERS % k
        for kk in [k] * n_full + ([rem] if rem else []):
            pp, _ = K._fused_k_2d(pp, rhs, dx, dy, 0.75, kk, bs, bsx, N,
                                  False, vmem_limit=LIMIT)
        return pp

    def timed(tag, solve):
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
                float(o[5, 5])
                t0 = time.perf_counter()
                o = fns[L](pp0, rhs)
                float(o[5, 5])
                ts[L] = time.perf_counter() - t0
            ms = (ts[L_LONG] - ts[L_SHORT]) / (L_LONG - L_SHORT) * 1e3
            out.update(ok=True, ms_solve=round(ms, 1))
        except Exception as e:  # noqa: BLE001
            out.update(ok=False, error=f"{type(e).__name__}: {str(e)[:200]}")
        print(json.dumps(out), flush=True)
        results.append(out)
        with open("/tmp/probe_16384_r3.json", "w") as f:
            json.dump(results, f, indent=1)

    timed("1d_k16_bs128", lambda p, r: chain_1d(p, r, 16, 128))
    timed("2d_k16_256x8192", lambda p, r: chain_2d(p, r, 16, 256, 8192))
    timed("2d_k16_512x4096", lambda p, r: chain_2d(p, r, 16, 512, 4096))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
