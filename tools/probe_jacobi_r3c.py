#!/usr/bin/env python
"""Round-3 probe C: large-window 1-D ladder across grid sizes.

Probe B found: at 8192^2 the raised vmem limit admits full-width 1-D
row blocks (bs=256 k=16 -> 24.4 ms vs the 2-D tiling's 32.6); the
scoped cost model calibrated there is (6w + bs) * nxp * 4 <= ~96 MB
(bs=512 at 124 MB failed, bs=256 at 65 MB ran).

This probe maps the per-size winners for the production auto rule:
2048^2 / 4096^2 / 16384^2 solve ladder + 8192^2 confirmation.

    setsid python -u tools/probe_jacobi_r3c.py > /tmp/probe_jacobi_r3c.log 2>&1 &
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

ITERS = 50
LIMIT = 100 * 1024 * 1024
RESULTS_PATH = "/tmp/probe_jacobi_r3c.json"


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_demo_tpu.kernels import jacobi_pallas as K
    from cfd_demo_tpu.ops.poisson import _apply_pprime_bcs

    results = []

    def run_size(N, configs, l_short=3, l_long=13):
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

        def chain_auto(pp, rhs):
            k = 25 if N * N >= 48_000_000 else 16
            n_full, rem = ITERS // k, ITERS % k
            for kk in [k] * n_full + ([rem] if rem else []):
                pp, _ = K.jacobi_fused_k(pp, rhs, dx, dy, 0.75, kk,
                                         deep=False)
            return pp

        def timed(tag, solve):
            out = {"tag": f"{N}:{tag}"}
            try:
                fns = {}
                for L in (l_short, l_long):
                    fns[L] = jax.jit(functools.partial(
                        lambda p, r, L: lax.scan(
                            lambda c, _: (solve(c, r), None),
                            p, None, length=L)[0], L=L))
                ts = {}
                for L in (l_short, l_long):
                    o = fns[L](pp0, rhs)
                    float(o[5, 5])
                    t0 = time.perf_counter()
                    o = fns[L](pp0, rhs)
                    float(o[5, 5])
                    ts[L] = time.perf_counter() - t0
                ms = (ts[l_long] - ts[l_short]) / (l_long - l_short) * 1e3
                out.update(ok=True, ms_solve=round(ms, 3))
            except Exception as e:  # noqa: BLE001
                out.update(ok=False,
                           error=f"{type(e).__name__}: {str(e)[:200]}")
            print(json.dumps(out), flush=True)
            results.append(out)
            with open(RESULTS_PATH, "w") as f:
                json.dump(results, f, indent=1)

        timed("auto_current", chain_auto)
        for (k, bs) in configs:
            timed(f"1d_k{k}_bs{bs}", functools.partial(chain_1d, k=k, bs=bs))

    # 2048^2: current auto is 1-D bs=256 k16 already (7 MiB budget);
    # test taller blocks.
    run_size(2048, [(16, 512), (16, 1024)], l_short=5, l_long=45)
    # 4096^2: current 1-D bs=128; test 256/512.
    run_size(4096, [(16, 256), (16, 512)], l_short=3, l_long=23)
    # 8192^2 confirmation at scan lengths matching probe B.
    run_size(8192, [(16, 256)])
    # 16384^2: current auto = 2-D 128x2048; full-width bs=128.
    run_size(16384, [(16, 128), (8, 128)], l_short=2, l_long=6)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
