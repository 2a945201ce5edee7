#!/usr/bin/env python
"""Round-3 MGP phase attribution at 8192^2: where do the ~35-40 ms per
V-cycle go? In-scan timings of the aligned cycle and its pieces
(subject to the isolated-op caveat of docs/PERF.md "Measurement
traps" -- read differentially).

    setsid python -u tools/probe_mgp_phase_r3.py > /tmp/probe_mgp_phase.log 2>&1 &
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402

N = int(os.environ.get("PROBE_N", "8192"))
L_SHORT, L_LONG = 2, 10
results = []


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_demo_tpu import Semantics, solver_options_for
    from cfd_demo_tpu.ops import poisson as P

    opts = solver_options_for(Semantics.RUST, outer_corrector_rounds=0)
    dx = dy = 30.0 / N
    rng = np.random.default_rng(0)
    pp0 = P._apply_pprime_bcs(
        jnp.asarray(rng.standard_normal((N, N)) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
    bc = P._apply_pprime_bcs

    def timed(tag, fn):
        out = {"tag": tag}
        try:
            fns = {}
            for L in (L_SHORT, L_LONG):
                fns[L] = jax.jit(functools.partial(
                    lambda p, r, L: lax.scan(
                        lambda c, _: (fn(c, r), None), p, None,
                        length=L)[0], L=L))
            ts = {}
            for L in (L_SHORT, L_LONG):
                o = fns[L](pp0, rhs)
                float(o[5, 5])
                t0 = time.perf_counter()
                o = fns[L](pp0, rhs)
                float(o[5, 5])
                ts[L] = time.perf_counter() - t0
            ms = (ts[L_LONG] - ts[L_SHORT]) / (L_LONG - L_SHORT) * 1e3
            out.update(ok=True, ms=round(ms, 2))
        except Exception as e:  # noqa: BLE001
            out.update(ok=False, error=f"{type(e).__name__}: {str(e)[:200]}")
        print(json.dumps(out), flush=True)
        results.append(out)
        with open("/tmp/probe_mgp_phase.json", "w") as f:
            json.dump(results, f, indent=1)

    # full aligned V-cycle
    timed("vcycle", lambda p, r: P._mgp_vcycle_aligned(p, r, dx, dy,
                                                       opts, bc)[0])
    # fused smooth+res, pre (emits r) and post (metric only) positions
    timed("smooth_res_pre", lambda p, r: P._mgp_smooth_res_auto(
        p, r, dx, dy, opts.jacobi_omega, opts.mgp_smooth, bc, opts)[0])
    timed("smooth_res_post", lambda p, r: P._mgp_smooth_res_auto(
        p, r, dx, dy, opts.jacobi_omega, opts.mgp_smooth, bc, opts,
        need_res=False)[0])
    # the whole coarse-correction chain (restrict -> coarse V -> prolong)
    timed("correction", lambda p, r: p + P._mgp_aligned_correction(
        P._mg_residual(p, r, dx, dy), dx, dy, opts, True))
    # the raw residual pass alone (XLA)
    timed("residual_xla", lambda p, r: P._mg_residual(p, r, dx, dy))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
