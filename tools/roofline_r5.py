#!/usr/bin/env python
"""Round-5 VPU roofline (VERDICT r4 item 3): settle the fast-mode
1.8/1.7e9 bars with arithmetic, not hope.

The fused Jacobi sweep (kernels/jacobi_pallas.py _kernel) spends, per
cell-iteration (interior-window specialization, err every k-th iter):

    2 lane rolls + 2 sublane rolls        (E/W, N/S neighbor reads)
    2 selects, lane-predicated            (adj_left/adj_right folds)
    6 ALU ops (2 add, 1 mul, 2 fma, 1 sub) for
        new = ax*(E+W) + ay*(N+S) + ac*pp - rhs

This tool MEASURES the sustained per-element throughput of each
constituent op in the same Pallas environment (VMEM-resident block,
fori_loop chain of whole-block ops -- each block op is hundreds of
independent vreg ops, so the chain pipelines and measures throughput,
not latency), then composes the machine floor:

    t_floor/cell-iter = redundancy * (2/R_lane + 2/R_sub + 2/R_sel
                                      + 6/R_alu)

and compares against the measured solve rate at 8192^2/16384^2.
If measured >= ~90% of the floor, the bars are CLOSED at the machine
floor; otherwise the gap names the lever.

Run detached, one at a time on the chip:
    setsid python -u tools/roofline_r5.py > /tmp/roofline_r5.log 2>&1 &
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

BS, NL = 512, 1024          # 2 MB f32 block, VMEM-resident
T = 8192                    # chained block-ops per launch
# (512-op launches measured 100-500 us -- same order as the
# axon per-call jitter; the first probe pass returned negative
# marginal rates. 8192-op launches run 2-30 ms, putting the
# 10-launch L-delta 2-3 orders above the jitter.)
L_SHORT, L_LONG = 2, 12


def _mk(op_body):
    import jax
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, y_ref, o_ref):
        y = y_ref[:]

        def body(_, x):
            return op_body(x, y)

        o_ref[:] = lax.fori_loop(0, T, body, x_ref[:])

    def f(x, y):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((BS, NL), jnp_f32()),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, y)
    return f


def jnp_f32():
    import jax.numpy as jnp
    return jnp.float32


def measure(tag, op_body):
    """Marginal seconds per block-op via the in-scan L protocol;
    returns sustained elements/s for that op."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    f = _mk(op_body)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BS, NL)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((BS, NL)), jnp.float32)
    fns = {L: jax.jit(functools.partial(
        lambda x, y, L: lax.scan(lambda c, _: (f(c, y), None),
                                 x, None, length=L)[0], L=L))
        for L in (L_SHORT, L_LONG)}
    ts = {}
    for L in (L_SHORT, L_LONG):
        o = fns[L](x, y)
        float(o[0, 0])
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            o = fns[L](x, y)
            float(o[0, 0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ts[L] = best
    per_launch = (ts[L_LONG] - ts[L_SHORT]) / (L_LONG - L_SHORT)
    rate = BS * NL * T / per_launch
    print(f"{tag:>14}: {rate / 1e12:.3f} T elem-ops/s "
          f"({per_launch * 1e6:.0f} us / {T}-op launch)", flush=True)
    return rate


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)

    def adj():
        # built in-kernel (captured constants are rejected by pallas)
        return lax.broadcasted_iota(jnp.int32, (1, NL), 1) == 1

    rates = {}
    rates["fma"] = measure("fma", lambda x, y: 0.999 * x + y)
    rates["add"] = measure("add", lambda x, y: x + y)
    rates["mul"] = measure("mul", lambda x, y: x * y)
    rates["lane_roll"] = measure(
        "lane_roll", lambda x, y: pltpu.roll(x, 1, 1))
    rates["sublane_roll"] = measure(
        "sublane_roll", lambda x, y: pltpu.roll(x, 1, 0))
    rates["select"] = measure(
        "select", lambda x, y: jnp.where(adj(), y, x))

    # cross-check: one full sweep-iteration body (the real op mix,
    # minus windowing/DMA) -- composed floor should predict this
    def sweep(x, y):
        a = adj()
        E = pltpu.roll(x, NL - 1, 1)
        W = pltpu.roll(x, 1, 1)
        N = pltpu.roll(x, BS - 1, 0)
        S = pltpu.roll(x, 1, 0)
        W = jnp.where(a, x, W)
        E = jnp.where(a, 0.0, E)
        return 0.2499 * (E + W) + 0.2499 * (N + S) + 0.0001 * x - y
    rates["sweep_iter"] = measure("sweep_iter", sweep)

    # ANALYSIS (round-5 finding): the single-op chains are VMEM-
    # BANDWIDTH bound, not ALU bound -- each fori trip round-trips the
    # 2 MB block through VMEM for ONE vector op (~0.4-0.5 T elem-ops/s
    # ~ 3 TB/s of VMEM traffic), so composing a floor from them
    # under-predicts any multi-op kernel (the 14-op sweep body pays
    # the same per-trip VMEM round-trip ONCE). The honest machine
    # ceiling for the fused sweep is therefore the sweep_iter
    # microbench itself: the full per-iteration op mix on a
    # VMEM-resident block with NO windowing, DMA, halos or error
    # reduction. A solve cannot beat it without changing the op mix
    # (item 22: already minimal) or the data format (bf16: blocked).
    ceiling = rates["sweep_iter"]
    print(f"\nin-kernel sweep ceiling: {ceiling / 1e9:.1f} G "
          f"cell-iters/s (VMEM-resident, zero windowing)", flush=True)

    # solve-level utilization (docs/PERF.md item 22 measurements):
    # window redundancy converts the solve's owned-cell rate into the
    # window-cell rate the kernel actually sustains.
    solves = {
        "8192^2": (8192 * 8192, 48, 23.29e-3, 1.06),
        "16384^2": (16384 * 16384, 48, 102.9e-3, 1.25),
    }
    out = {"rates": {k: v for k, v in rates.items()},
           "sweep_ceiling_cell_iters_per_s": ceiling}
    for tag, (cells, iters, secs, red) in solves.items():
        meas = cells * iters / secs
        util = meas * red / ceiling
        print(f"{tag}: measured {meas / 1e9:.0f} G owned cell-iters/s "
              f"x {red} window redundancy = {meas * red / 1e9:.0f} G "
              f"window rate -> {100 * util:.0f}% of ceiling", flush=True)
        out[tag] = {"measured_ms": secs * 1e3, "redundancy": red,
                    "pct_of_ceiling": round(100 * util, 1)}

    # Bar feasibility: end-to-end fast-step bars (1.8e9 @ 8192^2,
    # 1.7e9 @ 16384^2) against the ceiling, using the measured
    # non-solve step remainder.
    bars = {"8192^2": (8192, 1.8e9, 40.4e-3 - 24.3e-3, 1.06),
            "16384^2": (16384, 1.7e9, 179.6e-3 - 107.2e-3, 1.25)}
    for tag, (n, bar, nonsolve, red) in bars.items():
        step_needed = n * n / bar
        solve_budget = step_needed - nonsolve
        need = n * n * 50 * red / solve_budget if solve_budget > 0 else float("inf")
        verdict = "UNREACHABLE" if need > ceiling else "reachable"
        print(f"bar {bar / 1e9:.1f}e9 @ {tag}: solve budget "
              f"{solve_budget * 1e3:.1f} ms -> needs {need / 1e9:.0f} G "
              f"window rate vs {ceiling / 1e9:.0f} G ceiling: {verdict}",
              flush=True)
        out[f"bar_{tag}"] = {"needed_window_rate": need,
                             "ceiling": ceiling, "verdict": verdict}
    with open("/tmp/roofline_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
