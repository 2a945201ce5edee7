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
T = 512                     # chained block-ops per launch
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
    adj = lax.broadcasted_iota(jnp.int32, (1, NL), 1) == 1

    rates = {}
    rates["fma"] = measure("fma", lambda x, y: 1.0000001 * x + y)
    rates["add"] = measure("add", lambda x, y: x + y)
    rates["lane_roll"] = measure(
        "lane_roll", lambda x, y: pltpu.roll(x, 1, 1))
    rates["sublane_roll"] = measure(
        "sublane_roll", lambda x, y: pltpu.roll(x, 1, 0))
    rates["select"] = measure(
        "select", lambda x, y: jnp.where(adj, y, x))

    # cross-check: one full sweep-iteration body (the real op mix,
    # minus windowing/DMA) -- composed floor should predict this
    def sweep(x, y):
        E = pltpu.roll(x, NL - 1, 1)
        W = pltpu.roll(x, 1, 1)
        N = pltpu.roll(x, BS - 1, 0)
        S = pltpu.roll(x, 1, 0)
        W = jnp.where(adj, x, W)
        E = jnp.where(adj, 0.0, E)
        return 0.2499 * (E + W) + 0.2499 * (N + S) + 0.0001 * x - y
    rates["sweep_iter"] = measure("sweep_iter", sweep)

    # ALU composition of the update: 2 add + 1 mul + 2 fma + 1 sub,
    # counting mul/sub at the fma rate (same issue slot).
    alu_t = 6.0 / rates["fma"]
    t_floor = (2.0 / rates["lane_roll"] + 2.0 / rates["sublane_roll"]
               + 2.0 / rates["select"] + alu_t)
    pred_sweep = 1.0 / t_floor
    meas_sweep = rates["sweep_iter"]
    print(f"\ncomposed floor {pred_sweep / 1e9:.1f} G cell-iters/s vs "
          f"measured single-block sweep {meas_sweep / 1e9:.1f} G "
          f"({meas_sweep / pred_sweep:.2f}x of composition)", flush=True)

    # solve-level comparison (docs/PERF.md item 22 measurements)
    solves = {
        "8192^2 (red 1.06, 23.29 ms/48it)": (8192 * 8192, 48, 23.29e-3, 1.06),
        "16384^2 (red 1.25, 102.9 ms/48it)": (16384 * 16384, 48, 102.9e-3,
                                              1.25),
    }
    out = {"rates": {k: v for k, v in rates.items()},
           "floor_cell_iters_per_s": pred_sweep}
    for tag, (cells, iters, secs, red) in solves.items():
        meas = cells * iters / secs
        floor_ms = cells * iters * red * t_floor * 1e3
        pct = 100.0 * floor_ms / (secs * 1e3)
        print(f"{tag}: measured {meas / 1e9:.0f} G cell-iters/s; "
              f"roofline floor {floor_ms:.1f} ms vs measured "
              f"{secs * 1e3:.1f} ms -> at {pct:.0f}% of floor", flush=True)
        out[tag] = {"measured_ms": secs * 1e3, "floor_ms": floor_ms,
                    "pct_of_floor": pct}
    with open("/tmp/roofline_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
