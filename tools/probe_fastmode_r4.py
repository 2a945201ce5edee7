#!/usr/bin/env python
"""Round-4 fast-mode op-count probes (VERDICT r3 item 2).

The 50-iteration Jacobi solve at 8192^2/16384^2 is measured
VPU-/compute-bound at 1.06-1.25x window redundancy (docs/PERF.md items
15-17): per iteration the sweep costs 2 lane rolls + 2 sublane rolls +
2 column-fold selects + ~6 fma/adds. This probe measures the remaining
structural levers on the REAL sweep kernel shapes:

1. unroll2: two iterations per fori_loop trip (halves loop-carried
   control overhead; op count per iteration unchanged).
2. j2-algebra check (analysis, printed): the fused double iteration
   J^2 p = (1-w)^2 p + 2w(1-w)/D Sp + (w/D)^2 S(Sp) - rhs2 still
   applies the stencil operator S twice per 2 iterations -- identical
   roll/select/fma counts to two plain sweeps; only the rhs
   subtraction (1 op of ~10) folds into a precomputed rhs2. Direct
   distance-2 evaluation of S^2 needs 4 distance-2 rolls + 4 diagonal
   terms -- MORE rolls, not fewer.

Run detached on the TPU: setsid python -u tools/probe_fastmode_r4.py
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from cfd_demo_tpu.kernels.jacobi_pallas import (  # noqa: E402
    _LARGE_VMEM_LIMIT, _compiler_params, _halo8)


def _kernel_u(pp_hbm, rhs_hbm, out_ref, err_ref, pp_win, rhs_win, sem,
              *, ny, nx, nxp, bs, halo, k, dx2, dy2, omega, unroll):
    """Copy of the production sweep body (interior windows, folded
    reads) with a configurable per-trip unroll -- the only variable
    under test."""
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    start = pl.multiple_of(jnp.clip(((row0 - k) // 8) * 8, 0, ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)
    cp1 = pltpu.make_async_copy(pp_hbm.at[pl.ds(start, w), :], pp_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    gr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    gc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    owned_r = ((gr >= jnp.maximum(1, row0))
               & (gr <= jnp.minimum(ny - 2, row0 + bs - 1)))
    owned_c = (gc >= 1) & (gc <= nx - 2)
    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    rhs_win[:] = ar * rhs_win[:]
    adj_left = gc == 1
    adj_right = gc == nx - 2

    def iterate(want_err):
        pp = pp_win[:]
        E = pltpu.roll(pp, nxp - 1, 1)
        W = pltpu.roll(pp, 1, 1)
        N = pltpu.roll(pp, w - 1, 0)
        S = pltpu.roll(pp, 1, 0)
        W = jnp.where(adj_left, pp, W)
        E = jnp.where(adj_right, 0.0, E)
        new = ax * (E + W) + ay * (N + S) + ac * pp - rhs_win[:]
        err = (jnp.max(jnp.where(owned_r & owned_c,
                                 jnp.abs(new - pp), 0.0))
               if want_err else jnp.float32(0.0))
        pp_win[:] = new
        return err

    n_trips = (k - 1) // unroll

    def trip(_, c):
        for _u in range(unroll):
            iterate(False)
        return c

    lax.fori_loop(0, n_trips, trip, 0)
    for _u in range((k - 1) - n_trips * unroll):
        iterate(False)
    err = iterate(True)
    out_cp = pltpu.make_async_copy(pp_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()
    err_ref[i, 0] = err


def make_solve(ny, nx, k, iters, bs, unroll):
    nxp = nx
    halo = _halo8(k)
    w = bs + 2 * halo
    kern = functools.partial(_kernel_u, ny=ny, nx=nx, nxp=nxp, bs=bs,
                             halo=halo, k=k, dx2=1e-6, dy2=1e-6,
                             omega=0.75, unroll=unroll)
    call = pl.pallas_call(
        kern, grid=(ny // bs,),
        compiler_params=_compiler_params(_LARGE_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((ny // bs, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), jnp.float32),
                   jax.ShapeDtypeStruct((ny // bs, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((w, nxp), jnp.float32),
                        pltpu.VMEM((w, nxp), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])

    def run(p, r):
        def body(pc, _):
            p2, _e = call(pc, r)
            return p2, None

        p, _ = lax.scan(body, p, None, length=iters // k)
        return p

    return jax.jit(run)


def timed(tag, n, solve50, iters=50):
    """Marginal in-scan cost of one 50-iteration solve (L=3 vs L=13
    scans, cancelling the fixed axon dispatch cost -- the r3 probe
    protocol)."""
    rng = np.random.default_rng(0)
    pp = jnp.asarray(rng.standard_normal((n, n)) * 0.1, jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    fns = {L: jax.jit(functools.partial(
        lambda p, r, L: lax.scan(lambda c, _: (solve50(c, r), None),
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
    print(f"{tag}: {ms:.2f} ms/solve "
          f"({rate / 1e9:.0f}G cell-iters/s)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    from cfd_demo_tpu.kernels import jacobi_pallas as K
    import sys as _sys
    cases = ((8192, 256), (16384, 128))
    if len(_sys.argv) > 1:
        cases = tuple(c for c in cases if c[0] == int(_sys.argv[1]))
    for n, bs in cases:
        dx = 30.0 / n

        def prod(p, r):
            for kk in (16, 16, 16):
                p, _ = K.jacobi_fused_k(p, r, dx, dx, 0.75, kk,
                                        deep=False)
            p, _ = K.jacobi_fused_k(p, r, dx, dx, 0.75, 2, deep=False)
            return p

        timed(f"n={n} production jacobi_fused_k k=16", n, prod)
        for unroll in (1, 2, 4):
            calls = make_solve(n, n, 16, 48, bs, unroll)

            def probe(p, r, calls=calls):
                return calls(p, r)

            timed(f"n={n} probe bs={bs} unroll={unroll} (48 it)", n,
                  probe, iters=48)


if __name__ == "__main__":
    main()
