"""In-VMEM pressure-projection kernel for small single-scene grids.

The reference's own default workloads (Rust 800x264, model.rs defaults
via src/app.rs:33-53; JS 400x132, index.html:107-108) are far below
the >= 2M-cell threshold where the tiled fused-substep kernels pay
off, so they previously ran the pure-XLA substep: tens of small
latency-floor passes per step -- ~105 Jacobi sweeps x pass overhead in
reference mode (up to 21 corrector rounds x 50 iterations,
model.rs:696-724).

At these sizes the WHOLE projection fits in VMEM. This kernel fuses
everything after the predictor into one launch:

    Jacobi solve (lax.while_loop, exact single-iteration early exit)
    -> corrector -> outer corrector rounds (lax.while_loop, each
    re-running divergence + warm-started Jacobi + corrector) -> BCs

reusing the shared ops (ops.corrector.correct, ops.divergence
.divergence_rhs, ops.bc.apply_bcs, core.masks.masks_traced) through
the whole-scene stencil provider (kernels.substep_pallas.RollCtx at
halo 0) and the in-kernel Jacobi factory
(kernels.ensemble_pallas.make_jacobi_solve). Semantics are exactly
ops.poisson.jacobi + solver.piso._outer_rounds: per-iteration and
per-round early exits happen at their true trip counts.

Outputs use ANY memory space with explicit DMA writes so only the five
working windows and the live temporaries count against the scoped-VMEM
limit (the gate budgets 13 whole-scene windows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import FlowCase, Grid, Semantics
from ..core.masks import masks_traced
from ..ops.bc import apply_bcs
from ..ops.corrector import correct
from ..ops.divergence import divergence_rhs
from .ensemble_pallas import make_jacobi_solve
from .substep_pallas import RollCtx, _round_up

_N_WINDOWS = 13
_VMEM_LIMIT = 14 * 1024 * 1024


def rounds_pallas_ok(grid: Grid) -> bool:
    ny = grid.ny
    nxp = _round_up(grid.nx + 1, 128)
    return (ny % 8 == 0 and ny >= 8
            and _N_WINDOWS * ny * nxp * 4 <= _VMEM_LIMIT)


def _kernel_rounds(scal_ref, us_hbm, vs_hbm, p_hbm, pp_hbm, rhs_hbm,
                   u_out, v_out, p_out, pp_out, err_ref,
                   u_w, v_w, p_w, pp_w, rhs_w, sem,
                   *, grid, semantics, profile, flow_case, ny, nx, nxp,
                   omega, jtol, jiters, rounds, outer_tol):
    cavity = flow_case == FlowCase.CAVITY
    cps = [pltpu.make_async_copy(h, w_, sem.at[k])
           for k, (h, w_) in enumerate(
               ((us_hbm, u_w), (vs_hbm, v_w), (p_hbm, p_w),
                (pp_hbm, pp_w), (rhs_hbm, rhs_w)))]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    dt_sub = scal_ref[0]
    inlet = scal_ref[1]
    ctx = RollCtx(0, ny, nxp)
    _, _, mask_u_bc, mask_v_bc = masks_traced(
        grid, semantics, jnp.float32, ctx=ctx, shp_u=(ny, nxp),
        shp_v=(ny, nxp))
    jacobi_solve = make_jacobi_solve(
        pp_w, rhs_w, ny=ny, nx=nx, nxp=nxp, dx=grid.dx, dy=grid.dy,
        omega=omega, jtol=jtol, jiters=jiters, cavity=cavity)

    err0 = jacobi_solve()
    # u_w/v_w hold u*/v* on entry; the corrector overwrites them with
    # the projected fields (model.rs:696-724 copies stars <- u,v each
    # round, so the same refs serve every round).
    u1, v1, p1 = correct(u_w[:], v_w[:], p_w[:], pp_w[:], dt_sub,
                         grid.dx, grid.dy, ctx=ctx, nx=nx)
    u_w[:] = u1
    v_w[:] = v1
    p_w[:] = p1

    if rounds > 0:
        def rcond(c):
            err, it = c
            return jnp.logical_and(it < rounds, err >= outer_tol)

        def rbody(c):
            _, it = c
            rhs_w[:] = divergence_rhs(u_w[:], v_w[:], dt_sub, grid.dx,
                                      grid.dy, ctx=ctx,
                                      out_shape=(ny, nxp))
            err2 = jacobi_solve()
            u2, v2, p2 = correct(u_w[:], v_w[:], p_w[:], pp_w[:],
                                 dt_sub, grid.dx, grid.dy, ctx=ctx,
                                 nx=nx)
            u_w[:] = u2
            v_w[:] = v2
            p_w[:] = p2
            return err2, it + 1

        err, _ = lax.while_loop(rcond, rbody, (err0, jnp.int32(0)))
    else:
        err = err0

    uf, vf = apply_bcs(u_w[:], v_w[:], grid, profile, inlet,
                       mask_u_bc, mask_v_bc, flow_case, ctx=ctx)
    u_w[:] = uf
    v_w[:] = vf
    outs = [pltpu.make_async_copy(w_, o, sem.at[k])
            for k, (w_, o) in enumerate(
                ((u_w, u_out), (v_w, v_out), (p_w, p_out),
                 (pp_w, pp_out)))]
    for cp in outs:
        cp.start()
    for cp in outs:
        cp.wait()
    err_ref[0, 0] = err


def solve_correct_rounds_pallas(u_star, v_star, p, pp0, rhs, dt_sub,
                                inlet, scene, interpret: bool = False):
    """Fused solve + corrector + outer rounds + BCs for one scene.
    ``u_star`` (ny, nx+1); ``v_star``, ``p``, ``pp0``, ``rhs``
    (ny, nx). Returns (u, v, p, p_prime, err)."""
    g, opts = scene.grid, scene.opts
    ny, nx = g.ny, g.nx
    nxp = _round_up(nx + 1, 128)
    pad_u = ((0, 0), (0, nxp - (nx + 1)))
    pad_p = ((0, 0), (0, nxp - nx))
    usp = jnp.pad(u_star, pad_u)
    vsp = jnp.pad(v_star, pad_p)
    pa = jnp.pad(p, pad_p)
    ppa = jnp.pad(pp0, pad_p)
    rha = jnp.pad(rhs, pad_p)
    scal = jnp.stack([jnp.asarray(dt_sub, jnp.float32),
                      jnp.asarray(inlet, jnp.float32)])
    kern = functools.partial(
        _kernel_rounds, grid=g, semantics=opts.semantics,
        profile=scene.params.inlet_profile,
        flow_case=scene.params.flow_case, ny=ny, nx=nx, nxp=nxp,
        omega=opts.jacobi_omega, jtol=opts.jacobi_tol,
        jiters=opts.jacobi_iters, rounds=opts.outer_corrector_rounds,
        outer_tol=opts.outer_corrector_tol)
    uo, vo, po, ppo, err = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), u_star.dtype)] * 4
        + [jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((ny, nxp), u_star.dtype)] * 5
        + [pltpu.SemaphoreType.DMA((5,))],
        interpret=interpret,
    )(scal, usp, vsp, pa, ppa, rha)
    return (uo[:, :nx + 1], vo[:, :nx], po[:, :nx], ppo[:, :nx],
            err[0, 0])
