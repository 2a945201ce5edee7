"""Whole-scene-in-VMEM batched PISO substep kernel (vmap ensembles).

The 64-scene ensemble (SURVEY.md section 2.7; BASELINE config 5) runs
the step under jax.vmap. The XLA path pays one latency-floor HBM pass
per stencil/sweep over the whole batch (docs/PERF.md: ~0.29 ms per
elementwise pass at mid working sets), so a substep with its Jacobi
iterations and outer corrector rounds costs tens of passes regardless
of arithmetic. Ensemble scenes are small; here EACH PROGRAM RUNS ONE
SCENE'S ENTIRE SUBSTEP VMEM-RESIDENT in a single launch:

    predictor -> divergence -> Jacobi (while_loop, per-scene early
    exit) -> corrector -> outer corrector rounds (while_loop, each
    re-running divergence + warm-started Jacobi + corrector) -> BCs

Numerical identity with the XLA path is by construction: the kernel
calls the *same* ops (ops.predictor.predict, ops.divergence
.divergence_rhs, ops.corrector.correct, ops.bc.apply_bcs,
core.masks.masks_traced) through the window stencil provider
(kernels.substep_pallas.RollCtx) at halo 0 -- on a whole-scene window
the roll zero-fill IS the XLA edge semantics. The in-kernel Jacobi
reuses the boundary-read folding of kernels.jacobi_pallas._kernel
(per-iteration p' BCs collapse to one post-loop application;
bitwise-identical for BC-consistent p' input, which both the warm
start and the zero init satisfy).

Convergence semantics are the per-element-exact ones
(ops.poisson._masked_while / piso_substep's masked outer rounds):
every scene's while_loops run their own trip counts -- a scene that
converges in 12 Jacobi iterations does 12, not the batch maximum --
which both matches an unbatched early-exit run per element
(tests/test_sharding.py pins batched == unbatched) and skips the
masked-iteration waste of the XLA batch path.

Reference: the substep is model.rs:529-730 / index.html:366-867; the
outer corrector loop model.rs:696-724; the Jacobi model.rs:733-824.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import FlowCase, Grid, InletProfile, Semantics, VelocityScheme
from ..core.masks import masks_traced
from ..ops.bc import apply_bcs
from ..ops.corrector import correct
from ..ops.divergence import divergence_rhs
from ..ops.predictor import predict
from .substep_pallas import RollCtx, _round_up

# Whole-scene window refs (u, v, p, pp, rhs) + double-buffered output
# blocks + the predictor DAG's live temporaries, all (ny, nxp) f32.
_N_WINDOWS = 26
_VMEM_LIMIT = 14 * 1024 * 1024


def substep_batch_ok(grid: Grid) -> bool:
    ny = grid.ny
    nxp = _round_up(grid.nx + 1, 128)
    return (ny % 8 == 0 and ny >= 8
            and _N_WINDOWS * ny * nxp * 4 <= _VMEM_LIMIT)


def make_jacobi_solve(pp_w, rhs_w, *, ny, nx, nxp, dx, dy, omega, jtol,
                      jiters, cavity):
    """In-kernel damped-Jacobi solver factory over a whole-scene
    (ny, nxp) VMEM ref pair: returns ``solve() -> err`` running a
    do-while lax.while_loop with exact single-iteration early exit
    (ops.poisson.jacobi semantics; kernels.jacobi_pallas._kernel
    formulas with boundary-read folding -- the per-iteration p' BCs
    collapse to one post-loop application, bitwise-identical for
    BC-consistent p' input)."""
    gr = lax.broadcasted_iota(jnp.int32, (ny, nxp), 0)
    gc = lax.broadcasted_iota(jnp.int32, (ny, nxp), 1)
    interior = ((gr >= 1) & (gr <= ny - 2) & (gc >= 1) & (gc <= nx - 2))
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2
    dx2 = dx * dx
    dy2 = dy * dy
    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)

    def north(a):
        return pltpu.roll(a, ny - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def east(a):
        return pltpu.roll(a, nxp - 1, 1)

    def west(a):
        return pltpu.roll(a, 1, 1)

    def solve():
        rhs = ar * rhs_w[:]

        def cond(c):
            err, it = c
            return jnp.logical_or(
                it == 0, jnp.logical_and(it < jiters, err >= jtol))

        def body(c):
            _, it = c
            pp = pp_w[:]
            E = east(pp)
            W = west(pp)
            N = north(pp)
            S = south(pp)
            S = jnp.where(adj_bot, pp, S)
            N = jnp.where(adj_top, pp, N)
            W = jnp.where(adj_left, pp, W)
            E = (jnp.where(adj_right, pp, E) if cavity
                 else jnp.where(adj_right, 0.0, E))
            new = ax * (E + W) + ay * (N + S) + ac * pp - rhs
            err2 = jnp.max(jnp.where(interior, jnp.abs(new - pp), 0.0))
            pp_w[:] = jnp.where(interior, new, pp)
            return err2, it + 1

        err, _ = lax.while_loop(
            cond, body, (jnp.float32(jnp.inf), jnp.int32(0)))
        # p' BCs once, rows then columns (corner order; model.rs:807-815).
        pp = pp_w[:]
        pp = jnp.where(is_bot, north(pp), pp)
        pp = jnp.where(is_top, south(pp), pp)
        pp = jnp.where(is_left, east(pp), pp)
        if cavity:
            pp = jnp.where(is_right, west(pp), pp)
            pp = jnp.where(jnp.logical_and(is_bot, is_left), 0.0, pp)
        else:
            pp = jnp.where(is_right, 0.0, pp)
        pp_w[:] = pp
        return err

    return solve


def make_sor_solve(pp_w, rhs_w, *, ny, nx, nxp, dx, dy, omega, jtol,
                   jiters, cavity):
    """In-kernel red/black SOR twin of make_jacobi_solve
    (ops.poisson.sor semantics; kernels.sor_pallas._kernel formulas:
    two color half-sweeps per iteration, the black half reading the
    red half's updates, boundary-read folding valid because a boundary
    cell always mirrors the very neighbor that reads it and that
    neighbor cannot have changed between the end-of-iteration BC
    application and the read in either half)."""
    gr = lax.broadcasted_iota(jnp.int32, (ny, nxp), 0)
    gc = lax.broadcasted_iota(jnp.int32, (ny, nxp), 1)
    interior = ((gr >= 1) & (gr <= ny - 2) & (gc >= 1) & (gc <= nx - 2))
    red = interior & (((gr + gc) % 2) == 0)
    black = interior & (((gr + gc) % 2) == 1)
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / (dx2 * denom))
    by = jnp.float32(1.0 / (dy2 * denom))
    br = jnp.float32(1.0 / denom)
    om = jnp.float32(omega)

    def north(a):
        return pltpu.roll(a, ny - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def east(a):
        return pltpu.roll(a, nxp - 1, 1)

    def west(a):
        return pltpu.roll(a, 1, 1)

    def half(pp, mask, rhs):
        E = east(pp)
        W = west(pp)
        N = north(pp)
        S = south(pp)
        S = jnp.where(adj_bot, pp, S)
        N = jnp.where(adj_top, pp, N)
        W = jnp.where(adj_left, pp, W)
        E = (jnp.where(adj_right, pp, E) if cavity
             else jnp.where(adj_right, 0.0, E))
        update = bx * (E + W) + by * (N + S) - rhs
        new = (1.0 - om) * pp + om * update
        return jnp.where(mask, new, pp)

    def solve():
        rhs = br * rhs_w[:]

        def cond(c):
            err, it = c
            return jnp.logical_or(
                it == 0, jnp.logical_and(it < jiters, err >= jtol))

        def body(c):
            _, it = c
            old = pp_w[:]
            pp = half(old, red, rhs)
            pp = half(pp, black, rhs)
            err2 = jnp.max(jnp.where(interior, jnp.abs(pp - old), 0.0))
            pp_w[:] = pp
            return err2, it + 1

        err, _ = lax.while_loop(
            cond, body, (jnp.float32(jnp.inf), jnp.int32(0)))
        pp = pp_w[:]
        pp = jnp.where(is_bot, north(pp), pp)
        pp = jnp.where(is_top, south(pp), pp)
        pp = jnp.where(is_left, east(pp), pp)
        if cavity:
            pp = jnp.where(is_right, west(pp), pp)
            pp = jnp.where(jnp.logical_and(is_bot, is_left), 0.0, pp)
        else:
            pp = jnp.where(is_right, 0.0, pp)
        pp_w[:] = pp
        return err

    return solve


def _kernel_sub(scal_ref, u_hbm, v_hbm, p_hbm, pp_hbm,
                u_out, v_out, p_out, pp_out, err_ref,
                u_w, v_w, p_w, pp_w, rhs_w, sem,
                *, grid, scheme, semantics, profile, flow_case,
                ny, nx, nxp, omega, jtol, jiters, rounds, outer_tol,
                solver):
    b = pl.program_id(0)
    js = semantics == Semantics.JS
    cavity = flow_case == FlowCase.CAVITY

    cps = [pltpu.make_async_copy(h.at[b], w_, sem.at[k])
           for k, (h, w_) in enumerate(
               ((u_hbm, u_w), (v_hbm, v_w), (p_hbm, p_w)))]
    if not js:  # JS zero-initializes p' (index.html:777)
        cps.append(pltpu.make_async_copy(pp_hbm.at[b], pp_w, sem.at[3]))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()
    if js:
        pp_w[:] = jnp.zeros((ny, nxp), jnp.float32)

    dt_sub = scal_ref[b, 0]
    nu = scal_ref[b, 1]
    inlet = scal_ref[b, 2]
    ctx = RollCtx(0, ny, nxp)
    mask_u, mask_v, mask_u_bc, mask_v_bc = masks_traced(
        grid, semantics, jnp.float32, ctx=ctx, shp_u=(ny, nxp),
        shp_v=(ny, nxp))

    make_solve = make_sor_solve if solver == "sor" else make_jacobi_solve
    jacobi_solve = make_solve(
        pp_w, rhs_w, ny=ny, nx=nx, nxp=nxp, dx=grid.dx, dy=grid.dy,
        omega=omega, jtol=jtol, jiters=jiters, cavity=cavity)

    # ---- substep ----
    u_star, v_star = predict(u_w[:], v_w[:], dt_sub, nu, grid.dx,
                             grid.dy, nx, ny, scheme, js, mask_u, mask_v,
                             ctx=ctx)
    rhs_w[:] = divergence_rhs(u_star, v_star, dt_sub, grid.dx, grid.dy,
                              ctx=ctx, out_shape=(ny, nxp))
    err0 = jacobi_solve()
    u1, v1, p1 = correct(u_star, v_star, p_w[:], pp_w[:], dt_sub,
                         grid.dx, grid.dy, ctx=ctx, nx=nx)
    u_w[:] = u1
    v_w[:] = v1
    p_w[:] = p1

    if rounds > 0:
        # Rust outer corrector rounds (model.rs:696-724), per-scene
        # early exit == piso_substep's masked-rounds semantics.
        def rcond(c):
            err, it = c
            return jnp.logical_and(it < rounds, err >= outer_tol)

        def rbody(c):
            _, it = c
            rhs_w[:] = divergence_rhs(u_w[:], v_w[:], dt_sub, grid.dx,
                                      grid.dy, ctx=ctx,
                                      out_shape=(ny, nxp))
            err2 = jacobi_solve()
            u2, v2, p2 = correct(u_w[:], v_w[:], p_w[:], pp_w[:], dt_sub,
                                 grid.dx, grid.dy, ctx=ctx, nx=nx)
            u_w[:] = u2
            v_w[:] = v2
            p_w[:] = p2
            return err2, it + 1

        err, _ = lax.while_loop(rcond, rbody, (err0, jnp.int32(0)))
    else:
        err = err0

    uf, vf = apply_bcs(u_w[:], v_w[:], grid, profile, inlet,
                       mask_u_bc, mask_v_bc, flow_case, ctx=ctx)
    u_out[0] = uf
    v_out[0] = vf
    p_out[0] = p_w[:]
    pp_out[0] = pp_w[:]
    err_ref[b, 0] = err


def substep_batch_pallas(u: jnp.ndarray, v: jnp.ndarray, p: jnp.ndarray,
                         p_prime: jnp.ndarray, dt_sub, nu, inlet,
                         scene, interpret: bool = False):
    """Batched whole-substep solve. ``u`` (B, ny, nx+1); ``v``, ``p``,
    ``p_prime`` (B, ny, nx); ``dt_sub``, ``nu``, ``inlet`` (B,) (or
    scalars, broadcast). Returns (u, v, p, p_prime, err) with err (B,).
    """
    g, opts = scene.grid, scene.opts
    ny, nx = g.ny, g.nx
    B = u.shape[0]
    nxp = _round_up(nx + 1, 128)
    pad_u = ((0, 0), (0, 0), (0, nxp - (nx + 1)))
    pad_p = ((0, 0), (0, 0), (0, nxp - nx))
    up = jnp.pad(u, pad_u)
    vp = jnp.pad(v, pad_p)
    pa = jnp.pad(p, pad_p)
    ppa = jnp.pad(p_prime, pad_p)
    bfill = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (B,))
    scal = jnp.stack([bfill(dt_sub), bfill(nu), bfill(inlet)], axis=1)
    from ..core.config import PressureSolver
    is_sor = scene.params.pressure_solver == PressureSolver.SOR
    kern = functools.partial(
        _kernel_sub, grid=g, scheme=scene.params.velocity_scheme,
        semantics=opts.semantics, profile=scene.params.inlet_profile,
        flow_case=scene.params.flow_case, ny=ny, nx=nx, nxp=nxp,
        omega=opts.sor_omega if is_sor else opts.jacobi_omega,
        jtol=opts.jacobi_tol,
        jiters=opts.jacobi_iters, rounds=opts.outer_corrector_rounds,
        outer_tol=opts.outer_corrector_tol,
        solver="sor" if is_sor else "jacobi")
    blk = pl.BlockSpec((1, ny, nxp), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    uo, vo, po, ppo, err = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[blk] * 4
        + [pl.BlockSpec((B, 1), lambda b: (0, 0),
                        memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, ny, nxp), u.dtype)] * 4
        + [jax.ShapeDtypeStruct((B, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((ny, nxp), u.dtype)] * 5
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(scal, up, vp, pa, ppa)
    return (uo[:, :, :nx + 1], vo[:, :, :nx], po[:, :, :nx],
            ppo[:, :, :nx], err[:, 0])
