"""Full PISO step under shard_map with fused Pallas kernels per shard.

Tier 3 of the scale-out design (SURVEY.md section 2.7 / section 7):
tier 1 (shard.mesh) lets GSPMD partition the jnp step; tier 2
(shard.jacobi_shmap) hand-writes the pressure solve's halo exchange;
this module composes the WHOLE fast-mode step from explicitly sharded
pieces, so every ICI transfer is a visible ppermute and every sweep is
a Pallas kernel on the shard's halo-extended row block:

  per step (one PISO substep, model.rs:529-730):
    1. exchange 8-row (u, v) halos         -> 2 ppermute pairs
    2. fused predictor+divergence kernel   (kernels.substep_pallas, with
       a global-row offset so masks/BCs land on the right global rows)
    3. fused-K Jacobi: one (k-wide) halo exchange per K iterations
       (shard.jacobi_shmap.jacobi_pallas_shard_body)
    4. exchange 8-row p' halo, fused corrector+BC+reduction kernel
    5. pmax residual/CFL reductions over the mesh axis
    6. replicated scalar step logic (ramp, CFL dt cap) outside shard_map

Scope: the deterministic fast mode (Rust semantics, 1 static substep,
no outer corrector rounds, fixed Jacobi iterations) -- the multi-chip
throughput configuration of BASELINE config 5 (8192^2). The
reference-exact adaptive modes run multi-chip through the GSPMD tier.
``interpret=True`` runs the kernels in the Pallas interpreter so the
whole composition is testable on the virtual CPU mesh
(tests/test_shmap.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import FlowCase, PressureSolver, Semantics
from ..core.state import State
from ..solver.piso import Scene, StepDiagnostics
from .halo import exchange_rows
from .jacobi_shmap import jacobi_pallas_shard_body

_HALO = 8  # sublane-aligned row halo for the substep kernels


def _check_supported(scene: Scene, mesh: Mesh, axis: str):
    opts, g = scene.opts, scene.grid
    S = mesh.shape[axis]
    if opts.outer_corrector_rounds != 0:
        raise ValueError("step_shmap: fast mode only "
                         "(outer_corrector_rounds=0); use the GSPMD tier "
                         "(shard.mesh) for full reference semantics")
    if opts.substeps_adaptive or opts.substeps_init != 1 or opts.extrapolate:
        raise ValueError("step_shmap: 1 static substep, no extrapolation")
    if scene.params.pressure_solver != PressureSolver.JACOBI:
        raise ValueError("step_shmap: Jacobi pressure only")
    from ..kernels.jacobi_pallas import _halo8
    from ..solver.piso import resolve_fuse_k
    if opts.jacobi_iters % resolve_fuse_k(opts, g) != 0:
        raise ValueError("step_shmap: jacobi_iters must be a multiple of "
                         "the (resolved) pallas_fuse_k")
    min_loc = max(_HALO, _halo8(resolve_fuse_k(opts, g)))
    if g.ny % S != 0 or (g.ny // S) % 8 != 0 or g.ny // S < min_loc:
        raise ValueError(f"step_shmap: ny={g.ny} must split into "
                         f"{S} shards of >= {min_loc} rows (multiples "
                         f"of 8); the Jacobi halo spans the resolved "
                         f"pallas_fuse_k iterations")


def make_step_shmap(scene: Scene, mesh: Mesh, axis: str = "y",
                    interpret: bool = False, jit: bool = True):
    """Fast-mode multi-chip step: State -> (State, StepDiagnostics),
    fields row-sharded over ``mesh[axis]``, scalars replicated."""
    _check_supported(scene, mesh, axis)
    g, opts, params = scene.grid, scene.opts, scene.params
    ny, nx = g.ny, g.nx
    S = mesh.shape[axis]
    loc = ny // S
    cavity = params.flow_case == FlowCase.CAVITY

    def shard_fn(u, v, p, pp, dt_sub, nu, inlet):
        from ..kernels.substep_pallas import (correct_bc_pallas,
                                              predict_div_pallas)
        off = lax.axis_index(axis) * loc - _HALO
        # 1-2: predictor + divergence on the halo-extended block.
        ue = exchange_rows(u, axis, _HALO)
        ve = exchange_rows(v, axis, _HALO)
        us_e, vs_e, rhs_e = predict_div_pallas(
            ue, ve, dt_sub, nu, g, params.velocity_scheme, opts.semantics,
            block_rows=opts.pallas_block_rows, interpret=interpret,
            row_offset=off)
        rhs = rhs_e[_HALO:_HALO + loc, :]
        # 3: warm-started fused-K Jacobi (Rust warm start, model.rs:682).
        pp0 = pp if opts.semantics == Semantics.RUST else jnp.zeros_like(pp)
        from ..solver.piso import resolve_fuse_k
        pp_new, err = jacobi_pallas_shard_body(
            pp0, rhs, ny, axis, g.dx, g.dy, opts.jacobi_omega,
            opts.jacobi_iters, k=resolve_fuse_k(opts, g),
            interpret=interpret, cavity=cavity)
        # 4: corrector + BCs + reductions. p' needs real neighbor halos
        # (the v correction reads p'[j-1]); u*, v* come halo-extended
        # from the predictor kernel; p and the entry fields only matter
        # on owned rows, so zero row-padding keeps shapes uniform.
        ppe = exchange_rows(pp_new, axis, _HALO)
        zrows = ((_HALO, _HALO), (0, 0))
        u2e, v2e, p2e, res_u, res_v, max_vel = correct_bc_pallas(
            us_e, vs_e, jnp.pad(p, zrows), ppe,
            jnp.pad(u, zrows), jnp.pad(v, zrows),
            dt_sub, inlet, g, params.inlet_profile, params.flow_case,
            opts.semantics, block_rows=opts.pallas_block_rows,
            interpret=interpret, row_offset=off,
            own_rows=(_HALO, _HALO + loc))
        sl = slice(_HALO, _HALO + loc)
        # 5: global reductions over the mesh axis.
        return (u2e[sl, :], v2e[sl, :], p2e[sl, :], pp_new,
                lax.pmax(err, axis), lax.pmax(res_u, axis),
                lax.pmax(res_v, axis), lax.pmax(max_vel, axis))

    row = P(axis, None)
    sharded_substep = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(row, row, row, row, P(), P(), P()),
        out_specs=(row, row, row, row, P(), P(), P(), P()),
        check_vma=False)

    def step(state: State):
        f32 = state.u.dtype
        # 6: replicated scalar logic, mirroring solver.piso.step_fn's
        # Rust fast branch (ramp model.rs:311-316, CFL :877-889).
        ramp = jnp.minimum(
            state.step.astype(f32) / float(opts.ramp_up_steps), 1.0)
        inlet = ramp * state.target_inlet
        dt_sub = state.dt
        u, v, p, pp, res_p, res_u, res_v, max_vel = sharded_substep(
            state.u, state.v, state.p, state.p_prime,
            dt_sub, state.nu, inlet)
        new_step = state.step + 1
        new_t = state.t + state.dt
        dt_cfl = jnp.where(
            max_vel == 0.0, state.dt,
            jnp.minimum(opts.cfl * min(g.dx, g.dy) / max_vel, state.dt))
        new_dt = jnp.where(dt_cfl > state.dt,
                           jnp.minimum(dt_cfl, state.dt * opts.dt_growth_cap),
                           dt_cfl)
        new_state = dataclasses.replace(
            state, u=u, v=v, p=p, p_prime=pp,
            dt=new_dt, t=new_t, step=new_step,
            res_u=res_u, res_v=res_v, res_p=res_p)
        diag = StepDiagnostics(step=new_step, t=new_t, dt=state.dt,
                               res_u=res_u, res_v=res_v, res_p=res_p,
                               substeps=state.substeps)
        return new_state, diag

    return jax.jit(step) if jit else step


def make_run_shmap(scene: Scene, mesh: Mesh, n_steps: int,
                   axis: str = "y", interpret: bool = False):
    """n steps of the explicitly sharded fast-mode step under lax.scan."""
    step = make_step_shmap(scene, mesh, axis, interpret, jit=False)

    def run(state: State):
        def body(s, _):
            return step(s)
        return lax.scan(body, state, None, length=n_steps)

    return jax.jit(run)
