"""Full PISO step under shard_map with fused Pallas kernels per shard.

Tier 3 of the scale-out design (SURVEY.md section 2.7 / section 7):
tier 1 (shard.mesh) lets GSPMD partition the jnp step; tier 2
(shard.jacobi_shmap) hand-writes the pressure solve's halo exchange;
this module composes the WHOLE step from explicitly sharded pieces, so
every ICI transfer is a visible ppermute and every sweep is a Pallas
kernel on the shard's halo-extended row block:

  per PISO substep (model.rs:529-730):
    1. exchange 8-row (u, v) halos         -> 2 ppermute pairs
    2. fused predictor+divergence kernel   (kernels.substep_pallas, with
       a global-row offset so masks/BCs land on the right global rows)
    3. fused-K Jacobi: one (k-wide) halo exchange per K iterations
       (shard.jacobi_shmap.jacobi_pallas_shard_body), warm-started and
       optionally early-exiting on the pmax'd residual between launches
    4a. fast mode (no outer rounds): exchange 8-row p' halo, fused
        corrector+BC+reduction kernel
    4b. reference mode: shard-local corrector, then the Rust outer
        corrector loop (model.rs:696-724) as a lax.while_loop whose
        exit condition is the globally pmax'd pressure residual; each
        round exchanges 1-row (v, p') halos for the divergence and
        corrector stencils; velocity BCs applied shard-locally with
        global-row index masks at the end
    5. pmax residual/CFL reductions over the mesh axis
    6. replicated scalar step logic (ramp, CFL dt cap, JS substep
       adaptation / extrapolation) shared with solver.piso via its
       ramped_inlet/adapt_substeps/dt_control helpers

Coverage: both semantics modes end to end -- the deterministic fast
mode (BASELINE config 5's multi-chip throughput shape) AND the
reference-exact adaptive modes (Rust outer corrector rounds with early
exit; JS extrapolation + adaptive substeps + residual dt scaling) --
with ALL FOUR pressure solvers: Jacobi and red/black SOR run their
fused-K shard kernels (shard.jacobi_shmap / shard.sor_shmap; the SOR
halo spans 2K rows for the two color half-sweeps), multigrid and
MG_PRODUCTION run explicitly sharded V-cycles (shard.mg_shmap: 1-row
halos per stencil, coarse-grid agglomeration below the divisibility
floor; MG_PRODUCTION adds the shard-local p' BCs per sweep and the
globally pmax'd divergence-calibrated exit). Early-exit
convergence checks happen at fused-K granularity, exactly like the
single-device Pallas path (docs/SPEC.md "Pallas-mode semantics").

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
from ..ops.stencil import StencilCtx, row_index
from ..solver.piso import (Scene, StepDiagnostics, adapt_substeps,
                           dt_control, ramped_inlet, resolve_fuse_k)
from .halo import exchange_rows
from .jacobi_shmap import jacobi_pallas_shard_body

_HALO = 8  # sublane-aligned row halo for the substep kernels


class _OffsetCtx(StencilCtx):
    """StencilCtx whose row_index returns *global* rows (local + traced
    shard offset), so the shared ops/bc/mask formulas apply per-shard
    unchanged. Column indices are global already (row sharding)."""

    def __init__(self, row0):
        self._row0 = row0

    def row_index(self, shape):
        return self._row0 + row_index(shape)


def _sor_k(scene: Scene) -> int:
    """Fused-iteration count for the SOR shard kernel: the halo spans
    2k rows (two color rings per iteration), mirroring
    solver.piso._solve_pressure's halving of the Jacobi k. Halving a
    divisor of jacobi_iters need not stay a divisor (25//2 = 12 does
    not divide 50), so auto re-resolves downward; an explicit
    pallas_fuse_k is kept as-is and _check_supported raises on
    misuse."""
    opts = scene.opts
    iters = opts.jacobi_iters
    k = max(resolve_fuse_k(opts, scene.grid, divide=iters) // 2, 1)
    if not opts.pallas_fuse_k:
        while k > 1 and iters % k != 0:
            k -= 1
    return k


def _check_supported(scene: Scene, mesh: Mesh, axis: str):
    opts, g = scene.opts, scene.grid
    S = mesh.shape[axis]
    solver = scene.params.pressure_solver
    from ..kernels.jacobi_pallas import _halo8
    if solver == PressureSolver.JACOBI:
        if opts.jacobi_iters % resolve_fuse_k(
                opts, g, divide=opts.jacobi_iters) != 0:
            raise ValueError("step_shmap: jacobi_iters must be a multiple "
                             "of the (resolved) pallas_fuse_k")
        min_loc = max(_HALO, _halo8(resolve_fuse_k(
            opts, g, divide=opts.jacobi_iters)))
    elif solver == PressureSolver.SOR:
        if opts.sor_ordering == "lexicographic":
            raise ValueError(
                "step_shmap: lexicographic SOR is sequential along the "
                "sharded axis (its wavefront spans every row); use the "
                "GSPMD tier or sor_ordering='redblack'")
        if opts.jacobi_iters % _sor_k(scene) != 0:
            raise ValueError("step_shmap: jacobi_iters must be a multiple "
                             "of the resolved SOR fuse k")
        min_loc = max(_HALO, _halo8(2 * _sor_k(scene)))
    else:  # MULTIGRID / MG_PRODUCTION: 1-row halos; FDM: gather-based
        # direct solve, no halos. The substep kernels set the floor
        # (>= 8 rows also covers the local BC pairing).
        min_loc = _HALO
    if g.ny % S != 0 or (g.ny // S) % 8 != 0 or g.ny // S < min_loc:
        raise ValueError(f"step_shmap: ny={g.ny} must split into "
                         f"{S} shards of >= {min_loc} rows (multiples "
                         f"of 8); the pressure solve's halo spans the "
                         f"fused iteration window")


def make_step_shmap(scene: Scene, mesh: Mesh, axis: str = "y",
                    interpret: bool = False, jit: bool = True):
    """Explicit multi-chip step: State -> (State, StepDiagnostics),
    fields row-sharded over ``mesh[axis]``, scalars replicated."""
    _check_supported(scene, mesh, axis)
    g, opts, params = scene.grid, scene.opts, scene.params
    ny, nx = g.ny, g.nx
    S = mesh.shape[axis]
    loc = ny // S
    cavity = params.flow_case == FlowCase.CAVITY
    js = opts.semantics == Semantics.JS
    rounds = opts.outer_corrector_rounds
    fuse_k = resolve_fuse_k(opts, g, divide=opts.jacobi_iters)
    # Fused corrector+BC+reduction kernel only when no outer rounds
    # follow (it is the substep's last act); otherwise the plain
    # shard-local corrector + the rounds loop + BCs.
    fast_tail = rounds == 0

    solver = params.pressure_solver
    if solver == PressureSolver.JACOBI:
        def solve(pp0, rhs, dt_sub):
            del dt_sub
            return jacobi_pallas_shard_body(
                pp0, rhs, ny, axis, g.dx, g.dy, opts.jacobi_omega,
                opts.jacobi_iters, k=fuse_k, interpret=interpret,
                cavity=cavity, tol=opts.jacobi_tol,
                early_exit=opts.early_exit and opts.jacobi_tol > 0.0)
    elif solver == PressureSolver.SOR:
        from .sor_shmap import sor_pallas_shard_body

        def solve(pp0, rhs, dt_sub):
            del dt_sub
            return sor_pallas_shard_body(
                pp0, rhs, ny, axis, g.dx, g.dy, opts.sor_omega,
                opts.jacobi_iters, k=_sor_k(scene), interpret=interpret,
                cavity=cavity, tol=opts.jacobi_tol,
                early_exit=opts.early_exit and opts.jacobi_tol > 0.0)
    elif solver == PressureSolver.MG_PRODUCTION:
        from .mg_shmap import mgp_shard_body
        S_ = S

        def solve(pp0, rhs, dt_sub):
            # solver.piso._solve_pressure: tol_r = div_tol / dt_sub
            # bounds post-correction max|div(u)| by div_tol.
            tol_r = opts.projection_div_tol / dt_sub
            return mgp_shard_body(pp0, rhs, ny, nx, axis, g.dx, g.dy,
                                  S_, opts, cavity, tol_r)
    elif solver == PressureSolver.FDM:
        # Exact direct projection (docs/SPEC.md item 13). A direct
        # solve IS the agglomerated form: gather the rhs once, run the
        # eigenbasis matmuls replicated (identical values on every
        # shard -- bitwise equal to the single-device solve), slice
        # the owned rows. One gather per projection, vs one per cycle
        # for iterative solvers.
        from ..ops.fdm import fdm_solve_interior
        from ..ops.poisson import _mg_residual, pprime_bc_fn
        bc_full = pprime_bc_fn(params.flow_case)

        def solve(pp0, rhs_loc, dt_sub):
            del pp0, dt_sub
            rhs_full = lax.all_gather(rhs_loc, axis, axis=0, tiled=True)
            e_int = fdm_solve_interior(
                rhs_full[1:ny - 1, 1:nx - 1], g.dx, g.dy,
                east_dirichlet=not cavity, d_wall=g.dx,
                precision=getattr(opts, "fdm_precision", "highest"))
            pp_full = bc_full(jnp.pad(e_int, 1))
            err = jnp.max(jnp.abs(_mg_residual(pp_full, rhs_full,
                                               g.dx, g.dy)))
            i0 = lax.axis_index(axis) * loc
            return lax.dynamic_slice(pp_full, (i0, 0), (loc, nx)), err
    else:  # MULTIGRID: zero-initializes internally (index.html:777)
        from .mg_shmap import mg_shard_body
        S_ = S

        def solve(pp0, rhs, dt_sub):
            del pp0, dt_sub
            return mg_shard_body(rhs, ny, nx, axis, g.dx, g.dy, S_, opts)

    def correct_local(us, vs, p, pp, dt_sub, off):
        """Shard-local corrector (ops.corrector.correct on row blocks):
        the u update needs only column shifts; the v update reads
        p'[j-1], supplied by a 1-row ppermute halo."""
        cu = lax.broadcasted_iota(jnp.int32, us.shape, 1)
        ppW = jnp.pad(pp, ((0, 0), (1, 0)))[:, :nx + 1]
        ppE = jnp.pad(pp, ((0, 0), (0, 1)))
        u_upd = us - dt_sub * (ppE - ppW) / g.dx
        u = jnp.where((cu >= 1) & (cu <= nx - 1), u_upd, us)
        ppx = exchange_rows(pp, axis, 1)  # rows: [below, own.., above]
        v_upd = vs - dt_sub * (ppx[1:loc + 1, :] - ppx[0:loc, :]) / g.dy
        gv = off + lax.broadcasted_iota(jnp.int32, vs.shape, 0)
        v = jnp.where(gv >= 1, v_upd, vs)
        return u, v, p + pp

    def div_local(u, v, dt_sub):
        """Shard-local divergence RHS: v[j+1] comes from the 1-row
        neighbor halo (zero above the top shard = the implicit v top
        face row, core.state.State.v_full)."""
        du = (u[:, 1:nx + 1] - u[:, :nx]) / g.dx
        vx = exchange_rows(v, axis, 1)
        dv = (vx[2:loc + 2, :] - vx[1:loc + 1, :]) / g.dy
        return (du + dv) / dt_sub

    def shard_fn(u, v, p, pp, dt_sub, nu, inlet, substeps):
        from ..kernels.substep_pallas import (correct_bc_pallas,
                                              predict_div_pallas)
        off = lax.axis_index(axis) * loc
        u_entry, v_entry = u, v

        def substep(u, v, p, pp):
            # 1-2: predictor + divergence on the halo-extended block.
            ue = exchange_rows(u, axis, _HALO)
            ve = exchange_rows(v, axis, _HALO)
            us_e, vs_e, rhs_e = predict_div_pallas(
                ue, ve, dt_sub, nu, g, params.velocity_scheme,
                opts.semantics, block_rows=opts.pallas_block_rows,
                interpret=interpret, row_offset=off - _HALO)
            rhs = rhs_e[_HALO:_HALO + loc, :]
            # 3: Jacobi (Rust warm start model.rs:682; JS zero init).
            pp0 = pp if opts.semantics == Semantics.RUST else jnp.zeros_like(pp)
            pp_new, err = solve(pp0, rhs, dt_sub)
            if fast_tail:
                # 4a: fused corrector + BCs + reductions. p' needs real
                # neighbor halos (the v correction reads p'[j-1]); u*,
                # v* come halo-extended from the predictor kernel; p
                # and the entry fields only matter on owned rows, so
                # zero row-padding keeps shapes uniform.
                ppe = exchange_rows(pp_new, axis, _HALO)
                zrows = ((_HALO, _HALO), (0, 0))
                u2e, v2e, p2e, res_u, res_v, max_vel = correct_bc_pallas(
                    us_e, vs_e, jnp.pad(p, zrows), ppe,
                    jnp.pad(u_entry, zrows), jnp.pad(v_entry, zrows),
                    dt_sub, inlet, g, params.inlet_profile,
                    params.flow_case, opts.semantics,
                    block_rows=opts.pallas_block_rows,
                    interpret=interpret, row_offset=off - _HALO,
                    own_rows=(_HALO, _HALO + loc))
                sl = slice(_HALO, _HALO + loc)
                return (u2e[sl, :], v2e[sl, :], p2e[sl, :], pp_new, err,
                        (res_u, res_v, max_vel))
            # 4b: reference mode -- plain corrector, then the Rust
            # outer corrector loop (model.rs:696-724) on a globally
            # agreed (pmax'd) residual, then shard-local BCs.
            us = us_e[_HALO:_HALO + loc, :nx + 1]
            vs = vs_e[_HALO:_HALO + loc, :]
            u2, v2, p2 = correct_local(us, vs, p, pp_new, dt_sub, off)

            def round_body(carry):
                u, v, p, pp, _, it = carry
                rhs = div_local(u, v, dt_sub)
                pp, err = solve(pp, rhs, dt_sub)
                u, v, p = correct_local(u, v, p, pp, dt_sub, off)
                return u, v, p, pp, err, it + 1

            def round_cond(carry):
                *_, err, it = carry
                return jnp.logical_and(it < rounds,
                                       err >= opts.outer_corrector_tol)

            if rounds > 0:
                u2, v2, p2, pp_new, err, _ = lax.while_loop(
                    round_cond, round_body,
                    (u2, v2, p2, pp_new, err, jnp.asarray(0, jnp.int32)))
            # BCs (model.rs:826-875) with global-row masks; obstacle
            # masks from iota against global coordinates.
            from ..core.masks import masks_traced
            from ..ops.bc import apply_bcs
            ctx = _OffsetCtx(off)
            _, _, mask_u_bc, mask_v_bc = masks_traced(
                g, opts.semantics, u2.dtype, ctx=ctx,
                shp_u=(loc, nx + 1), shp_v=(loc, nx))
            u2, v2 = apply_bcs(u2, v2, g, params.inlet_profile, inlet,
                               mask_u_bc, mask_v_bc, params.flow_case,
                               ctx=ctx)
            return u2, v2, p2, pp_new, err, None

        def sub_body(i, carry):
            u, v, p, pp, max_res_p, red = carry
            u, v, p, pp, err, extras = substep(u, v, p, pp)
            # JS tracks the max residual across substeps
            # (index.html:288-293); Rust reports the last substep's.
            max_res_p = jnp.maximum(max_res_p, err) if js else err
            red = extras if extras is not None else red
            return u, v, p, pp, max_res_p, red

        zero = jnp.asarray(0.0, u.dtype)
        zero3 = (zero, zero, zero)
        carry0 = (u, v, p, pp, zero, zero3)
        if not opts.substeps_adaptive and opts.substeps_init == 1:
            u, v, p, pp, res_p, red = sub_body(0, carry0)
        else:
            u, v, p, pp, res_p, red = lax.fori_loop(
                0, substeps, sub_body, carry0)

        if fast_tail:
            res_u, res_v, max_vel = red
        else:
            res_u = jnp.max(jnp.abs(u - u_entry))
            res_v = jnp.max(jnp.abs(v - v_entry))
            max_vel = jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v)))
        # 5: global reductions over the mesh axis.
        return (u, v, p, pp, lax.pmax(res_p, axis), lax.pmax(res_u, axis),
                lax.pmax(res_v, axis), lax.pmax(max_vel, axis))

    row = P(axis, None)
    sharded_substeps = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(row, row, row, row, P(), P(), P(), P()),
        out_specs=(row, row, row, row, P(), P(), P(), P()),
        check_vma=False)

    def step(state: State):
        f32 = state.u.dtype
        # 6: replicated scalar logic, shared with solver.piso.step_fn.
        u_enter, v_enter = state.u, state.v
        u, v = u_enter, v_enter
        if js and opts.extrapolate:
            # JS extrapolated initial guess (index.html:263-270);
            # elementwise on the row-sharded global arrays.
            nonzero = state.step > 0
            u = jnp.where(nonzero, 2.0 * u - state.u_prev, u)
            v = jnp.where(nonzero, 2.0 * v - state.v_prev, v)
        inlet = ramped_inlet(opts, state, f32)
        substeps = state.substeps
        # Mirror solver.piso.step_fn: the static branch executes
        # exactly substeps_init substeps, so pin dt_sub (and the
        # reported count) to it for carried counters from adaptive
        # runs.
        if not opts.substeps_adaptive and opts.substeps_init == 1:
            substeps = jnp.asarray(opts.substeps_init, substeps.dtype)
        dt_sub = state.dt / substeps.astype(f32)
        executed_substeps = substeps
        u, v, p, pp, res_p, res_u, res_v, max_vel = sharded_substeps(
            u, v, state.p, state.p_prime, dt_sub, state.nu, inlet, substeps)
        if js and opts.substeps_adaptive:
            substeps = adapt_substeps(opts, substeps, res_u, res_v, res_p,
                                      f32)
        new_step = state.step + 1
        new_t = state.t + state.dt
        new_dt = dt_control(g, opts, state, max_vel, res_p)
        new_state = dataclasses.replace(
            state, u=u, v=v, p=p, p_prime=pp,
            u_prev=u_enter if js else None, v_prev=v_enter if js else None,
            dt=new_dt, t=new_t, step=new_step, substeps=substeps,
            res_u=res_u, res_v=res_v, res_p=res_p)
        diag = StepDiagnostics(step=new_step, t=new_t, dt=state.dt,
                               res_u=res_u, res_v=res_v, res_p=res_p,
                               substeps=executed_substeps)
        return new_state, diag

    return jax.jit(step) if jit else step


def make_run_shmap(scene: Scene, mesh: Mesh, n_steps: int,
                   axis: str = "y", interpret: bool = False):
    """n steps of the explicitly sharded step under lax.scan."""
    step = make_step_shmap(scene, mesh, axis, interpret, jit=False)

    def run(state: State):
        def body(s, _):
            return step(s)
        return lax.scan(body, state, None, length=n_steps)

    return jax.jit(run)
