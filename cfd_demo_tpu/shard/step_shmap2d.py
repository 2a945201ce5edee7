"""Fast-mode PISO step explicitly sharded over a 2-D rows x cols mesh.

Round-3 extension of shard.step_shmap (VERDICT r2 item 4): the rows-only
explicit tier caps at ny/16 devices and its halo bytes scale with the
full nx; this module composes the SAME fused Pallas kernels over a
``make_mesh2d_spatial`` (rows x cols) mesh, so both grid axes scale and
every ICI transfer is a visible row- or column-ppermute
(SURVEY.md:201 "ghost columns/rows per neighbor").

Per PISO substep (model.rs:529-730, fast schedule):
  1. one both-axis 8-halo exchange of (u, v)  -> 4 ppermute pairs
     (columns first, then rows of the column-extended block, so corner
     halos carry the diagonal neighbors' data)
  2. fused predictor+divergence kernel on the (row+col)-extended block
     (kernels.substep_pallas with global row AND column offsets)
  3. fused-K Jacobi: one both-axis k-wide halo exchange per K
     iterations (shard.jacobi_shmap.jacobi_pallas_shard_body_2d)
  4. both-axis 8-halo p' exchange, fused corrector+BC+reduction kernel
     with owned-row x owned-column reduction masks
  5. pmax residual/CFL reductions over BOTH mesh axes
  6. replicated scalar step logic shared with solver.piso

Boundary representation: shard.mesh.Split2D (u's odd nx+1-th column
carried separately, row-sharded and column-replicated). Inside the
step the last x-shard re-joins it as the global face-nx column; the
updated face nx (pure BC output) is re-replicated with a chain of
ppermutes (halo.bcast_from_last -- gather-free).

Scope (round 4 widened, VERDICT r3 item 3): both semantics with
PressureSolver.JACOBI, red/black SOR (the 2K-ring fused shard kernel
with globally-keyed colors), FDM (exact direct solve, replicated after
a both-axis gather) or MG_PRODUCTION (shard.mg_shmap.mgp_shard_body_2d:
both-axis-sharded aligned V-cycles, coarse-size agglomeration) -- and
the Rust outer corrector rounds (model.rs:696-724) as a while_loop on
the globally pmax'd residual with 1-wide both-axis halos around each
round's divergence/corrector stencils. The JS multigrid kit and the
lexicographic SOR ordering route to the rows-only tier (step_shmap) or
the GSPMD 2-D tier (mesh.make_sharded_step_2d).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import FlowCase, PressureSolver, Semantics
from ..ops.stencil import StencilCtx, col_index, row_index
from ..solver.piso import (Scene, StepDiagnostics, adapt_substeps,
                           dt_control, ramped_inlet, resolve_fuse_k)
from .halo import (_perm_down, _perm_up, bcast_from_last, exchange_cols,
                   exchange_rows, exchange_rows_cols)
from .jacobi_shmap import jacobi_pallas_shard_body_2d
from .mesh import COL_AXIS, ROW_AXIS, Split2D

_HALO = 8  # row/column halo for the substep kernels (stencils <= 3)


class _OffsetCtx2D(StencilCtx):
    """StencilCtx whose row/col indices return *global* coordinates
    (local + traced shard offsets) on the rows x cols mesh, so the
    shared ops/bc/mask formulas apply per-shard unchanged -- the 2-D
    twin of step_shmap._OffsetCtx."""

    def __init__(self, row0, col0):
        self._row0, self._col0 = row0, col0

    def row_index(self, shape):
        return self._row0 + row_index(shape)

    def col_index(self, shape):
        return self._col0 + col_index(shape)


def _exchange_u(u_core, u_last, xaxis: str, width: int):
    """Column halo exchange for the staggered u field: the core block
    holds faces [c0, c0 + loc_x); the extended block must span
    [c0 - width, c0 + loc_x + width] INCLUSIVE (one wider than the
    cell fields, mirroring u's global nx+1 width), so the right
    exchange ships width+1 columns. The rightmost shard's first
    right-halo column is the REAL global face nx, carried in
    ``u_last`` (ppermute zero-fills it otherwise)."""
    n = lax.axis_size(xaxis)
    loc_x = u_core.shape[1]
    from_left = lax.ppermute(u_core[:, -width:], xaxis, _perm_up(n))
    from_right = lax.ppermute(u_core[:, :width + 1], xaxis, _perm_down(n))
    ue = jnp.concatenate([from_left, u_core, from_right], axis=1)
    lc = lax.broadcasted_iota(jnp.int32, ue.shape, 1)
    inject = jnp.logical_and(lax.axis_index(xaxis) == n - 1,
                             lc == width + loc_x)
    return jnp.where(inject, u_last, ue)


def _check_supported(scene: Scene, mesh: Mesh):
    from ..kernels.jacobi_pallas import _halo8
    from .step_shmap import _sor_k
    opts, g = scene.opts, scene.grid
    solver = scene.params.pressure_solver
    if solver not in (PressureSolver.JACOBI, PressureSolver.SOR,
                      PressureSolver.FDM, PressureSolver.MG_PRODUCTION):
        raise ValueError("step_shmap_2d: JACOBI/SOR/FDM/MG_PRODUCTION "
                         "only; the JS multigrid kit runs on the rows "
                         "tier (step_shmap) or the GSPMD 2-D tier")
    if (solver == PressureSolver.MG_PRODUCTION
            and getattr(opts, "mgp_scheme", "auto") == "legacy"):
        raise ValueError("step_shmap_2d: MG_PRODUCTION implements the "
                         "aligned hierarchy only; mgp_scheme='legacy' "
                         "runs on the rows tier (step_shmap)")
    if solver == PressureSolver.JACOBI:
        k = resolve_fuse_k(opts, g, divide=opts.jacobi_iters)
        if opts.jacobi_iters % k != 0:
            raise ValueError("step_shmap_2d: jacobi_iters must be a "
                             "multiple of the (resolved) pallas_fuse_k")
        min_loc = max(_HALO, _halo8(k))
    elif solver == PressureSolver.SOR:
        if opts.sor_ordering == "lexicographic":
            raise ValueError(
                "step_shmap_2d: lexicographic SOR is sequential along "
                "both sharded axes; use the GSPMD tier or "
                "sor_ordering='redblack'")
        if opts.jacobi_iters % _sor_k(scene) != 0:
            raise ValueError("step_shmap_2d: jacobi_iters must be a "
                             "multiple of the resolved SOR fuse k")
        min_loc = max(_HALO, _halo8(2 * _sor_k(scene)))
    else:  # FDM (gather-based direct solve) / MG_PRODUCTION (1-wide
        # both-axis halos + coarse agglomeration): substep halo floor
        min_loc = _HALO
    Sy, Sx = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]
    loc_y, loc_x = g.ny // Sy, g.nx // Sx
    if g.ny % Sy != 0 or loc_y % 8 != 0 or loc_y < min_loc:
        raise ValueError(f"step_shmap_2d: ny={g.ny} must split into {Sy} "
                         f"shards of >= {min_loc} rows (multiples of 8)")
    if g.nx % Sx != 0 or loc_x < min_loc + 1:
        raise ValueError(f"step_shmap_2d: nx={g.nx} must split into {Sx} "
                         f"shards of >= {min_loc + 1} columns")


def make_step_shmap_2d(scene: Scene, mesh: Mesh,
                       interpret: bool = False, jit: bool = True):
    """Explicit 2-D multi-chip fast step: Split2D -> (Split2D, diag),
    fields (rows x cols)-sharded, scalars replicated. Wrap with
    shard.mesh.shard_state_2d / split_u / join_u."""
    _check_supported(scene, mesh)
    g, opts, params = scene.grid, scene.opts, scene.params
    ny, nx = g.ny, g.nx
    Sy, Sx = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]
    loc_y, loc_x = ny // Sy, nx // Sx
    cavity = params.flow_case == FlowCase.CAVITY
    js = opts.semantics == Semantics.JS
    fuse_k = resolve_fuse_k(opts, g, divide=opts.jacobi_iters)
    H = _HALO
    solver = params.pressure_solver

    if solver == PressureSolver.JACOBI:
        def solve(pp0, rhs, dt_sub):
            del dt_sub
            return jacobi_pallas_shard_body_2d(
                pp0, rhs, ny, nx, ROW_AXIS, COL_AXIS, g.dx, g.dy,
                opts.jacobi_omega, opts.jacobi_iters, k=fuse_k,
                interpret=interpret, cavity=cavity, tol=opts.jacobi_tol,
                early_exit=opts.early_exit and opts.jacobi_tol > 0.0)
    elif solver == PressureSolver.SOR:
        from .step_shmap import _sor_k
        from .sor_shmap import sor_pallas_shard_body_2d
        k_s = _sor_k(scene)

        def solve(pp0, rhs, dt_sub):
            del dt_sub
            return sor_pallas_shard_body_2d(
                pp0, rhs, ny, nx, ROW_AXIS, COL_AXIS, g.dx, g.dy,
                opts.sor_omega, opts.jacobi_iters, k=k_s,
                interpret=interpret, cavity=cavity, tol=opts.jacobi_tol,
                early_exit=opts.early_exit and opts.jacobi_tol > 0.0)
    elif solver == PressureSolver.MG_PRODUCTION:
        from .mg_shmap import mgp_shard_body_2d

        def solve(pp0, rhs, dt_sub):
            # solver.piso._solve_pressure: tol_r = div_tol / dt_sub
            # bounds post-correction max|div(u)| by div_tol.
            tol_r = opts.projection_div_tol / dt_sub
            return mgp_shard_body_2d(pp0, rhs, ny, nx, ROW_AXIS,
                                     COL_AXIS, g.dx, g.dy, opts, cavity,
                                     tol_r)
    else:  # FDM: exact direct projection, replicated after a both-axis
        # gather (the rows tier's documented pattern; one gather per
        # projection vs one halo pair per K iterations)
        from ..ops.fdm import fdm_solve_interior
        from ..ops.poisson import _mg_residual, pprime_bc_fn
        bc_full = pprime_bc_fn(params.flow_case)

        def solve(pp0, rhs_loc, dt_sub):
            del pp0, dt_sub
            rhs_full = lax.all_gather(
                lax.all_gather(rhs_loc, COL_AXIS, axis=1, tiled=True),
                ROW_AXIS, axis=0, tiled=True)
            e_int = fdm_solve_interior(
                rhs_full[1:ny - 1, 1:nx - 1], g.dx, g.dy,
                east_dirichlet=not cavity, d_wall=g.dx,
                precision=getattr(opts, "fdm_precision", "highest"))
            pp_full = bc_full(jnp.pad(e_int, 1))
            err = jnp.max(jnp.abs(_mg_residual(pp_full, rhs_full,
                                               g.dx, g.dy)))
            i0 = lax.axis_index(ROW_AXIS) * (ny // Sy)
            j0 = lax.axis_index(COL_AXIS) * (nx // Sx)
            return lax.dynamic_slice(pp_full, (i0, j0),
                                     (ny // Sy, nx // Sx)), err

    rounds = opts.outer_corrector_rounds
    fast_tail = rounds == 0

    def shard_fn(u, v, p, pp, u_last, dt_sub, nu, inlet, substeps):
        from ..kernels.substep_pallas import (correct_bc_pallas,
                                              predict_div_pallas)
        off_r = lax.axis_index(ROW_AXIS) * loc_y
        off_c = lax.axis_index(COL_AXIS) * loc_x
        u_entry, v_entry, ul_entry = u, v, u_last

        def correct_local_2d(us, vs, p, pp, dt_sub):
            """Shard-local corrector (ops.corrector.correct on
            rows x cols blocks): the u update reads p'[f-1] (1-column
            halo), the v update p'[j-1] (1-row halo)."""
            ppc = exchange_cols(pp, COL_AXIS, 1)  # cols c0-1 .. c0+loc_x
            ppW = ppc[:, 0:loc_x]
            u_upd = us - dt_sub * (pp - ppW) / g.dx
            gf = off_c + lax.broadcasted_iota(jnp.int32, us.shape, 1)
            u2 = jnp.where((gf >= 1) & (gf <= nx - 1), u_upd, us)
            ppx = exchange_rows(pp, ROW_AXIS, 1)
            v_upd = vs - dt_sub * (ppx[1:loc_y + 1, :]
                                   - ppx[0:loc_y, :]) / g.dy
            gv = off_r + lax.broadcasted_iota(jnp.int32, vs.shape, 0)
            v2 = jnp.where(gv >= 1, v_upd, vs)
            return u2, v2, p + pp

        def div_local_2d(u, v, u_last, dt_sub):
            """Shard-local divergence RHS: u's right face from the
            1-column u halo (real global face nx injected on the last
            x-shard), v[j+1] from the 1-row halo (zero above the top
            shard = the implicit v top face row)."""
            ue = _exchange_u(u, u_last, COL_AXIS, 1)  # (loc_y, loc_x+3)
            du = (ue[:, 2:loc_x + 2] - ue[:, 1:loc_x + 1]) / g.dx
            vx = exchange_rows(v, ROW_AXIS, 1)
            dv = (vx[2:loc_y + 2, :] - vx[1:loc_y + 1, :]) / g.dy
            return (du + dv) / dt_sub

        def substep(u, v, p, pp, u_last):
            # 1-2: predictor + divergence on the both-axis extended
            # block (u one column wider, with the real face nx
            # injected on the rightmost shard).
            ue = exchange_rows(_exchange_u(u, u_last, COL_AXIS, H),
                               ROW_AXIS, H)
            ve = exchange_rows_cols(v, ROW_AXIS, COL_AXIS, H, H)
            us_e, vs_e, rhs_e = predict_div_pallas(
                ue, ve, dt_sub, nu, g, params.velocity_scheme,
                opts.semantics, block_rows=opts.pallas_block_rows,
                interpret=interpret, row_offset=off_r - H,
                col_offset=off_c - H)
            rhs = rhs_e[H:H + loc_y, H:H + loc_x]
            # 3: pressure solve (Rust warm start model.rs:682; JS zero
            # init) -- fused-K Jacobi/SOR halos, the MGP V-cycles or
            # the FDM gather.
            pp0 = pp if opts.semantics == Semantics.RUST else jnp.zeros_like(pp)
            pp_new, err = solve(pp0, rhs, dt_sub)
            sly, slx = slice(H, H + loc_y), slice(H, H + loc_x)
            if fast_tail:
                # 4a: fused corrector + BCs + reductions. p' needs real
                # neighbor halos; u*, v* come halo-extended straight
                # from the predictor kernel; p and the entry fields
                # only matter on owned rows/columns, so zero padding
                # keeps shapes uniform.
                ppe = exchange_rows_cols(pp_new, ROW_AXIS, COL_AXIS, H, H)
                zboth = ((H, H), (H, H))
                zu = ((H, H), (H, H + 1))  # u entry: width loc_x+1+2H
                u2e, v2e, p2e, res_u, res_v, max_vel = correct_bc_pallas(
                    us_e, vs_e, jnp.pad(p, zboth), ppe,
                    jnp.pad(u_entry, zu), jnp.pad(v_entry, zboth),
                    dt_sub, inlet, g, params.inlet_profile,
                    params.flow_case, opts.semantics,
                    block_rows=opts.pallas_block_rows,
                    interpret=interpret, row_offset=off_r - H,
                    col_offset=off_c - H,
                    own_rows=(H, H + loc_y), own_cols=(H, H + loc_x))
                u2 = u2e[sly, slx]
                v2 = v2e[sly, slx]
                p2 = p2e[sly, slx]
                # Global face nx: pure BC output, valid in the
                # rightmost shard's first right-halo column;
                # re-replicate along x and fold its residual/CFL
                # contribution in (the kernel's owned masks exclude it).
                ul_new = bcast_from_last(
                    u2e[sly, H + loc_x:H + loc_x + 1], COL_AXIS)
                res_u = jnp.maximum(res_u,
                                    jnp.max(jnp.abs(ul_new - ul_entry)))
                max_vel = jnp.maximum(max_vel, jnp.max(jnp.abs(ul_new)))
                return (u2, v2, p2, pp_new, ul_new, err,
                        (res_u, res_v, max_vel))
            # 4b: reference mode (round 4) -- plain corrector, then the
            # Rust outer corrector loop (model.rs:696-724) on a
            # globally pmax'd residual, then shard-local BCs. u* keeps
            # the entry value at face nx (the predictor masks boundary
            # faces), so the rounds' divergence reads the carried
            # u_last -- exactly like the unsharded step.
            us = us_e[sly, H:H + loc_x]
            vs = vs_e[sly, slx]
            u2, v2, p2 = correct_local_2d(us, vs, p, pp_new, dt_sub)

            def round_body(carry):
                u, v, p, pp, _, it = carry
                rhs = div_local_2d(u, v, u_last, dt_sub)
                pp, err = solve(pp, rhs, dt_sub)
                u, v, p = correct_local_2d(u, v, p, pp, dt_sub)
                return u, v, p, pp, err, it + 1

            def round_cond(carry):
                *_, err, it = carry
                return jnp.logical_and(it < rounds,
                                       err >= opts.outer_corrector_tol)

            u2, v2, p2, pp_new, err, _ = lax.while_loop(
                round_cond, round_body,
                (u2, v2, p2, pp_new, err, jnp.asarray(0, jnp.int32)))
            # BCs (model.rs:826-875) with global row+column masks.
            from ..core.masks import masks_traced
            from ..ops.bc import apply_bcs
            ctx = _OffsetCtx2D(off_r, off_c)
            # Outlet zero-gradient copy for the separately carried
            # face nx (model.rs BC order: inlet, outlet copy, then the
            # no-slip rows zero its corners); cavity side walls pin it
            # to 0. The copy source u[:, nx-1] is read BEFORE the
            # core BCs below, like the reference's sequential order
            # (the later no-slip/obstacle writes don't feed it).
            if cavity:
                ul_new = jnp.zeros_like(u_last)
            else:
                ul_new = bcast_from_last(u2[:, loc_x - 1:loc_x],
                                         COL_AXIS)
                gr_u = off_r + lax.broadcasted_iota(
                    jnp.int32, ul_new.shape, 0)
                ul_new = jnp.where((gr_u == 0) | (gr_u == ny - 1),
                                   0.0, ul_new)
            _, _, mask_u_bc, mask_v_bc = masks_traced(
                g, opts.semantics, u2.dtype, ctx=ctx,
                shp_u=(loc_y, loc_x), shp_v=(loc_y, loc_x))
            u2, v2 = apply_bcs(u2, v2, g, params.inlet_profile, inlet,
                               mask_u_bc, mask_v_bc, params.flow_case,
                               ctx=ctx)
            return u2, v2, p2, pp_new, ul_new, err, None

        def sub_body(i, carry):
            u, v, p, pp, u_last, max_res_p, red = carry
            u, v, p, pp, u_last, err, extras = substep(u, v, p, pp, u_last)
            # JS tracks the max residual across substeps
            # (index.html:288-293); Rust reports the last substep's.
            max_res_p = jnp.maximum(max_res_p, err) if js else err
            red = extras if extras is not None else red
            return u, v, p, pp, u_last, max_res_p, red

        zero = jnp.asarray(0.0, u.dtype)
        zero3 = (zero, zero, zero)
        carry0 = (u, v, p, pp, u_last, zero, zero3)
        if not opts.substeps_adaptive and opts.substeps_init == 1:
            u, v, p, pp, u_last, res_p, red = sub_body(0, carry0)
        else:
            u, v, p, pp, u_last, res_p, red = lax.fori_loop(
                0, substeps, sub_body, carry0)
        if fast_tail:
            res_u, res_v, max_vel = red
        else:
            # Rounds mode: the residual/CFL reductions vs the
            # step-entry fields, with the separately carried face nx
            # folded in (the core block excludes it).
            res_u = jnp.maximum(jnp.max(jnp.abs(u - u_entry)),
                                jnp.max(jnp.abs(u_last - ul_entry)))
            res_v = jnp.max(jnp.abs(v - v_entry))
            max_vel = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))),
                jnp.max(jnp.abs(u_last)))

        def pmax2(x):
            return lax.pmax(lax.pmax(x, ROW_AXIS), COL_AXIS)

        return (u, v, p, pp, u_last, pmax2(res_p), pmax2(res_u),
                pmax2(res_v), pmax2(max_vel))

    rc = P(ROW_AXIS, COL_AXIS)
    row = P(ROW_AXIS, None)
    sharded_substeps = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rc, rc, rc, rc, row, P(), P(), P(), P()),
        out_specs=(rc, rc, rc, rc, row, P(), P(), P(), P()),
        check_vma=False)

    def step(s: Split2D):
        state = s.core
        f32 = state.u.dtype
        u_enter, v_enter = state.u, state.v
        ul_enter = s.u_last
        u, v, u_last = u_enter, v_enter, ul_enter
        if js and opts.extrapolate:
            # JS extrapolated initial guess (index.html:263-270);
            # elementwise on the sharded global arrays.
            nonzero = state.step > 0
            u = jnp.where(nonzero, 2.0 * u - state.u_prev, u)
            v = jnp.where(nonzero, 2.0 * v - state.v_prev, v)
            u_last = jnp.where(nonzero, 2.0 * u_last - s.u_prev_last,
                               u_last)
        inlet = ramped_inlet(opts, state, f32)
        substeps = state.substeps
        if not opts.substeps_adaptive and opts.substeps_init == 1:
            substeps = jnp.asarray(opts.substeps_init, substeps.dtype)
        dt_sub = state.dt / substeps.astype(f32)
        executed_substeps = substeps
        (u, v, p, pp, u_last, res_p, res_u, res_v,
         max_vel) = sharded_substeps(u, v, state.p, state.p_prime, u_last,
                                     dt_sub, state.nu, inlet, substeps)
        if js and opts.substeps_adaptive:
            substeps = adapt_substeps(opts, substeps, res_u, res_v, res_p,
                                      f32)
        new_step = state.step + 1
        new_t = state.t + state.dt
        new_dt = dt_control(g, opts, state, max_vel, res_p)
        new_core = dataclasses.replace(
            state, u=u, v=v, p=p, p_prime=pp,
            u_prev=u_enter if js else None, v_prev=v_enter if js else None,
            dt=new_dt, t=new_t, step=new_step, substeps=substeps,
            res_u=res_u, res_v=res_v, res_p=res_p)
        new_s = Split2D(core=new_core, u_last=u_last,
                        u_prev_last=ul_enter if js else None)
        diag = StepDiagnostics(step=new_step, t=new_t, dt=state.dt,
                               res_u=res_u, res_v=res_v, res_p=res_p,
                               substeps=executed_substeps)
        return new_s, diag

    return jax.jit(step) if jit else step


def make_run_shmap_2d(scene: Scene, mesh: Mesh, n_steps: int,
                      interpret: bool = False):
    """n steps of the explicitly 2-D-sharded step under lax.scan."""
    step = make_step_shmap_2d(scene, mesh, interpret, jit=False)

    def run(s: Split2D):
        def body(c, _):
            return step(c)
        return lax.scan(body, s, None, length=n_steps)

    return jax.jit(run)
