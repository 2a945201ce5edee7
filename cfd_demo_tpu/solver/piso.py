"""The PISO time-step, fully on-device.

Reference call stack being rebuilt (SURVEY.md section 3.1):
  Model::update (model.rs:304-379)
    -> piso_step (model.rs:529-730)
         predictor -> divergence -> Jacobi -> corrector
         -> up to 20 extra corrector rounds (model.rs:696-724)
         -> boundary conditions (model.rs:826-875)
  JS twin: updateSimulation (index.html:261-363) with extrapolation,
  adaptive substeps and the dt controller (index.html:333-358).

TPU-native design: one pure function advances the whole step; the
pressure iterations are lax.while_loop / lax.scan so hundreds of grid
sweeps run per dispatch without leaving the device; dt and the
convergence-controlled loop bounds live in the carry so there is no
host round trip (SURVEY.md section 7 "CFL dt control").
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.config import (Grid, PressureSolver, Semantics,
                           SimulationParams, SolverOptions)
from ..core.masks import build_masks
from ..core.state import State, init_state
from ..ops.bc import apply_bcs
from ..ops.corrector import correct
from ..ops.divergence import divergence_rhs
from ..ops.poisson import jacobi, multigrid, sor
from ..ops.predictor import predict


class StepDiagnostics(NamedTuple):
    """Per-step residual record (model.rs:23-32 Residuals)."""

    step: jnp.ndarray
    t: jnp.ndarray
    dt: jnp.ndarray
    res_u: jnp.ndarray
    res_v: jnp.ndarray
    res_p: jnp.ndarray
    substeps: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Scene:
    """A compiled simulation setup: grid + static numerics.

    Build with :func:`make_scene`. The returned ``step`` closure is the
    single-device jit target; runtime scalars flow through ``State``.
    The device path computes obstacle masks analytically from iota
    (core.masks.masks_traced); the materialized NumPy masks below are
    lazy, for host-side diagnostics only (runtime.trace) -- at 8192^2
    they would cost hundreds of MB of host RAM per scene otherwise.
    """

    grid: Grid
    params: SimulationParams
    opts: SolverOptions

    def init_state(self, dtype=jnp.float32) -> State:
        return init_state(self.grid, self.params, self.opts, dtype)

    @functools.cached_property
    def _masks(self):
        return build_masks(self.grid, self.opts.semantics)

    @property
    def mask_u(self) -> np.ndarray:
        return self._masks[0]

    @property
    def mask_v(self) -> np.ndarray:
        return self._masks[1]

    @property
    def mask_u_bc(self) -> np.ndarray:
        return self._masks[2]

    @property
    def mask_v_bc(self) -> np.ndarray:
        return self._masks[3]


def make_scene(grid: Grid, params: Optional[SimulationParams] = None,
               opts: Optional[SolverOptions] = None) -> Scene:
    opts = opts or SolverOptions()
    if opts.differentiable:
        # Reverse-mode AD needs every loop to be a fixed-trip scan:
        # exact early exits, Rust outer corrector rounds and dynamic
        # substep counts all lower to lax.while_loop, which has no
        # reverse rule (SolverOptions.differentiable docstring).
        bad = []
        solver_kind = (params or SimulationParams()).pressure_solver
        # The adaptive MG_PRODUCTION projection differentiates through
        # the solve-at-convergence VJP (ops.poisson.mgp_implicit_adjoint)
        # whose forward is hidden from AD, so its exact while_loop exits
        # are allowed; every other solver's early exit still lowers to a
        # reverse-underivable while_loop.
        mgp_implicit = (solver_kind == PressureSolver.MG_PRODUCTION
                        and opts.mgp_fixed_cycles == 0
                        and not opts.residual_dt_scaling)
        if opts.early_exit and not mgp_implicit:
            bad.append("early_exit=False")
        if opts.outer_corrector_rounds != 0:
            bad.append("outer_corrector_rounds=0")
        if opts.substeps_adaptive:
            bad.append("a static substep count (substeps_adaptive="
                       "False; the count is unrolled)")
        if bad:
            raise ValueError(
                "SolverOptions.differentiable requires "
                + ", ".join(bad))
    if opts.mgp_scheme not in ("auto", "aligned", "legacy"):
        # The tiers classify unknown strings oppositely (the XLA gate
        # tests == "aligned", the shmap gate != "legacy"); a typo must
        # fail loudly, not run different hierarchies per tier.
        raise ValueError(f"mgp_scheme must be auto|aligned|legacy, "
                         f"got {opts.mgp_scheme!r}")
    if opts.fdm_precision not in ("highest", "high"):
        raise ValueError(f"fdm_precision must be highest|high, "
                         f"got {opts.fdm_precision!r}")
    return Scene(grid=grid, params=params or SimulationParams(),
                 opts=opts)


# ---------------------------------------------------------------------------
# PISO substep
# ---------------------------------------------------------------------------

def _is_batched(x) -> bool:
    """True when ``x`` is a vmap tracer: the Pallas kernels' manual-DMA
    block specs do not auto-batch, so vmapped steps (the 64-scene
    ensemble, SURVEY.md section 2.7) take the XLA path, which vmaps for
    free."""
    return type(x).__name__ == "BatchTracer"


def _pallas_ok(scene: "Scene", example=None,
               allow_differentiable: bool = False) -> bool:
    """The fused kernel targets the TPU backend and tile-friendly rows;
    it implements both the channel and cavity pressure BC families.
    Differentiable mode bypasses every kernel (no VJPs) -- except
    callers that wrap the kernel in a custom VJP (the fixed-schedule
    fast-adjoint solve), which pass allow_differentiable=True."""
    return (jax.default_backend() in ("tpu", "axon")
            and scene.grid.ny % 8 == 0
            and (allow_differentiable or not scene.opts.differentiable)
            and not _is_batched(example))


def _use_fused_substep(scene: "Scene", dtype, example=None) -> bool:
    """Fused predictor+divergence / corrector+BC Pallas passes
    (kernels.substep_pallas). Single-chip TPU, f32 only; "auto"
    enables them at >= 2M cells where the HBM round trips between the
    XLA fusions dominate the non-pressure step cost (docs/PERF.md)."""
    impl = scene.opts.substep_impl
    if impl == "auto":
        ok = scene.grid.nx * scene.grid.ny >= 2_000_000
        if ok:
            # The row tiling must stay efficient: below 32-row blocks
            # the (bs+16)/bs window DMA redundancy eats the fusion win
            # (8192^2 would tile at bs=8 -> 3x reads; jnp is faster).
            from ..kernels.substep_pallas import _round_up, _tile_rows
            try:
                bs, _, _ = _tile_rows(scene.grid.ny,
                                      _round_up(scene.grid.nx + 1, 128),
                                      4, 5, 8, scene.opts.pallas_block_rows)
            except ValueError:
                bs = 0
            ok = bs >= 32
        impl = "pallas" if ok else "jnp"
    return (impl == "pallas" and _pallas_ok(scene, example)
            and dtype == jnp.float32)

def resolve_fuse_k(opts: SolverOptions, grid: Grid,
                   divide: int = 0) -> int:
    """pallas_fuse_k == 0 means size-tuned auto (docs/PERF.md).

    Auto picks k = 16: halo8(16) == halo8(10) == 16, so a 16-iteration
    launch has the same window/redundancy as 10 but runs 50 iterations
    in 4 launches instead of 5 -- measured 5% faster at 2048^2
    reference mode and 4% at 4096^2 fast (v5e). Also measured: k in
    {5, 10, 25} flat within noise at 512^2 single-block; k = iters
    (one whole-solve launch) ~9% SLOWER (a long serial fori_loop in
    one program loses the inter-launch DMA/compute overlap); k = 25
    at 2048^2 loses 20% to halo redundancy (halo8(25) = 32 forces
    bs = 128). The former >= 48M-cell k = 25 tier is gone since the
    round-3 large-window mode (kernels.jacobi_pallas): full-width row
    blocks make k = 16 the best measured everywhere (8192^2: 24.44 ms
    vs 24.52 at k = 25; 16384^2: 109.9 vs 115.3 at k = 8).

    ``divide`` > 0 (the explicit shard_map step, whose per-shard chain
    has no remainder launch) constrains auto to the largest k <= base
    that divides ``divide``; an explicit pallas_fuse_k is returned
    as-is and step_shmap's divisibility check still raises on misuse.
    """
    if opts.pallas_fuse_k:
        return opts.pallas_fuse_k
    base = 16
    if divide:
        while base > 1 and divide % base != 0:
            base -= 1
    return base


def _solve_pressure(scene: Scene, pp0, rhs, dt_sub=None):
    g, opts = scene.grid, scene.opts
    solver = scene.params.pressure_solver
    from ..ops.poisson import pprime_bc_fn
    bc = pprime_bc_fn(scene.params.flow_case)
    if solver == PressureSolver.MG_PRODUCTION:
        # Addition (docs/SPEC.md item 12): divergence-calibrated exit.
        # tol_r = div_tol / dt bounds the post-correction max|div(u)|
        # by div_tol; without dt (no caller context) the tol is used
        # in raw residual units.
        from ..ops.poisson import multigrid_production
        tol_r = opts.projection_div_tol
        if dt_sub is not None:
            tol_r = tol_r / dt_sub
        if (opts.differentiable and opts.mgp_fixed_cycles == 0
                and not opts.residual_dt_scaling):
            # Solve-at-convergence VJP (ops.poisson.mgp_implicit_adjoint):
            # the ADAPTIVE production projection differentiates exactly
            # (one transposed solve per backward pass), with the
            # non-differentiable forward machinery -- Pallas tiers,
            # while_loop exits -- running untouched under the custom
            # VJP. Gated off when res_p feeds the dynamics (JS
            # residual-dt scaling): err gradients are zero by
            # definition on this path, like every fast adjoint.
            from ..ops.poisson import mgp_implicit_adjoint
            return mgp_implicit_adjoint(pp0, rhs, g.dx, g.dy, opts,
                                        tol_r, bc=bc)
        return multigrid_production(pp0, rhs, g.dx, g.dy, opts, tol_r,
                                    bc=bc)
    if solver == PressureSolver.JACOBI:
        from ..core.config import FlowCase
        cavity = scene.params.flow_case == FlowCase.CAVITY

        def _solve_single(pp0_, rhs_):
            impl = opts.pressure_impl
            if impl == "auto":
                # Pallas wins at >= 2M cells regardless of semantics;
                # with a fixed iteration schedule (tol == 0, where
                # K-granularity early exit can't change behavior and the
                # kernel matches the jnp sweep to ~1 ulp) it also wins
                # at every smaller size measured (docs/PERF.md).
                fixed = opts.jacobi_tol == 0.0
                impl = ("pallas" if (g.nx * g.ny >= 2_000_000 or fixed)
                        else "jnp")
            if impl == "pallas" and _pallas_ok(scene, rhs_):
                from ..kernels.jacobi_pallas import jacobi_pallas
                return jacobi_pallas(pp0_, rhs_, g.dx, g.dy,
                                     opts.jacobi_omega,
                                     opts.jacobi_tol, opts.jacobi_iters,
                                     k=resolve_fuse_k(opts, g),
                                     block_rows=opts.pallas_block_rows,
                                     early_exit=opts.early_exit,
                                     cavity=cavity,
                                     # extra control-flow nesting around
                                     # the solve shrinks the scoped-vmem
                                     # headroom (jacobi_fused_k deep=)
                                     deep=(opts.outer_corrector_rounds > 0
                                           or opts.substeps_adaptive
                                           or opts.substeps_max > 1))
            return jacobi(pp0_, rhs_, g.dx, g.dy, opts.jacobi_omega,
                          opts.jacobi_tol, opts.jacobi_iters,
                          early_exit=opts.early_exit, bc=bc,
                          fixed_trip=opts.differentiable)

        if opts.differentiable:
            if opts.jacobi_tol == 0.0 and not opts.residual_dt_scaling:
                # Fast adjoint (ops.poisson.jacobi_fixed_adjoint): the
                # fixed-schedule solve is linear, so the backward pass
                # is ONE transposed application (no stored iterates)
                # and the forward may run the fused Pallas kernels.
                # Gated off when res_p feeds back into the dynamics
                # (JS residual-dt scaling): err gradients are zero by
                # definition on this path.
                from ..ops.poisson import jacobi_fixed_adjoint
                n_it = opts.jacobi_iters

                if (opts.pressure_impl in ("auto", "pallas")
                        and _pallas_ok(scene, rhs,
                                       allow_differentiable=True)
                        and pp0.dtype == jnp.float32):
                    from ..kernels.jacobi_pallas import jacobi_pallas

                    def forward(p0, r):
                        pp_, err_, _ = jacobi_pallas(
                            p0, r, g.dx, g.dy, opts.jacobi_omega, 0.0,
                            n_it, k=resolve_fuse_k(opts, g),
                            block_rows=opts.pallas_block_rows,
                            early_exit=False, cavity=cavity,
                            deep=(opts.substeps_max > 1))
                        return pp_, err_
                else:
                    def forward(p0, r):
                        pp_, err_, _ = jacobi(
                            p0, r, g.dx, g.dy, opts.jacobi_omega, 0.0,
                            n_it, early_exit=False, bc=bc,
                            fixed_trip=True)
                        return pp_, err_

                pp_out, err_out = jacobi_fixed_adjoint(
                    pp0, rhs, g.dx, g.dy, opts.jacobi_omega, n_it, bc,
                    forward)
                return pp_out, err_out, jnp.asarray(max(1, n_it),
                                                    jnp.int32)
            # jax.custom_batching.custom_vmap blocks reverse-mode AD;
            # differentiable mode takes the plain jnp solve (vmap of it
            # is the same masked fixed-trip scan per element).
            return _solve_single(pp0, rhs)

        # Under vmap (the 64-scene ensemble, SURVEY.md section 2.7) the
        # solve routes to the batched whole-solve kernel: one launch
        # runs every scene's full masked-convergence solve VMEM-
        # resident (kernels.jacobi_pallas._kernel_batch), instead of
        # one latency-floor XLA pass per iteration over the batch.
        # Per-element semantics are ops.poisson._masked_while exactly
        # (single-iteration-granularity freeze), for EITHER early_exit
        # flag -- masked iteration is the vmap-correct reading of the
        # reference's per-scene early exit (a lifted while_loop would
        # keep sweeping converged scenes, changing their fields).
        solve = jax.custom_batching.custom_vmap(_solve_single)

        @solve.def_vmap
        def _vmap_rule(axis_size, in_batched, pp0_, rhs_):
            pb, rb = in_batched
            if not pb:
                pp0_ = jnp.broadcast_to(pp0_, (axis_size,) + pp0_.shape)
            if not rb:
                rhs_ = jnp.broadcast_to(rhs_, (axis_size,) + rhs_.shape)
            from ..kernels.jacobi_pallas import (jacobi_batch_ok,
                                                jacobi_pallas_batch)
            if (opts.pressure_impl in ("auto", "pallas")
                    and jax.default_backend() in ("tpu", "axon")
                    and pp0_.dtype == jnp.float32
                    and not _is_batched(pp0_) and not _is_batched(rhs_)
                    and jacobi_batch_ok(g.ny, g.nx)):
                out = jacobi_pallas_batch(
                    pp0_, rhs_, g.dx, g.dy, opts.jacobi_omega,
                    opts.jacobi_tol, opts.jacobi_iters, cavity=cavity)
            else:
                out = jax.vmap(
                    lambda a, b: jacobi(a, b, g.dx, g.dy,
                                        opts.jacobi_omega,
                                        opts.jacobi_tol,
                                        opts.jacobi_iters,
                                        early_exit=False, bc=bc)
                )(pp0_, rhs_)
            return out, (True, True, True)

        return solve(pp0, rhs)
    if solver == PressureSolver.SOR:
        if opts.sor_ordering == "lexicographic":
            # JS-ordering-exact mode (docs/SPEC.md item 4): the
            # wavefront sweep reproduces the sequential in-place
            # ordering bitwise. Always the jnp path -- its cost is the
            # (nx+ny) sequential diagonal depth, which no kernel tiling
            # can remove.
            from ..ops.poisson import sor_lexicographic
            return sor_lexicographic(pp0, rhs, g.dx, g.dy,
                                     opts.sor_omega, opts.jacobi_tol,
                                     opts.jacobi_iters,
                                     early_exit=opts.early_exit, bc=bc,
                                     fixed_trip=opts.differentiable)
        if (opts.differentiable and opts.jacobi_tol == 0.0
                and not opts.residual_dt_scaling):
            # Fast adjoint (ops.poisson.fixed_linear_adjoint): the
            # fixed-schedule red/black solve is linear in (p'0, rhs)
            # exactly like the fixed Jacobi schedule -- one transposed
            # sweep recursion, no stored iterates, Pallas-eligible
            # forward. Same err-gradient-is-zero convention and
            # residual_dt_scaling gate as the Jacobi fast path.
            from ..ops.poisson import (_iota_masks, _sor_sweep,
                                       fixed_linear_adjoint)
            n_it = opts.jacobi_iters

            def sor_iter(p_, r_):
                # masks built INSIDE the map: anything traced closed
                # over here would leak a scan-trace tracer into the
                # transpose jaxpr as a constant
                _, rr_, cc_ = _iota_masks(p_.shape)
                return _sor_sweep(p_, r_, g.dx, g.dy, opts.sor_omega,
                                  (rr_ + cc_) % 2 == 0,
                                  (rr_ + cc_) % 2 == 1, bc)[0]

            from ..core.config import FlowCase
            from ..kernels.sor_pallas import sor_pallas, sor_pallas_ok
            k_s = max(resolve_fuse_k(opts, g, divide=n_it) // 2, 1)
            if (opts.pressure_impl in ("auto", "pallas")
                    and _pallas_ok(scene, rhs, allow_differentiable=True)
                    and pp0.dtype == jnp.float32
                    and sor_pallas_ok(g.ny, g.nx, k_s,
                                      opts.pallas_block_rows)):
                def forward(p0, r):
                    pp_, err_, _ = sor_pallas(
                        p0, r, g.dx, g.dy, opts.sor_omega, 0.0, n_it,
                        k=k_s, block_rows=opts.pallas_block_rows,
                        early_exit=False,
                        cavity=(scene.params.flow_case
                                == FlowCase.CAVITY))
                    return pp_, err_
            else:
                def forward(p0, r):
                    pp_, err_, _ = sor(p0, r, g.dx, g.dy, opts.sor_omega,
                                       0.0, n_it, early_exit=False,
                                       bc=bc, fixed_trip=True)
                    return pp_, err_

            pp_out, err_out = fixed_linear_adjoint(sor_iter, n_it,
                                                   forward, pp0, rhs)
            return pp_out, err_out, jnp.asarray(max(1, n_it), jnp.int32)
        impl = opts.pressure_impl
        if impl == "auto":
            impl = ("pallas" if (g.nx * g.ny >= 2_000_000
                                 or opts.jacobi_tol == 0.0) else "jnp")
        if impl == "pallas" and _pallas_ok(scene, rhs):
            from ..core.config import FlowCase
            from ..kernels.sor_pallas import (sor_pallas, sor_pallas_ok,
                                              sor_pallas_rb2, sor_rb2_ok)
            cavity = scene.params.flow_case == FlowCase.CAVITY
            k = max(resolve_fuse_k(opts, g) // 2, 1)  # halo spans 2k rows
            # Round 4: the color-compressed launch chain (half-width
            # per-color arrays -> half the roll volume per iteration)
            # measured 1.3-1.9x the uncompressed kernel at every size
            # probed >= 2M cells (tools/probe_sor_rb2.py); compression
            # is two XLA passes per solve, so small grids keep the
            # uncompressed single-array form. Auto k from the measured
            # ladder (/tmp-protocol in docs/PERF.md round 4): k=25 (two
            # launches at 50 iters) wins up to 8192 lanes, k=12 at
            # 16384 where the 2k-row halo on bs=128 blocks turns over;
            # an explicit pallas_fuse_k keeps the halved-k convention.
            # (2048 lanes measured launch-latency-bound: k=25 LOST
            # 2.8 -> 3.7 ms/step there, so small widths keep the
            # halved-k convention.)
            # ADVICE r4: the big auto-k values coarsen the convergence-
            # check granularity (a solve converging at iteration ~5
            # would still run 25), changing n_run/fields in the
            # more-converged direction for ADAPTIVE solves. Keep the
            # halved-k convention whenever the tolerance exit is live
            # (early_exit with jacobi_tol > 0) and reserve 25/12 for
            # the fixed-schedule tol=0 path where only launch count
            # matters.
            adaptive = opts.early_exit and opts.jacobi_tol > 0.0
            k_rb2 = k if (opts.pallas_fuse_k or adaptive) else (
                12 if g.nx >= 16384 else 25 if g.nx >= 4096 else k)
            if g.nx * g.ny >= 2_000_000 and sor_rb2_ok(g.ny, g.nx, k_rb2):
                return sor_pallas_rb2(pp0, rhs, g.dx, g.dy,
                                      opts.sor_omega, opts.jacobi_tol,
                                      opts.jacobi_iters, k=k_rb2,
                                      early_exit=opts.early_exit,
                                      cavity=cavity)
            if sor_pallas_ok(g.ny, g.nx, k, opts.pallas_block_rows):
                return sor_pallas(pp0, rhs, g.dx, g.dy, opts.sor_omega,
                                  opts.jacobi_tol, opts.jacobi_iters, k=k,
                                  block_rows=opts.pallas_block_rows,
                                  early_exit=opts.early_exit,
                                  cavity=cavity)
        return sor(pp0, rhs, g.dx, g.dy, opts.sor_omega,
                   opts.jacobi_tol, opts.jacobi_iters,
                   early_exit=opts.early_exit, bc=bc,
                   fixed_trip=opts.differentiable)
    if solver == PressureSolver.MULTIGRID:
        return multigrid(pp0, rhs, g.dx, g.dy, opts)
    if solver == PressureSolver.FDM:
        # Exact direct projection (docs/SPEC.md item 13): the folded
        # interior system A p' = rhs solved by fast diagonalization
        # (ops/fdm.py) -- the fixed point every iterative solver here
        # converges to. Warm starts are irrelevant (pp0 ignored); the
        # returned err is the true post-solve residual (f32 noise
        # floor), computed for diagnostics parity with the iterative
        # solvers. Linear + fixed-shape => differentiable and vmappable
        # as-is.
        from ..core.config import FlowCase
        from ..ops.fdm import fdm_solve_interior
        from ..ops.poisson import _mg_residual
        cavity = scene.params.flow_case == FlowCase.CAVITY
        ny, nx = g.ny, g.nx
        # 2-D contract like every solver branch (vmap batches via
        # tracers; bc unpacks a 2-D shape).
        e_int = fdm_solve_interior(rhs[1:ny - 1, 1:nx - 1], g.dx, g.dy,
                                   east_dirichlet=not cavity,
                                   d_wall=g.dx,
                                   precision=opts.fdm_precision)
        pp = bc(jnp.pad(e_int, 1))
        err = jnp.max(jnp.abs(_mg_residual(pp, rhs, g.dx, g.dy)))
        return pp, err, jnp.ones((), jnp.int32)
    raise ValueError(solver)


def _outer_rounds(scene: Scene, u, v, p, pp, err, dt_sub):
    """Rust-only outer corrector rounds (model.rs:696-724): repeat
    div -> solve -> correct until the pressure residual drops below
    outer_corrector_tol, at most outer_corrector_rounds times."""
    g, opts = scene.grid, scene.opts
    rounds = opts.outer_corrector_rounds
    if rounds == 0:
        return u, v, p, pp, err

    def round_body(u, v, p, pp):
        rhs = divergence_rhs(u, v, dt_sub, g.dx, g.dy)
        pp, err, _ = _solve_pressure(scene, pp, rhs, dt_sub)
        u, v, p = correct(u, v, p, pp, dt_sub, g.dx, g.dy)
        return u, v, p, pp, err

    if opts.early_exit:
        def cond(carry):
            _, _, _, _, err, it = carry
            return jnp.logical_and(it < rounds,
                                   err >= opts.outer_corrector_tol)

        def body(carry):
            u, v, p, pp, _, it = carry
            u, v, p, pp, err = round_body(u, v, p, pp)
            return u, v, p, pp, err, it + 1

        u, v, p, pp, err, _ = lax.while_loop(
            cond, body, (u, v, p, pp, err, jnp.asarray(0, jnp.int32)))
    else:
        # Masked while: per-element freezing in the body keeps vmap
        # semantics exact while the batch exits when all are done
        # (see ops.poisson._masked_while).
        def cond(carry):
            *_, done, it = carry
            return jnp.logical_and(it < rounds, jnp.logical_not(done))

        def body(carry):
            u, v, p, pp, err, done, it = carry
            u2, v2, p2, pp2, err2 = round_body(u, v, p, pp)
            sel = lambda a, b: jnp.where(done, a, b)
            u, v, p = sel(u, u2), sel(v, v2), sel(p, p2)
            pp, err = sel(pp, pp2), sel(err, err2)
            done = jnp.logical_or(done, err < opts.outer_corrector_tol)
            return u, v, p, pp, err, done, it + 1

        u, v, p, pp, err, _, _ = lax.while_loop(
            cond, body,
            (u, v, p, pp, err, err < opts.outer_corrector_tol,
             jnp.asarray(0, jnp.int32)))
    return u, v, p, pp, err


def _substep_jnp(scene: Scene, u, v, p, p_prime, dt_sub, nu, inlet):
    """The pure-XLA substep path (predict -> solve -> correct -> outer
    rounds -> BCs). Returns (u, v, p, pp, err)."""
    g, opts = scene.grid, scene.opts
    from ..core.masks import masks_traced
    mask_u, mask_v, mask_u_bc, mask_v_bc = masks_traced(
        g, opts.semantics, u.dtype)
    u_star, v_star = predict(u, v, dt_sub, nu, g.dx, g.dy, g.nx, g.ny,
                             scene.params.velocity_scheme,
                             opts.semantics == Semantics.JS,
                             mask_u, mask_v)
    rhs = divergence_rhs(u_star, v_star, dt_sub, g.dx, g.dy)
    pp0 = (p_prime if opts.semantics == Semantics.RUST
           else jnp.zeros_like(p_prime))
    # Small single-scene grids (incl. the reference's own 800x264 /
    # 400x132 defaults) fuse everything after the predictor into ONE
    # in-VMEM launch: Jacobi + corrector + outer rounds + BCs with
    # exact while_loop early exits (kernels.rounds_pallas).
    from ..kernels.rounds_pallas import (rounds_pallas_ok,
                                         solve_correct_rounds_pallas)
    if (scene.params.pressure_solver == PressureSolver.JACOBI
            and opts.pressure_impl in ("auto", "pallas")
            and opts.substep_impl in ("auto", "pallas")
            and not opts.differentiable
            and jax.default_backend() in ("tpu", "axon")
            and u.dtype == jnp.float32
            and not _is_batched(u) and not _is_batched(rhs)
            and rounds_pallas_ok(g)):
        u, v, p, pp, err = solve_correct_rounds_pallas(
            u_star, v_star, p, pp0, rhs, dt_sub, inlet, scene)
        return u, v, p, pp, err
    pp, err, _ = _solve_pressure(scene, pp0, rhs, dt_sub)
    u, v, p = correct(u_star, v_star, p, pp, dt_sub, g.dx, g.dy)
    u, v, p, pp, err = _outer_rounds(scene, u, v, p, pp, err, dt_sub)
    u, v = apply_bcs(u, v, g, scene.params.inlet_profile, inlet,
                     mask_u_bc, mask_v_bc, scene.params.flow_case)
    return u, v, p, pp, err


def _substep_unfused(scene: Scene):
    """custom_vmap wrapper over _substep_jnp: under vmap (the 64-scene
    ensemble) the whole substep routes to ONE whole-scene-in-VMEM
    Pallas launch per substep (kernels.ensemble_pallas), with per-scene
    while_loop early exit for the Jacobi iterations and the outer
    corrector rounds -- per-element results match an unbatched run
    (the masked-iteration semantics, tests/test_sharding.py)."""
    single = partial(_substep_jnp, scene)
    if scene.opts.differentiable:
        # custom_vmap blocks reverse-mode AD; the jnp substep vmaps
        # fine by itself (masked fixed-trip loops), it just forgoes
        # the whole-scene ensemble kernel -- which differentiable mode
        # bypasses anyway.
        return single
    wrapped = jax.custom_batching.custom_vmap(
        lambda u, v, p, pp, dts, nu, inl: single(u, v, p, pp, dts, nu,
                                                 inl))

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a, (axis_size,)
                                             + jnp.shape(a))
                for a, b in zip(args, in_batched)]
        from ..kernels.ensemble_pallas import (substep_batch_ok,
                                               substep_batch_pallas)
        opts = scene.opts
        if (jax.default_backend() in ("tpu", "axon")
                and args[0].dtype == jnp.float32
                # The whole-scene kernel carries in-kernel Jacobi AND
                # red/black SOR solvers (round 3); multigrid scenes and
                # the sequential lexicographic SOR ordering take the
                # vmapped jnp path.
                and (scene.params.pressure_solver == PressureSolver.JACOBI
                     or (scene.params.pressure_solver == PressureSolver.SOR
                         and opts.sor_ordering != "lexicographic"
                         # measured (docs/PERF.md round 3): the SOR
                         # kernel wins 1.35x at B=8 but loses 18% at
                         # B=64 (the 2k-ring color sweeps cost more
                         # VPU than the XLA batch path's HBM floor
                         # saves at large B)
                         and axis_size <= 16))
                and opts.pressure_impl in ("auto", "pallas")
                and opts.substep_impl in ("auto", "pallas")
                and not any(_is_batched(a) for a in args)
                and substep_batch_ok(scene.grid)):
            out = substep_batch_pallas(args[0], args[1], args[2],
                                       args[3], args[4], args[5],
                                       args[6], scene)
        else:
            out = jax.vmap(single)(*args)
        return out, (True,) * 5

    return wrapped


def piso_substep(scene: Scene, u, v, p, p_prime, dt_sub, nu, inlet,
                 entry=None, u_padded: bool = False):
    """One PISO substep (model.rs:529-730 / index.html:366-867).

    Returns (u, v, p, p_prime, p_residual, extras) where extras is
    None, or -- on the fully fused Pallas path, when ``entry`` carries
    the step-entry (u, v) -- the in-kernel (res_u, res_v, max_vel)
    reductions so step_fn skips its own passes over the fields.

    ``u_padded`` (padded-rollout mode, make_run): ``u`` and ``entry[0]``
    arrive lane-padded to (ny, nxp) and the returned u stays padded --
    the pad columns are zero and provably idempotent through the
    kernels, so the whole rollout pays NO per-step pad/slice passes.
    Only valid on the fully fused path (fused, aligned, rounds == 0).
    """
    g, opts = scene.grid, scene.opts
    nx, ny = g.nx, g.ny
    avg_conv_v = opts.semantics == Semantics.JS
    scheme = scene.params.velocity_scheme
    rounds = opts.outer_corrector_rounds
    fused = _use_fused_substep(scene, u.dtype, u)

    aligned = nx % 128 == 0
    if u_padded:
        assert fused and aligned and rounds == 0 and entry is not None
    if not fused:
        u, v, p, pp, err = _substep_unfused(scene)(
            u, v, p, p_prime, dt_sub, nu, inlet)
        return u, v, p, pp, err, None
    from ..kernels.substep_pallas import _round_up, predict_div_pallas
    if aligned:
        # Lane-aligned fast path: u flows padded through the whole
        # substep (one pad here -- or zero in padded-rollout mode --
        # and one slice in the corrector kernel) and every other
        # array keeps its exact shape: no other pad/slice copies.
        nxp = _round_up(nx + 1, 128)
        up = (u if u_padded
              else jnp.pad(u, ((0, 0), (0, nxp - (nx + 1)))))
        u_star, v_star, rhs = predict_div_pallas(
            up, v, dt_sub, nu, g, scheme, opts.semantics,
            block_rows=opts.pallas_block_rows, pad_io=False)
    else:
        u_star, v_star, rhs = predict_div_pallas(
            u, v, dt_sub, nu, g, scheme, opts.semantics,
            block_rows=opts.pallas_block_rows)
    pp0 = p_prime if opts.semantics == Semantics.RUST else jnp.zeros_like(p_prime)
    pp, err, _ = _solve_pressure(scene, pp0, rhs, dt_sub)

    if rounds == 0 and entry is not None:
        from ..kernels.substep_pallas import correct_bc_pallas
        if aligned:
            # u_star is already padded; pad the entry field (in Rust
            # semantics entry[0] IS this substep's u, so XLA CSEs this
            # with the predictor's pad). In padded-rollout mode the
            # entry is already padded and u is returned padded.
            ue = (entry[0] if u_padded
                  else jnp.pad(entry[0], ((0, 0), (0, nxp - (nx + 1)))))
            u, v, p, res_u, res_v, max_vel = correct_bc_pallas(
                u_star, v_star, p, pp, ue, entry[1], dt_sub, inlet,
                g, scene.params.inlet_profile, scene.params.flow_case,
                opts.semantics, block_rows=opts.pallas_block_rows,
                pad_io=False, return_padded_u=u_padded)
        else:
            u, v, p, res_u, res_v, max_vel = correct_bc_pallas(
                u_star, v_star, p, pp, entry[0], entry[1], dt_sub, inlet,
                g, scene.params.inlet_profile, scene.params.flow_case,
                opts.semantics, block_rows=opts.pallas_block_rows)
        return u, v, p, pp, err, (res_u, res_v, max_vel)

    from ..core.masks import masks_traced
    rounds_impl = opts.rounds_impl
    if rounds_impl == "auto":
        # Measured (v5e, 2048^2 reference mode): the round kernel's
        # window DMA costs MORE than XLA's fused corrector+divergence
        # glue between the Jacobi launch chains, so auto stays on jnp
        # (docs/PERF.md negative result); "pallas" remains a forceable
        # tier for future toolchains.
        rounds_impl = "jnp"
    if rounds > 0 and opts.early_exit and rounds_impl == "pallas":
        # Fused outer rounds (model.rs:696-724): each round is the
        # Jacobi launch chain plus ONE corrector+divergence launch --
        # the next round's recompute_divergence is produced inside the
        # corrector kernel, so no XLA glue passes run between rounds.
        from ..kernels.substep_pallas import correct_div_pallas
        cd = partial(correct_div_pallas, dt_sub=dt_sub, grid=g,
                     block_rows=opts.pallas_block_rows,
                     pad_io=not aligned)
        u, v, p, rhs = cd(u_star, v_star, p, pp)

        def cond(carry):
            *_, err_c, it = carry
            return jnp.logical_and(it < rounds,
                                   err_c >= opts.outer_corrector_tol)

        def body(carry):
            u, v, p, pp, rhs, _, it = carry
            pp, err_b, _ = _solve_pressure(scene, pp, rhs, dt_sub)
            u, v, p, rhs = cd(u, v, p, pp)
            return u, v, p, pp, rhs, err_b, it + 1

        u, v, p, pp, rhs, err, _ = lax.while_loop(
            cond, body,
            (u, v, p, pp, rhs, err, jnp.asarray(0, jnp.int32)))
        if aligned:
            u = u[:, :nx + 1]
        _, _, mask_u_bc, mask_v_bc = masks_traced(g, opts.semantics,
                                                  u.dtype)
        u, v = apply_bcs(u, v, g, scene.params.inlet_profile, inlet,
                         mask_u_bc, mask_v_bc, scene.params.flow_case)
        return u, v, p, pp, err, None
    if aligned:
        u_star = u_star[:, :nx + 1]  # back to storage shape for the jnp path
    _, _, mask_u_bc, mask_v_bc = masks_traced(g, opts.semantics, u.dtype)
    u, v, p = correct(u_star, v_star, p, pp, dt_sub, g.dx, g.dy)
    u, v, p, pp, err = _outer_rounds(scene, u, v, p, pp, err, dt_sub)
    u, v = apply_bcs(u, v, g, scene.params.inlet_profile, inlet,
                     mask_u_bc, mask_v_bc, scene.params.flow_case)
    return u, v, p, pp, err, None


# ---------------------------------------------------------------------------
# Step-level scalar controls, shared by the single-device step_fn and
# the explicitly sharded step (shard.step_shmap) so the two cannot
# drift apart.
# ---------------------------------------------------------------------------

def ramped_inlet(opts: SolverOptions, state: State, f32):
    """Inlet ramp (model.rs:311-316 / index.html:277-281)."""
    ramp = jnp.minimum(
        state.step.astype(f32) / float(opts.ramp_up_steps), 1.0)
    return ramp * state.target_inlet


def adapt_substeps(opts: SolverOptions, substeps, res_u, res_v, res_p, f32):
    """JS substep adaptation (index.html:310-317): grow by the error
    ratio above tolerance, halve when well below."""
    error_norm = jnp.maximum(jnp.maximum(res_u, res_v), res_p)
    tol = opts.substep_tolerance
    factor = error_norm / tol
    grown = jnp.minimum(
        jnp.ceil(substeps.astype(f32) * factor),
        float(opts.substeps_max)).astype(jnp.int32)
    shrunk = jnp.maximum(substeps // 2, 1)
    return jnp.where(
        error_norm > tol, grown,
        jnp.where(jnp.logical_and(error_norm < tol / 10.0, substeps > 1),
                  shrunk, substeps))


def dt_control(grid: Grid, opts: SolverOptions, state: State,
               max_vel, res_p):
    """CFL dt control with the 1.1x growth cap (model.rs:877-889 /
    index.html:1326-1341), plus the JS residual-based dt scaling
    (index.html:338-350)."""
    js = opts.semantics == Semantics.JS
    cap = state.dt_user if js else state.dt
    # Safe-where: the masked-out division still runs, and at
    # max_vel == 0 its inf primal would poison reverse-mode cotangents
    # with 0 * inf = NaN (SolverOptions.differentiable); dividing by
    # the guarded value keeps the primal bit-identical.
    safe_vel = jnp.where(max_vel == 0.0, 1.0, max_vel)
    dt_cfl = jnp.where(
        max_vel == 0.0, cap,
        jnp.minimum(opts.cfl * min(grid.dx, grid.dy) / safe_vel, cap))
    if js and opts.residual_dt_scaling:
        ptol = opts.residual_dt_tol
        dt_pressure = jnp.where(res_p > ptol,
                                dt_cfl * (ptol / (res_p + 1e-10)), dt_cfl)
        dt_cfl = jnp.minimum(dt_cfl, dt_pressure)
    return jnp.where(dt_cfl > state.dt,
                     jnp.minimum(dt_cfl, state.dt * opts.dt_growth_cap),
                     dt_cfl)


# ---------------------------------------------------------------------------
# Full outer step
# ---------------------------------------------------------------------------

def step_fn(scene: Scene, state: State,
            u_padded: bool = False) -> Tuple[State, StepDiagnostics]:
    """One Model::update / updateSimulation. Pure; jit/vmap/scan-able.

    ``u_padded`` (make_run's padded-rollout mode): state.u (and u_prev)
    are lane-padded to (ny, nxp) with zero, idempotent pad columns, so
    the fused kernels skip the per-step pad/slice passes entirely.
    """
    g, opts = scene.grid, scene.opts
    js = opts.semantics == Semantics.JS
    f32 = state.u.dtype

    u_enter, v_enter = state.u, state.v
    u, v = u_enter, v_enter
    # JS extrapolated initial guess (index.html:263-270). NOTE: the JS
    # copies uPrev from the *end-of-step* field (index.html:360-362),
    # which makes its 2u - uPrev a no-op; we restore the intended
    # semantics (u_prev = previous converged field). Set
    # opts.extrapolate=False for the JS's effective behavior. docs/SPEC.md.
    if js and opts.extrapolate:
        nonzero = state.step > 0
        u = jnp.where(nonzero, 2.0 * u - state.u_prev, u)
        v = jnp.where(nonzero, 2.0 * v - state.v_prev, v)
    u_old, v_old = u, v

    inlet = ramped_inlet(opts, state, f32)

    substeps = state.substeps
    # The static-count branches below execute exactly substeps_init
    # substeps regardless of the carried counter (a state resumed from
    # a JS adaptive run can carry substeps != substeps_init); pin
    # dt_sub to the count actually run so the substeps always sum to
    # one full dt of physical time.
    if not opts.substeps_adaptive and (opts.substeps_init == 1
                                       or opts.differentiable):
        substeps = jnp.asarray(opts.substeps_init, substeps.dtype)
    dt_sub = state.dt / substeps.astype(f32)
    # The count this step actually executes -- reported in the
    # diagnostics (physical_pressure divides forces by it) and
    # distinct from both the carried counter (overridden above) and
    # the post-step adapted value.
    executed_substeps = substeps

    # On the fully fused Pallas path the corrector kernel also computes
    # the residual/CFL reductions in-pass (vs the step-entry fields),
    # saving the separate whole-field passes below.
    fused_red = (_use_fused_substep(scene, f32, state.u)
                 and opts.outer_corrector_rounds == 0)
    if u_padded:
        assert fused_red, "padded-rollout mode requires the fused path"
    entry = (u_old, v_old) if fused_red else None

    def sub_body(i, carry):
        u, v, p, pp, max_res_p, red = carry
        u, v, p, pp, err, extras = piso_substep(scene, u, v, p, pp, dt_sub,
                                                state.nu, inlet, entry=entry,
                                                u_padded=u_padded)
        # JS tracks the max residual across substeps (index.html:288-293);
        # Rust reports the last substep's residual (model.rs:326).
        max_res_p = jnp.maximum(max_res_p, err) if js else err
        red = extras if extras is not None else red
        return u, v, p, pp, max_res_p, red

    zero = jnp.asarray(0.0, f32)
    red0 = (zero, zero, zero) if fused_red else None
    carry0 = (u, v, state.p, state.p_prime, zero, red0)
    if not opts.substeps_adaptive and opts.substeps_init == 1:
        # Statically one substep (Rust semantics): skip the dynamic
        # fori_loop wrapper so XLA fuses across the substep boundary.
        u, v, p, pp, res_p, red = sub_body(0, carry0)
    elif not opts.substeps_adaptive and opts.differentiable:
        # Static substep count, unrolled: the dynamic fori_loop's
        # traced trip count lowers to while_loop, which has no
        # reverse-mode rule.
        carry = carry0
        for i in range(opts.substeps_init):
            carry = sub_body(i, carry)
        u, v, p, pp, res_p, red = carry
    else:
        u, v, p, pp, res_p, red = lax.fori_loop(
            0, substeps, sub_body, carry0)

    if fused_red:
        res_u, res_v, fused_max_vel = red
    else:
        res_u = jnp.max(jnp.abs(u - u_old))
        res_v = jnp.max(jnp.abs(v - v_old))
    new_step = state.step + 1
    new_t = state.t + state.dt

    # Substep adaptation (index.html:310-317).
    if js and opts.substeps_adaptive:
        substeps = adapt_substeps(opts, substeps, res_u, res_v, res_p, f32)

    # CFL dt control (model.rs:877-889 / index.html:1326-1341).
    max_vel = (fused_max_vel if fused_red
               else jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))))
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


def _resolve_donate(donate):
    """Buffer donation keeps the fields update-in-place in HBM, but the
    axon PJRT backend (the tunneled single-chip dev path) rejects
    donated buffers; 'auto' enables donation everywhere else."""
    if donate == "auto":
        return jax.default_backend() != "axon"
    return bool(donate)


def make_step(scene: Scene, donate="auto", jit: bool = True):
    """jit-compiled single step: state -> (state, diagnostics)."""
    fn = partial(step_fn, scene)
    if not jit:
        return fn
    return jax.jit(fn, donate_argnums=(0,) if _resolve_donate(donate) else ())


def make_run(scene: Scene, n_steps: int, donate="auto"):
    """n steps fused under lax.scan: state -> (state, stacked diags).

    This is the throughput path: the scan keeps every pressure sweep on
    device and only the (n_steps,)-shaped scalar diagnostics come back.
    On the fully fused Pallas path, u is carried lane-padded through
    the whole scan (one pad before, one slice after) so no step pays a
    pad/slice pass -- the pad columns are zero and idempotent through
    the kernels (see piso_substep).

    With opts.differentiable, each step is rematerialized
    (jax.checkpoint): jax.grad through the rollout stores only the
    per-step State carries and recomputes a step's internals during
    the backward pass, so backward memory is one step's activations
    (~jacobi_iters fields), not the rollout's.
    """
    g, opts = scene.grid, scene.opts
    nx = g.nx

    def run(state: State):
        padded = (_use_fused_substep(scene, state.u.dtype, state.u)
                  and opts.outer_corrector_rounds == 0
                  and nx % 128 == 0)
        if padded:
            from ..kernels.substep_pallas import _round_up
            nxp = _round_up(nx + 1, 128)
            pad = ((0, 0), (0, nxp - (nx + 1)))
            padf = lambda a: None if a is None else jnp.pad(a, pad)
            state = dataclasses.replace(state, u=padf(state.u),
                                        u_prev=padf(state.u_prev))

        def body(s, _):
            s, d = step_fn(scene, s, u_padded=padded)
            return s, d

        if opts.differentiable:
            body = jax.checkpoint(body)

        state, diags = lax.scan(body, state, None, length=n_steps)
        if padded:
            cut = lambda a: None if a is None else a[:, :nx + 1]
            state = dataclasses.replace(state, u=cut(state.u),
                                        u_prev=cut(state.u_prev))
        return state, diags

    return jax.jit(run, donate_argnums=(0,) if _resolve_donate(donate) else ())
