"""Whole-scene-in-VMEM batched substep kernel
(kernels.ensemble_pallas) vs the vmapped jnp substep path, interpret
mode on CPU."""
import dataclasses
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfd_demo_tpu.core.config import (Cylinder, FlowCase, Grid,
                                      PressureSolver, Semantics,
                                      SimulationParams, VelocityScheme,
                                      solver_options_for)
from cfd_demo_tpu.kernels.ensemble_pallas import (substep_batch_ok,
                                                  substep_batch_pallas)
from cfd_demo_tpu.solver.piso import _substep_jnp, make_scene


def _batched_inputs(scene, B, seed=0):
    rng = np.random.default_rng(seed)
    g = scene.grid
    base = scene.init_state()

    def noisy(x, s):
        return jnp.asarray(
            np.asarray(x)[None] + s * rng.standard_normal(
                (B,) + x.shape).astype(np.float32))

    u = noisy(base.u, 0.05)
    v = noisy(base.v, 0.05)
    p = noisy(base.p, 0.01)
    pp = jnp.zeros((B,) + base.p_prime.shape, jnp.float32)
    return u, v, p, pp


@pytest.mark.parametrize("semantics,scheme,flow_case,obstacle", [
    (Semantics.RUST, VelocityScheme.FIRST, FlowCase.CHANNEL, True),
    (Semantics.RUST, VelocityScheme.SECOND, FlowCase.CHANNEL, True),
    (Semantics.JS, VelocityScheme.QUICK, FlowCase.CHANNEL, True),
    (Semantics.RUST, VelocityScheme.FIRST, FlowCase.CAVITY, False),
])
def test_substep_batch_matches_vmapped_jnp(semantics, scheme, flow_case,
                                           obstacle):
    B = 4
    obstacles = (Cylinder(0.9, 0.75, 0.3),) if obstacle else ()
    grid = Grid(nx=40, ny=24, lx=3.0, ly=1.5, obstacles=obstacles)
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              velocity_scheme=scheme,
                              flow_case=flow_case)
    opts = solver_options_for(semantics, early_exit=False)
    scene = make_scene(grid, params, opts)
    assert substep_batch_ok(grid)
    u, v, p, pp = _batched_inputs(scene, B)
    nus = jnp.asarray(np.geomspace(1e-5, 1e-3, B), jnp.float32)
    dts = jnp.full((B,), 0.002, jnp.float32)
    inls = jnp.asarray(np.linspace(0.5, 1.5, B), jnp.float32)

    ref = jax.vmap(partial(_substep_jnp, scene))(u, v, p, pp, dts, nus,
                                                 inls)
    got = jax.jit(lambda *a: substep_batch_pallas(*a, scene,
                                                  interpret=True))(
        u, v, p, pp, dts, nus, inls)
    names = ("u", "v", "p", "pp", "err")
    for name, r, g_ in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g_),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_substep_batch_warm_start_rounds():
    """Second substep (warm p'): the RUST warm start and the outer
    corrector rounds' per-scene early exit must agree with the
    per-element masked jnp path."""
    B = 3
    grid = Grid(nx=32, ny=16, lx=2.0, ly=1.0,
                obstacles=(Cylinder(0.5, 0.5, 0.2),))
    params = SimulationParams(dt=0.002, viscosity=1e-4)
    opts = solver_options_for(Semantics.RUST, early_exit=False)
    scene = make_scene(grid, params, opts)
    u, v, p, pp = _batched_inputs(scene, B, seed=1)
    nus = jnp.asarray([1e-5, 1e-4, 1e-3], jnp.float32)
    dts = jnp.full((B,), 0.002, jnp.float32)
    inls = jnp.full((B,), 1.0, jnp.float32)

    step = jax.vmap(partial(_substep_jnp, scene))
    kern = jax.jit(lambda *a: substep_batch_pallas(*a, scene,
                                                   interpret=True))
    r1 = step(u, v, p, pp, dts, nus, inls)
    g1 = kern(u, v, p, pp, dts, nus, inls)
    r2 = step(r1[0], r1[1], r1[2], r1[3], dts, nus, inls)
    g2 = kern(g1[0], g1[1], g1[2], g1[3], dts, nus, inls)
    for name, r, g_ in zip(("u", "v", "p", "pp", "err"), r2, g2):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g_),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_rounds_kernel_matches_jnp_path():
    """Single-scene in-VMEM solve+correct+rounds+BCs kernel
    (kernels.rounds_pallas) vs the jnp projection sequence, interpret
    mode, both semantics."""
    from cfd_demo_tpu.kernels.rounds_pallas import (
        rounds_pallas_ok, solve_correct_rounds_pallas)
    from cfd_demo_tpu.core.masks import masks_traced
    from cfd_demo_tpu.ops.bc import apply_bcs
    from cfd_demo_tpu.ops.corrector import correct
    from cfd_demo_tpu.ops.divergence import divergence_rhs
    from cfd_demo_tpu.solver.piso import _outer_rounds, _solve_pressure

    rng = np.random.default_rng(2)
    for semantics in (Semantics.RUST, Semantics.JS):
        grid = Grid(nx=40, ny=24, lx=3.0, ly=1.5,
                    obstacles=(Cylinder(0.9, 0.75, 0.3),))
        params = SimulationParams(dt=0.002, viscosity=1e-4)
        opts = solver_options_for(semantics)
        scene = make_scene(grid, params, opts)
        assert rounds_pallas_ok(grid)
        g = grid
        mk = lambda shp, s: jnp.asarray(
            s * rng.standard_normal(shp).astype(np.float32))
        us = mk((g.ny, g.nx + 1), 0.1)
        vs = mk((g.ny, g.nx), 0.1)
        p = mk((g.ny, g.nx), 0.05)
        pp0 = jnp.zeros((g.ny, g.nx), jnp.float32)
        rhs = mk((g.ny, g.nx), 1.0)
        dt_sub, inlet = 0.002, 1.0

        def ref_path():
            pp, err, _ = _solve_pressure(scene, pp0, rhs)
            u, v, p2 = correct(us, vs, p, pp, dt_sub, g.dx, g.dy)
            u, v, p2, pp, err = _outer_rounds(scene, u, v, p2, pp, err,
                                              dt_sub)
            _, _, mu, mv = masks_traced(g, opts.semantics, jnp.float32)
            u, v = apply_bcs(u, v, g, scene.params.inlet_profile, inlet,
                             mu, mv, scene.params.flow_case)
            return u, v, p2, pp, err

        ref = jax.jit(ref_path)()
        got = jax.jit(lambda: solve_correct_rounds_pallas(
            us, vs, p, pp0, rhs, dt_sub, inlet, scene,
            interpret=True))()
        for name, r, g_ in zip(("u", "v", "p", "pp", "err"), ref, got):
            np.testing.assert_allclose(np.asarray(r), np.asarray(g_),
                                       rtol=1e-4, atol=5e-5,
                                       err_msg=f"{semantics} {name}")


@pytest.mark.parametrize("semantics", [Semantics.RUST, Semantics.JS])
def test_substep_batch_sor_matches_vmapped_jnp(semantics):
    """Round 3 (VERDICT r2 item 8): the whole-scene kernel's in-kernel
    red/black SOR solver (make_sor_solve) vs the vmapped jnp substep
    with PressureSolver.SOR -- per-scene early exit, warm start (RUST)
    / zero init (JS), boundary-read folding."""
    B = 4
    grid = Grid(nx=40, ny=24, lx=3.0, ly=1.5,
                obstacles=(Cylinder(0.9, 0.75, 0.3),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver.SOR)
    # tol=0: deterministic fixed schedule. With a live tolerance a
    # +-1-ulp err difference at a tol-crossing iteration flips one
    # scene's trip count and the fields step apart by ~tol -- the same
    # envelope any two exact implementations may differ by; the loose
    # early-exit check below covers that regime.
    opts = solver_options_for(semantics, early_exit=False,
                              outer_corrector_rounds=0,
                              jacobi_tol=0.0, jacobi_iters=30)
    scene = make_scene(grid, params, opts)
    assert substep_batch_ok(grid)
    u, v, p, pp = _batched_inputs(scene, B, seed=2)
    nus = jnp.asarray(np.geomspace(1e-5, 1e-3, B), jnp.float32)
    dts = jnp.full((B,), 0.002, jnp.float32)
    inls = jnp.asarray(np.linspace(0.5, 1.5, B), jnp.float32)

    step = jax.vmap(partial(_substep_jnp, scene))
    kern = jax.jit(lambda *a: substep_batch_pallas(*a, scene,
                                                   interpret=True))
    r1 = step(u, v, p, pp, dts, nus, inls)
    g1 = kern(u, v, p, pp, dts, nus, inls)
    # second substep exercises the warm start through the kernel
    r2 = step(r1[0], r1[1], r1[2], r1[3], dts, nus, inls)
    g2 = kern(g1[0], g1[1], g1[2], g1[3], dts, nus, inls)
    # omega=1.7 over-relaxation amplifies the reciprocal-multiplier
    # ulps faster than the damped Jacobi (2e-5 there): 1e-4 bounds two
    # warm-started 30-iteration substeps
    for name, r, g_ in zip(("u", "v", "p", "pp", "err"), r2, g2):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g_),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_substep_batch_sor_early_exit_close():
    """Early-exit SOR through the kernel: per-scene trip counts may
    differ by one near the tolerance crossing (ulp-level err
    differences), so fields agree to ~tol, not ulps."""
    B = 3
    grid = Grid(nx=40, ny=24, lx=3.0, ly=1.5,
                obstacles=(Cylinder(0.9, 0.75, 0.3),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver.SOR)
    opts = solver_options_for(Semantics.RUST, early_exit=False,
                              outer_corrector_rounds=0)
    scene = make_scene(grid, params, opts)
    u, v, p, pp = _batched_inputs(scene, B, seed=3)
    nus = jnp.asarray([1e-5, 1e-4, 1e-3], jnp.float32)
    dts = jnp.full((B,), 0.002, jnp.float32)
    inls = jnp.full((B,), 1.0, jnp.float32)
    ref = jax.vmap(partial(_substep_jnp, scene))(u, v, p, pp, dts, nus,
                                                 inls)
    got = jax.jit(lambda *a: substep_batch_pallas(*a, scene,
                                                  interpret=True))(
        u, v, p, pp, dts, nus, inls)
    for name, r, g_ in zip(("u", "v", "p", "pp", "err"), ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g_),
                                   rtol=2e-3, atol=2e-3, err_msg=name)
