"""Force diagnostics (ops/forces.py): drag/lift on obstacles."""
import numpy as np

import jax
import jax.numpy as jnp

import cfd_demo_tpu as cfd
from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                          solver_options_for)
from cfd_demo_tpu.ops.forces import (ControlVolume, control_volume_force,
                                     default_control_volume,
                                     drag_lift_coefficients,
                                     physical_pressure, pressure_force)


def _grid():
    return Grid(nx=96, ny=48, lx=12.0, ly=6.0,
                obstacles=(Cylinder(3.0, 3.0, 0.6),))


def test_zero_flow_zero_force():
    g = _grid()
    u = jnp.zeros((g.ny, g.nx + 1))
    v = jnp.zeros((g.ny, g.nx))
    p = jnp.zeros((g.ny, g.nx))
    fx, fy = control_volume_force(u, v, p, 1e-3, g)
    assert float(fx) == 0.0 and float(fy) == 0.0
    fx, fy = pressure_force(p, g)
    assert float(fx) == 0.0 and float(fy) == 0.0


def test_uniform_pressure_no_net_force():
    """A closed surface in a constant-pressure field feels zero net
    force -- both estimators must respect that identically."""
    g = _grid()
    u = jnp.zeros((g.ny, g.nx + 1))
    v = jnp.zeros((g.ny, g.nx))
    p = jnp.full((g.ny, g.nx), 3.7, jnp.float32)
    fx, fy = control_volume_force(u, v, p, 1e-3, g)
    np.testing.assert_allclose(float(fx), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(fy), 0.0, atol=1e-4)
    fx, fy = pressure_force(p, g)
    np.testing.assert_allclose(float(fx), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(fy), 0.0, atol=1e-4)


def test_cylinder_drag_cv_invariance():
    """Steady low-Re cylinder wake: drag is positive, lift is small,
    and the momentum balance gives (approximately) the same force for
    two different control volumes enclosing the body -- the defining
    property of a conservative force estimate. The staircase pressure
    integral agrees to leading order (it misses skin friction)."""
    g = _grid()
    # Re = U D / nu = 1 * 1.2 / 0.05 = 24: steady attached wake.
    scene = cfd.make_scene(
        g, SimulationParams(dt=0.004, viscosity=0.05),
        solver_options_for(Semantics.RUST, ramp_up_steps=20))
    state, _ = cfd.make_run(scene, 399, donate=False)(scene.init_state())
    p_prev, u_prev, v_prev = state.p, state.u, state.v
    state, d = cfd.make_step(scene, donate=False)(state)
    # The stored p is the reference's linear-in-time accumulator; the
    # per-step increment is the physical pressure (ops.forces docs).
    u, v, p = state.u, state.v, physical_pressure(p_prev, state.p)
    nu = float(state.nu)

    cv_small = default_control_volume(g, margin=0.8)
    cv_big = default_control_volume(g, margin=2.0)
    unsteady = dict(u_prev=u_prev, v_prev=v_prev, dt=d.dt)
    fx_s, fy_s = control_volume_force(u, v, p, nu, g, cv_small, **unsteady)
    fx_b, fy_b = control_volume_force(u, v, p, nu, g, cv_big, **unsteady)
    assert float(fx_s) > 0.0 and float(fx_b) > 0.0
    # CV-size invariance: WITH the unsteady term the balance closes to
    # a few percent (without it, the settling flow's changing momentum
    # reads as a CV-size-dependent force).
    np.testing.assert_allclose(float(fx_b), float(fx_s), rtol=0.10)
    # Lift ~ 0 in the steady symmetric wake.
    assert abs(float(fy_s)) < 0.3 * float(fx_s)
    # Form drag is the dominant share and the right order.
    fpx, _ = pressure_force(p, g)
    assert 0.3 * float(fx_s) < float(fpx) < 1.5 * float(fx_s)
    # Coefficients normalize sanely: C_d order 1-3 at Re ~ 24.
    cd, cl = drag_lift_coefficients(fx_s, fy_s, 1.0, 1.2)
    assert 0.5 < float(cd) < 6.0, float(cd)


def test_forces_jit_and_vmap():
    g = _grid()
    cv = default_control_volume(g)
    B = 3
    u = jnp.ones((B, g.ny, g.nx + 1))
    v = jnp.zeros((B, g.ny, g.nx))
    p = jnp.zeros((B, g.ny, g.nx))
    f = jax.jit(jax.vmap(
        lambda u_, v_, p_: control_volume_force(u_, v_, p_, 1e-3, g, cv)))
    fx, fy = f(u, v, p)
    assert fx.shape == (B,) and np.isfinite(np.asarray(fx)).all()
    # Uniform u: fluxes cancel on opposite faces.
    np.testing.assert_allclose(np.asarray(fx), 0.0, atol=1e-5)


def test_forces_on_sharded_state():
    """Force integrals work unchanged on a GSPMD row-sharded state
    (slices/reductions partition; no resharding needed)."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from cfd_demo_tpu.shard.mesh import make_mesh, make_sharded_step, shard_state

    mesh = make_mesh()
    g = Grid(nx=64, ny=128, lx=4.0, ly=8.0,
             obstacles=(Cylinder(1.0, 4.0, 0.4),))
    scene = cfd.make_scene(
        g, SimulationParams(dt=0.002, viscosity=1e-3),
        solver_options_for(Semantics.RUST, ramp_up_steps=5,
                           jacobi_iters=20, outer_corrector_rounds=2))
    state = shard_state(scene.init_state(), mesh)
    step = make_sharded_step(scene, mesh)
    ref = scene.init_state()
    ref_step = cfd.make_step(scene, donate=False)
    for _ in range(5):
        p_prev, rp_prev = state.p, ref.p
        state, _ = step(state)
        ref, _ = ref_step(ref)
    cv = default_control_volume(g)
    fx, _ = control_volume_force(state.u, state.v,
                                 physical_pressure(p_prev, state.p),
                                 1e-3, g, cv)
    fx2, _ = control_volume_force(ref.u, ref.v,
                                  physical_pressure(rp_prev, ref.p),
                                  1e-3, g, cv)
    assert np.isclose(float(fx), float(fx2), rtol=1e-4)


def test_physical_pressure_substep_invariance():
    """Regression: with S substeps each substep adds a fresh ~P to the
    stored accumulator, so the per-step increment is ~S x P.
    physical_pressure must divide the executed count back out: the
    same JS scene run with 1 and with 4 static substeps (same dt)
    must report approximately the SAME physical pressure scale and
    drag near steady state -- not a 4x-inflated one."""
    g = _grid()
    results = {}
    for subs in (1, 4):
        scene = cfd.make_scene(
            g, SimulationParams(dt=0.004, viscosity=0.05),
            solver_options_for(Semantics.JS, ramp_up_steps=20,
                               substeps_adaptive=False,
                               substeps_init=subs,
                               # stabilize the comparison: the JS
                               # defaults (cfl 0.5, extrapolation)
                               # blow this scene up either way; the
                               # test is about P scaling, not JS dt
                               # control
                               cfl=0.2, extrapolate=False))
        state, _ = cfd.make_run(scene, 399, donate=False)(
            scene.init_state())
        p_prev, u_prev, v_prev = state.p, state.u, state.v
        state, d = cfd.make_step(scene, donate=False)(state)
        P = physical_pressure(p_prev, state.p, d.substeps)
        fx, _ = control_volume_force(
            state.u, state.v, P, float(state.nu), g,
            default_control_volume(g), u_prev=u_prev, v_prev=v_prev,
            dt=d.dt)
        results[subs] = (float(jnp.max(jnp.abs(P))), float(fx))
    p1, f1 = results[1]
    p4, f4 = results[4]
    # Measured post-fix: ratios 1.26-1.32 (the two substep schedules
    # integrate slightly different trajectories); pre-fix the ratio is
    # the substep count itself (~4x), far outside this bound.
    assert np.isclose(p1, p4, rtol=0.5), results
    assert np.isclose(f1, f4, rtol=0.5), results
    assert f1 > 0 and f4 > 0, results


def test_diag_reports_executed_substep_count():
    """A state resumed from a JS adaptive run (substeps=8) stepped
    under a static scene executes substeps_init substeps; the
    diagnostics must report the EXECUTED count (physical_pressure
    divides forces by it), and the carried counter is re-normalized."""
    import dataclasses
    import jax.numpy as jnp

    g = _grid()
    scene = cfd.make_scene(
        g, SimulationParams(dt=0.004, viscosity=0.05),
        solver_options_for(Semantics.RUST, ramp_up_steps=20))
    st = scene.init_state()
    st = dataclasses.replace(st, substeps=jnp.asarray(8, jnp.int32))
    st2, d = cfd.make_step(scene, donate=False)(st)
    assert int(d.substeps) == 1
    assert int(st2.substeps) == 1
    assert np.isclose(float(st2.t) - float(st.t), float(st.dt))
