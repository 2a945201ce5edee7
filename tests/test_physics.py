"""Physics sanity checks (SURVEY.md section 4c).

The reference validates the solver only visually through the GUI; these
tests assert the physical invariants the projection method must
satisfy: divergence reduction, inflow development, no-slip walls, and
obstacle blocking.
"""
import numpy as np

from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                          make_run, make_scene, solver_options_for)
from cfd_demo_tpu.ops.divergence import divergence


def channel_scene(obstacle=True, **opt_overrides):
    obstacles = (Cylinder(center_x=1.5, center_y=0.75, radius=0.25),) if obstacle else ()
    grid = Grid(nx=48, ny=24, lx=6.0, ly=1.5, obstacles=obstacles)
    params = SimulationParams(dt=0.002, viscosity=1e-4)
    opts = solver_options_for(Semantics.RUST, ramp_up_steps=10,
                              **opt_overrides)
    return make_scene(grid, params, opts)


def test_divergence_after_projection():
    scene = channel_scene()
    run = make_run(scene, 30, donate=False)
    state, diags = run(scene.init_state())
    div = np.asarray(divergence(state.u, state.v, scene.grid.dx,
                                scene.grid.dy))
    # Interior cells away from the obstacle should be nearly
    # divergence-free after the corrector rounds.
    assert np.abs(div[1:-1, 1:-1]).max() < 0.5
    assert np.sqrt(np.mean(div[1:-1, 1:-1] ** 2)) < 0.05


def test_channel_flow_develops():
    scene = channel_scene(obstacle=False)
    run = make_run(scene, 60, donate=False)
    state, _ = run(scene.init_state())
    u = np.asarray(state.u)
    assert np.all(np.isfinite(u))
    # Mid-channel u should be positive and of order the inlet velocity.
    mid = u[scene.grid.ny // 2, scene.grid.nx // 2]
    assert 0.1 < mid < 3.0
    # No-slip rows are exactly zero.
    assert np.abs(u[0, :]).max() == 0.0
    assert np.abs(u[-1, :]).max() == 0.0
    # v bottom face row is zero; the top face row (j=ny) is implicit
    # zero by layout (Grid.shape_v).
    v = np.asarray(state.v)
    assert np.abs(v[0, :]).max() == 0.0


def test_obstacle_blocks_flow():
    scene = channel_scene(obstacle=True)
    run = make_run(scene, 60, donate=False)
    state, _ = run(scene.init_state())
    u = np.asarray(state.u)
    g = scene.grid
    ci = int(1.5 / g.dx)
    cj = int(0.75 / g.dy)
    # u at the obstacle center face must be zero (mask + BCs).
    assert abs(u[cj, ci]) < 1e-6
    # Flow accelerates around the obstacle: above-gap speed exceeds inlet.
    gap = u[cj + int(0.3 / g.dy) + 1:, ci].max()
    assert np.isfinite(gap)


def test_long_rollout_stable():
    scene = channel_scene()
    run = make_run(scene, 200, donate=False)
    state, diags = run(scene.init_state())
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert np.all(np.isfinite(np.asarray(state.p)))
    assert float(state.dt) > 0


def test_float64_pipeline():
    """State dtype is a parameter; the whole step runs in f64 too."""
    import jax
    import jax.numpy as jnp
    from cfd_demo_tpu import (Cylinder, Grid, SimulationParams, Semantics,
                              make_scene, make_step, solver_options_for)
    jax.config.update("jax_enable_x64", True)
    try:
        scene = make_scene(
            Grid(nx=32, ny=16, lx=2, ly=1,
                 obstacles=(Cylinder(0.5, 0.5, 0.2),)),
            SimulationParams(dt=0.002, viscosity=1e-4),
            solver_options_for(Semantics.RUST, ramp_up_steps=4))
        st = scene.init_state(dtype=jnp.float64)
        step = make_step(scene, donate=False)
        for _ in range(3):
            st, _ = step(st)
        u = np.asarray(st.u)
        assert u.dtype == np.float64 and np.isfinite(u).all()
    finally:
        jax.config.update("jax_enable_x64", False)


def test_multiple_obstacles():
    from cfd_demo_tpu import (Box, Cylinder, Grid, SimulationParams,
                              Semantics, make_scene, make_step,
                              solver_options_for)
    scene = make_scene(
        Grid(nx=64, ny=32, lx=4, ly=2,
             obstacles=(Cylinder(1.0, 1.0, 0.3), Box(2.5, 1.0, 0.2, 0.3))),
        SimulationParams(dt=0.002, viscosity=1e-4),
        solver_options_for(Semantics.RUST, ramp_up_steps=4))
    st = scene.init_state()
    step = make_step(scene, donate=False)
    for _ in range(5):
        st, _ = step(st)
    u = np.asarray(st.u)
    assert np.isfinite(u).all()
    assert u[16, 16] == 0.0  # cylinder center face
    assert u[16, 40] == 0.0  # box center face
