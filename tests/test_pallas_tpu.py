"""Pallas kernel vs jnp equivalence -- runs only on real TPU hardware.

The CI suite forces CPU (conftest), where the fused kernel has no
lowering; run explicitly on the chip with:

    CFD_TEST_PLATFORM=tpu python -m pytest tests/test_pallas_tpu.py -q

These also run implicitly through bench.py; this file makes the check a
one-command affair on device.
"""
import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires TPU hardware")


@pytest.mark.parametrize("shape,k", [((264, 800), 8), ((512, 512), 10),
                                     ((2048, 2048), 10),
                                     # >= 16384 lanes: no full-width row
                                     # block fits; the 1-D search falls
                                     # through to the 2-D column tiling.
                                     ((256, 16384), 10),
                                     # 4096 lanes route to 2-D tiles too
                                     # (the 1-D bs=128 window OOMs the
                                     # scoped-vmem limit at the deepest
                                     # nesting -- docs/PERF.md item 7b).
                                     ((4096, 4096), 10)])
def test_fused_matches_jnp(shape, k):
    import jax.numpy as jnp
    from jax import lax
    from cfd_demo_tpu.kernels.jacobi_pallas import jacobi_fused_k
    from cfd_demo_tpu.ops.poisson import jacobi

    from cfd_demo_tpu.ops.poisson import _apply_pprime_bcs
    ny, nx = shape
    dx = dy = 1.0 / nx
    rng = np.random.default_rng(0)
    # BC-consistent p' (the fused kernels fold the boundary reads).
    pp = _apply_pprime_bcs(
        jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref, err_ref, _ = jax.jit(
        lambda p, r: jacobi(p, r, dx, dy, 0.75, 0.0, k, early_exit=False)
    )(pp, rhs)
    # In-scan: the production compile context (docs/PERF.md).
    got = jax.jit(lambda p, r: lax.scan(
        lambda c, _: (jacobi_fused_k(c, r, dx, dy, 0.75, k)[0], None),
        p, None, length=2)[0])(pp, rhs)
    ref2 = jax.jit(lambda p, r: lax.scan(
        lambda c, _: (jacobi(c, r, dx, dy, 0.75, 0.0, k,
                             early_exit=False)[0], None),
        p, None, length=2)[0])(pp, rhs)
    np.testing.assert_allclose(np.asarray(ref2), np.asarray(got),
                               rtol=0, atol=1e-6)


def test_remainder_launch_iteration_count():
    """iters % k != 0 must run exactly `iters` iterations."""
    import jax.numpy as jnp
    from cfd_demo_tpu.kernels.jacobi_pallas import jacobi_pallas
    from cfd_demo_tpu.ops.poisson import jacobi

    from cfd_demo_tpu.ops.poisson import _apply_pprime_bcs
    ny = nx = 512
    dx = dy = 1.0 / nx
    rng = np.random.default_rng(1)
    pp = _apply_pprime_bcs(
        jnp.asarray(rng.standard_normal((ny, nx)) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    iters = 23  # 2 full k=10 launches + remainder 3
    ref, err_ref, n_ref = jax.jit(
        lambda p, r: jacobi(p, r, dx, dy, 0.75, 0.0, iters,
                            early_exit=False))(pp, rhs)
    got, err_got, n_got = jax.jit(
        lambda p, r: jacobi_pallas(p, r, dx, dy, 0.75, 0.0, iters, k=10,
                                   early_exit=False))(pp, rhs)
    assert int(n_got) == iters == int(n_ref)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-6)
    assert np.isclose(float(err_ref), float(err_got), rtol=1e-4)


def test_fused_substep_step_matches_jnp():
    """Full PISO steps with the fused predictor/corrector Pallas passes
    (kernels.substep_pallas) vs the XLA path, on the real chip."""
    import numpy as np
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              solver_options_for)

    grid = Grid(nx=512, ny=512, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4)
    states = {}
    for impl in ("jnp", "pallas"):
        opts = solver_options_for(
            Semantics.RUST, ramp_up_steps=10, jacobi_tol=0.0,
            jacobi_iters=50, outer_corrector_rounds=0, early_exit=False,
            pressure_impl="jnp", substep_impl=impl)
        scene = cfd.make_scene(grid, params, opts)
        run = cfd.make_run(scene, 5, donate=False)
        state, _ = run(scene.init_state())
        float(state.res_u)
        states[impl] = state
    a, b = states["jnp"], states["pallas"]
    for f in ("u", "v", "p"):
        ref = np.asarray(getattr(a, f))
        got = np.asarray(getattr(b, f))
        np.testing.assert_allclose(ref, got, rtol=0, atol=1e-5)
    for f in ("res_u", "res_v", "res_p", "dt"):
        assert np.isclose(float(getattr(a, f)), float(getattr(b, f)),
                          rtol=1e-4, atol=1e-7), f


@pytest.mark.parametrize("solver", ["sor", "multigrid"])
def test_alt_solver_pallas_step_matches_jnp(solver):
    """Full PISO steps with the SOR / multigrid Pallas accelerations
    vs the pure-XLA implementations, on the real chip."""
    import numpy as np
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, PressureSolver, Semantics,
                              SimulationParams, solver_options_for)

    grid = Grid(nx=2048, ny=2048, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver(solver))
    states = {}
    for impl in ("jnp", "pallas"):
        opts = solver_options_for(
            Semantics.RUST, ramp_up_steps=10, jacobi_tol=0.0,
            jacobi_iters=20, outer_corrector_rounds=0, early_exit=False,
            pressure_impl=impl, substep_impl="jnp")
        scene = cfd.make_scene(grid, params, opts)
        run = cfd.make_run(scene, 3, donate=False)
        state, _ = run(scene.init_state())
        float(state.res_u)
        states[impl] = state
    a, b = states["jnp"], states["pallas"]
    # Multigrid accumulates fma-contraction differences over 3 V-cycles
    # x 10 levels x 3 steps (~1e-6 relative); SOR stays tighter.
    atol = 1e-4 if solver == "multigrid" else 1e-5
    for f in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=0, atol=atol, err_msg=f)
    assert np.isclose(float(a.res_p), float(b.res_p), rtol=1e-3, atol=1e-7)


def test_mg_production_pallas_step_matches_jnp():
    """Full PISO steps with the MG_PRODUCTION projection running as the
    interleaved BC-aware V-cycle kernels vs the pure-XLA path, on the
    real chip (docs/SPEC.md item 12).

    MG_PRODUCTION's exit is ADAPTIVE (V-cycles until the calibrated
    residual bound) -- FMA-contraction differences between the kernel
    and XLA paths can legitimately shift a knife-edge cycle count, so
    unlike the fixed-schedule parity solvers the assertion here is the
    solver's *contract*: both paths bound the far-field post-correction
    divergence by projection_div_tol, and the fields agree to the
    ~1e-3 an extra/fewer cycle can move them (single-cycle equivalence
    is pinned exactly in tests/test_mg_pallas.py). 200 steps: through
    the impulsive ramp transient the mgp_max_cycles cap legitimately
    binds before the tolerance (the exit bound is a settled-state
    property), so the bound is asserted at step 200, where the A/B
    measured 8.5e-5 -- two decades of margin -- and the two paths'
    adaptive dt agreed to 9e-10."""
    import numpy as np
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, PressureSolver, Semantics,
                              SimulationParams, solver_options_for)
    from cfd_demo_tpu.ops.divergence import divergence

    grid = Grid(nx=2048, ny=2048, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver.MG_PRODUCTION)
    yy, xx = np.meshgrid((np.arange(2048) + 0.5) * grid.dy,
                         (np.arange(2048) + 0.5) * grid.dx, indexing="ij")
    far = np.hypot(xx - 7.5, yy - 15.0) > 0.75 + 3 * grid.dx
    far[:2] = far[-2:] = False
    far[:, :2] = far[:, -2:] = False
    states = {}
    for impl in ("jnp", "pallas"):
        opts = solver_options_for(
            Semantics.RUST, ramp_up_steps=10,
            outer_corrector_rounds=0, pressure_impl=impl,
            # pin the LEGACY whole-cycle kernels (the aligned default
            # never routes to them; its fine-level smoother kernel is
            # pinned by the fused-Jacobi tests)
            mgp_scheme="legacy",
            substep_impl="jnp")
        scene = cfd.make_scene(grid, params, opts)
        run = cfd.make_run(scene, 200, donate=False)
        state, _ = run(scene.init_state())
        float(state.res_u)
        states[impl] = state
        dv = np.asarray(divergence(np.asarray(state.u),
                                   np.asarray(state.v),
                                   grid.dx, grid.dy))
        assert np.abs(dv[far]).max() <= scene.opts.projection_div_tol, impl
    a, b = states["jnp"], states["pallas"]
    for f in ("u", "v"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=0, atol=1e-2, err_msg=f)
    # p is the reference's growing accumulator (O(1e4) by step 200 in
    # this mode); knife-edge cycle flips drift it relatively, so the
    # bound is relative (measured 2.5e-4 max).
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                               rtol=2e-3, atol=1e-2, err_msg="p")


def test_fused_smooth_res_matches_xla_hw():
    """jacobi_fused_k_res on hardware: the aligned-MGP smooth+residual
    launch vs the XLA pair at 2048^2 (residual tolerance follows the
    f32 floor formula -- the evaluation cancels O(denom |p|)
    intermediates)."""
    import jax.numpy as jnp
    from cfd_demo_tpu.kernels.jacobi_pallas import jacobi_fused_k_res
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs,
                                          _mg_residual, _mgp_smooth)
    ny = nx = 2048
    dx = dy = 1.0 / nx
    rng = np.random.default_rng(12)
    pp = _apply_pprime_bcs(
        jnp.asarray(0.1 * rng.standard_normal((ny, nx)), jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    p_ref = jax.jit(lambda p, r: _mgp_smooth(p, r, dx, dy, 0.75, 3,
                                             _apply_pprime_bcs))(pp, rhs)
    r_ref = _mg_residual(p_ref, rhs, dx, dy)
    p_got, r_got, mr = jax.jit(
        lambda p, r: jacobi_fused_k_res(p, r, dx, dy, 0.75, 3))(pp, rhs)
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_got),
                               rtol=0, atol=1e-6)
    tol = 30 * np.finfo(np.float32).eps * (
        4.0 / dx / dx * float(jnp.max(jnp.abs(p_ref)))
        + float(jnp.max(jnp.abs(rhs))))
    np.testing.assert_allclose(np.asarray(r_ref), np.asarray(r_got),
                               rtol=0, atol=tol)
    assert np.isclose(float(mr), float(jnp.max(jnp.abs(r_ref))),
                      rtol=1e-3, atol=tol)
    p2, r2, mr2 = jax.jit(
        lambda p, r: jacobi_fused_k_res(p, r, dx, dy, 0.75, 3,
                                        emit_res=False))(pp, rhs)
    assert r2 is None
    np.testing.assert_array_equal(np.asarray(p_got), np.asarray(p2))
    assert float(mr2) == float(mr)


def test_fused_substep_js_mode_matches_jnp():
    """JS semantics through the fused kernels: fixed 3 substeps under
    the dynamic fori_loop, extrapolated initial guess, JS face-position
    obstacle masks, QUICK scheme."""
    import numpy as np
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              VelocityScheme, solver_options_for)

    grid = Grid(nx=2048, ny=1024, lx=30.0, ly=15.0,
                obstacles=(Cylinder(7.5, 7.5, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              velocity_scheme=VelocityScheme.QUICK)
    states = {}
    for impl in ("jnp", "pallas"):
        opts = solver_options_for(
            Semantics.JS, ramp_up_steps=10, jacobi_tol=0.0,
            jacobi_iters=20, early_exit=False, substeps_init=3,
            substeps_max=3, substeps_adaptive=False, extrapolate=True,
            pressure_impl="jnp", substep_impl=impl)
        scene = cfd.make_scene(grid, params, opts)
        run = cfd.make_run(scene, 4, donate=False)
        state, _ = run(scene.init_state())
        float(state.res_u)
        states[impl] = state
    a, b = states["jnp"], states["pallas"]
    for f in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=0, atol=1e-5, err_msg=f)
    for f in ("res_u", "res_v", "res_p", "dt"):
        assert np.isclose(float(getattr(a, f)), float(getattr(b, f)),
                          rtol=1e-4, atol=1e-7), f


def test_config_matrix_auto_vs_jnp():
    """Hardware consistency sweep: semantics x scheme x solver x flow
    case through the auto (Pallas) vs jnp implementations."""
    import numpy as np
    import jax.numpy as jnp
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Box, Cylinder, FlowCase, Grid, InletProfile,
                              PressureSolver, Semantics, SimulationParams,
                              VelocityScheme, solver_options_for)

    configs = [
        dict(sem=Semantics.RUST, scheme="second", solver="jacobi",
             fc=FlowCase.CHANNEL, prof=InletProfile.PARABOLIC),
        dict(sem=Semantics.JS, scheme="quick", solver="jacobi",
             fc=FlowCase.CHANNEL, prof=InletProfile.UNIFORM),
        dict(sem=Semantics.RUST, scheme="first", solver="sor",
             fc=FlowCase.CAVITY, prof=InletProfile.UNIFORM),
        dict(sem=Semantics.JS, scheme="second", solver="multigrid",
             fc=FlowCase.CAVITY, prof=InletProfile.UNIFORM),
    ]
    for cfg in configs:
        if cfg["fc"] == FlowCase.CAVITY:
            grid = Grid(nx=2048, ny=2048, lx=1.0, ly=1.0)
        else:
            grid = Grid(nx=2048, ny=1024, lx=30.0, ly=15.0,
                        obstacles=(Cylinder(7.5, 7.5, 0.75),
                                   Box(15.0, 5.0, 0.5, 0.5)))
        params = SimulationParams(
            dt=0.001, viscosity=1e-4,
            velocity_scheme=VelocityScheme(cfg["scheme"]),
            pressure_solver=PressureSolver(cfg["solver"]),
            inlet_profile=cfg["prof"], flow_case=cfg["fc"])
        states = {}
        for impl in ("jnp", "auto"):
            opts = solver_options_for(
                cfg["sem"], ramp_up_steps=5, jacobi_tol=0.0,
                jacobi_iters=20, outer_corrector_rounds=0,
                early_exit=False, substeps_init=1, substeps_max=1,
                substeps_adaptive=False,
                extrapolate=(cfg["sem"] == Semantics.JS),
                pressure_impl=impl, substep_impl=impl)
            scene = cfd.make_scene(grid, params, opts)
            st, _ = cfd.make_run(scene, 3, donate=False)(scene.init_state())
            float(st.res_u)
            states[impl] = st
        a, b = states["jnp"], states["auto"]
        for f in ("u", "v", "p"):
            err = float(jnp.max(jnp.abs(getattr(a, f) - getattr(b, f))))
            assert err < 1e-4, (cfg, f, err)


def test_vmap_ensemble_kernel_matches_jnp():
    """Vmapped ensemble steps through the whole-scene-in-VMEM substep
    kernel (kernels.ensemble_pallas) vs the forced-XLA batch path, and
    vs an unbatched per-element run, on the real chip."""
    import dataclasses
    from functools import partial
    import numpy as np
    import jax
    import jax.numpy as jnp
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              solver_options_for)
    from cfd_demo_tpu.solver.piso import step_fn

    grid = Grid(nx=64, ny=32, lx=4.0, ly=2.0,
                obstacles=(Cylinder(1.0, 1.0, 0.3),))
    params = SimulationParams(dt=0.002, viscosity=1e-4)
    B = 8
    nus = np.geomspace(1e-5, 1e-3, B).astype(np.float32)
    states = {}
    for impl in ("jnp", "auto"):
        opts = solver_options_for(Semantics.RUST, ramp_up_steps=5,
                                  early_exit=False, pressure_impl=impl,
                                  substep_impl=impl)
        scene = cfd.make_scene(grid, params, opts)
        base = scene.init_state()
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), base)
        batched = dataclasses.replace(batched, nu=jnp.asarray(nus))
        step = jax.jit(jax.vmap(partial(step_fn, scene)))
        for _ in range(3):
            batched, _ = step(batched)
        float(batched.res_u[0])
        states[impl] = batched
    a, b = states["jnp"], states["auto"]
    for f in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=1e-5, atol=1e-5, err_msg=f)
    np.testing.assert_allclose(np.asarray(a.res_p), np.asarray(b.res_p),
                               rtol=1e-3, atol=1e-7)

    # element k == unbatched run with nu_k (per-element-exact semantics)
    opts = solver_options_for(Semantics.RUST, ramp_up_steps=5,
                              early_exit=False)
    params_k = dataclasses.replace(params, viscosity=float(nus[3]))
    scene_k = cfd.make_scene(grid, params_k, opts)
    sk = scene_k.init_state()
    step_k = cfd.make_step(scene_k, donate=False)
    for _ in range(3):
        sk, _ = step_k(sk)
    np.testing.assert_allclose(np.asarray(b.u[3]), np.asarray(sk.u),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nx,ny", [(2048, 1024),   # lane-aligned fast path
                                   (1400, 1536)])  # pad_io round trip
def test_fused_outer_rounds_matches_jnp(nx, ny):
    """Reference-mode outer corrector rounds (model.rs:696-724) through
    the fused corrector+divergence round kernel vs the XLA round loop.
    tol=0 everywhere pins both paths to the same fixed schedule, so the
    comparison is exact up to fp contraction noise."""
    import jax.numpy as jnp
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              solver_options_for)

    grid = Grid(nx=nx, ny=ny, lx=30.0, ly=15.0,
                obstacles=(Cylinder(7.5, 7.5, 0.75),))
    params = SimulationParams(dt=0.001, viscosity=1e-4)
    states = {}
    for impl in ("jnp", "auto"):
        opts = solver_options_for(
            Semantics.RUST, ramp_up_steps=5, jacobi_tol=0.0,
            jacobi_iters=10, outer_corrector_rounds=3,
            outer_corrector_tol=0.0, early_exit=True,
            pressure_impl=impl, substep_impl=impl,
            rounds_impl="pallas" if impl == "auto" else "jnp")
        scene = cfd.make_scene(grid, params, opts)
        st, _ = cfd.make_run(scene, 3, donate=False)(scene.init_state())
        float(st.res_u)
        states[impl] = st
    a, b = states["jnp"], states["auto"]
    for f in ("u", "v", "p"):
        err = float(jnp.max(jnp.abs(getattr(a, f) - getattr(b, f))))
        assert err < 1e-4, (nx, ny, f, err)


def test_mg_kernels_2d_tiling_on_hardware():
    """Interleaved multigrid kernels through the 2-D column tiles at an
    8192-lane level on the real chip, vs the XLA ops on compact arrays
    (no full-width 1-D restrict/prolong tiling exists at this width --
    unlocking it is the point of the 2-D path); plus the composed
    BC-aware MGP V-cycle vs the XLA kit at the same width."""
    import jax.numpy as jnp
    from cfd_demo_tpu.core.config import Semantics, solver_options_for
    from cfd_demo_tpu.kernels.mg_pallas import (
        _compact, _interleave, _round_up, _vcycle_mgp_int,
        mg_prolong_add_int, mg_residual_restrict_int, mg_smooth_int,
        mgp_smooth_int)
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs, _mg_prolong,
                                          _mg_residual, _mg_restrict,
                                          _mg_smooth, _mgp_smooth,
                                          _mgp_vcycle)

    rng = np.random.default_rng(11)
    ncy, ncx, s = 256, 8000, 1
    nxp = _round_up(ncx, 128)
    dx = dy = 1.0
    p_c = jnp.asarray(rng.standard_normal((ncy, ncx)), jnp.float32)
    r_c = jnp.asarray(rng.standard_normal((ncy, ncx)), jnp.float32)
    p_i = _interleave(p_c, s, nxp)
    r_i = _interleave(r_c, s, nxp)

    sm = jax.jit(lambda: mg_smooth_int(p_i, r_i, dx, dy, s, ncx, 5,
                                       tiling="2d"))()
    ref = _mg_smooth(p_c, r_c, dx, dy, 5)
    np.testing.assert_allclose(
        np.asarray(_compact(sm, s, ncx, ncy)), np.asarray(ref),
        rtol=0, atol=1e-5)

    smp = jax.jit(lambda: mgp_smooth_int(p_i, r_i, dx, dy, s, ncx, 4,
                                         0.75, False, tiling="2d"))()
    refp = _mgp_smooth(_apply_pprime_bcs(p_c), r_c, dx, dy, 0.75, 4,
                       _apply_pprime_bcs)
    np.testing.assert_allclose(
        np.asarray(_compact(smp, s, ncx, ncy)), np.asarray(refp),
        rtol=0, atol=1e-5)

    rr = jax.jit(lambda: mg_residual_restrict_int(p_i, r_i, dx, dy, s,
                                                  ncx, tiling="2d"))()
    ref_r = _mg_restrict(_mg_residual(p_c, r_c, dx, dy),
                         (ncx + 1) // 2, (ncy + 1) // 2)
    np.testing.assert_allclose(
        np.asarray(_compact(rr, 2 * s, (ncx + 1) // 2, (ncy + 1) // 2)),
        np.asarray(ref_r), rtol=1e-5, atol=1e-5)

    e_c = jnp.asarray(
        rng.standard_normal(((ncy + 1) // 2, (ncx + 1) // 2)),
        jnp.float32)
    e_i = _interleave(e_c, 2 * s, nxp)
    pa = jax.jit(lambda: mg_prolong_add_int(e_i, p_i, s, ncx,
                                            tiling="2d"))()
    ref_p = p_c + _mg_prolong(e_c, ncx, ncy)
    np.testing.assert_allclose(
        np.asarray(_compact(pa, s, ncx, ncy)), np.asarray(ref_p),
        rtol=0, atol=1e-5)

    # Composed BC-aware V-cycle (auto tiling: 2-D at this width) vs XLA.
    ny, nx = ncy, ncx
    dxf, dyf = 1.0 / nx, 1.0 / ny
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    pp0 = _apply_pprime_bcs(jnp.asarray(
        0.1 * rng.standard_normal((ny, nx)), jnp.float32))
    opts = solver_options_for(Semantics.RUST)
    ref = np.asarray(jax.jit(
        lambda: _mgp_vcycle(pp0, rhs, dxf, dyf, opts,
                            _apply_pprime_bcs))())
    pad = ((0, 0), (0, nxp - nx))
    got = np.asarray(jax.jit(
        lambda: _vcycle_mgp_int(jnp.pad(pp0, pad), jnp.pad(rhs, pad),
                                dxf, dyf, 1, nx, ny, opts,
                                _apply_pprime_bcs, False,
                                False))())[:, :nx]
    np.testing.assert_allclose(ref, got, rtol=0, atol=2e-5)


def test_sor_2d_tiling_on_hardware():
    """Fused red/black SOR through the 2-D column tiles at an
    8192-lane width on the real chip, vs the jnp sweeps (no full-width
    1-D row block fits VMEM at this width -- previously the auto path
    fell back to XLA here)."""
    import jax.numpy as jnp
    from cfd_demo_tpu.kernels.sor_pallas import _tiles, sor_fused_k
    from cfd_demo_tpu.ops.poisson import _apply_pprime_bcs, sor

    ny, nx = 256, 8192
    k = 12
    # the 2-D resolution still exists (forced below); the AUTO route
    # now prefers the round-3 large-window 1-D blocks at this width
    assert _tiles(ny, nx, k, 256)[0] == "2d"
    dx, dy = 1.0 / nx, 1.0 / ny
    rng = np.random.default_rng(12)
    pp = _apply_pprime_bcs(jnp.asarray(
        0.1 * rng.standard_normal((ny, nx)), jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    ref, err_ref, _ = jax.jit(
        lambda p, r: sor(p, r, dx, dy, 1.7, 0.0, k,
                         early_exit=False))(pp, rhs)
    for tiling in ("2d", "auto"):  # auto = large-window 1-D (round 3)
        got, err = jax.jit(
            lambda p, r: sor_fused_k(p, r, dx, dy, 1.7, k,
                                     tiling=tiling))(pp, rhs)
        atol = 4e-6 * max(1.0, float(jnp.max(jnp.abs(ref))))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=0, atol=atol, err_msg=tiling)
        assert np.isclose(float(err_ref), float(err), rtol=1e-4,
                          atol=1e-7), tiling


def test_vmap_non_jacobi_routes_around_ensemble_kernel():
    """Regression: the whole-scene ensemble kernel solves pressure with
    its in-kernel Jacobi only; a vmapped SOR scene must take the
    vmapped-jnp path (not silently solve with Jacobi). Pin by equality
    of the auto route against the forced-jnp batch path."""
    import dataclasses
    from functools import partial
    import jax
    import jax.numpy as jnp
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, PressureSolver, Semantics,
                              SimulationParams, solver_options_for)
    from cfd_demo_tpu.solver.piso import step_fn

    grid = Grid(nx=64, ny=32, lx=4.0, ly=2.0,
                obstacles=(Cylinder(1.0, 1.0, 0.3),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver.SOR)
    B = 4
    nus = np.geomspace(1e-5, 1e-3, B).astype(np.float32)
    states = {}
    for impl in ("jnp", "auto"):
        opts = solver_options_for(Semantics.JS, ramp_up_steps=5,
                                  early_exit=False,
                                  substeps_adaptive=False,
                                  substeps_init=1,
                                  pressure_impl=impl, substep_impl=impl)
        scene = cfd.make_scene(grid, params, opts)
        base = scene.init_state()
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), base)
        batched = dataclasses.replace(batched, nu=jnp.asarray(nus))
        step = jax.jit(jax.vmap(partial(step_fn, scene)))
        for _ in range(3):
            batched, _ = step(batched)
        float(batched.res_u[0])
        states[impl] = batched
    a, b = states["jnp"], states["auto"]
    for f in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=1e-5, atol=1e-5, err_msg=f)


def test_vmap_ensemble_sor_kernel_matches_jnp_hw():
    """Round 3 (VERDICT r2 item 8): the whole-scene kernel's in-kernel
    red/black SOR solver on the real chip -- vmapped SOR ensemble via
    the kernel vs the forced-XLA batch path, fixed schedule."""
    import dataclasses
    from functools import partial
    import numpy as np
    import jax
    import jax.numpy as jnp
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, PressureSolver, Semantics,
                              SimulationParams, solver_options_for)
    from cfd_demo_tpu.solver.piso import step_fn

    grid = Grid(nx=64, ny=32, lx=4.0, ly=2.0,
                obstacles=(Cylinder(1.0, 1.0, 0.3),))
    params = SimulationParams(dt=0.002, viscosity=1e-4,
                              pressure_solver=PressureSolver.SOR)
    B = 8
    nus = np.geomspace(1e-5, 1e-3, B).astype(np.float32)
    states = {}
    for impl in ("jnp", "auto"):
        opts = solver_options_for(Semantics.RUST, ramp_up_steps=5,
                                  early_exit=False, jacobi_tol=0.0,
                                  jacobi_iters=30, pressure_impl=impl,
                                  substep_impl=impl)
        scene = cfd.make_scene(grid, params, opts)
        base = scene.init_state()
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), base)
        batched = dataclasses.replace(batched, nu=jnp.asarray(nus))
        step = jax.jit(jax.vmap(partial(step_fn, scene)))
        for _ in range(3):
            batched, _ = step(batched)
        float(batched.res_u[0])
        states[impl] = batched
    a, b = states["jnp"], states["auto"]
    for f in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=1e-4, atol=1e-4, err_msg=f)


def test_cc_sweeps_kernel_matches_xla_hw():
    """Round 3: the cell-centered coarse-level sweep kernel
    (kernels.jacobi_pallas.cc_sweeps_pallas -- the aligned MGP cycle's
    coarse smoothing) on the real chip, against the XLA folded
    operator, incl. the distance-aware outlet fold and an odd size."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cfd_demo_tpu.kernels.jacobi_pallas import cc_sweeps_pallas
    from cfd_demo_tpu.ops.poisson import _cc_residual, _cc_sweeps

    for (ny, nx), ed, dwm in (((2048, 2048), True, 1.5),
                              ((2047, 2047), True, 1.0),
                              ((1024, 2048), False, 1.0)):
        dx, dy = 1.0 / nx, 1.0 / ny
        d_wall = dwm * dx
        rng = np.random.default_rng(13)
        p0 = jnp.asarray(rng.standard_normal((ny, nx)) * 0.1, jnp.float32)
        rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
        k = 3
        ref = jax.jit(lambda a, b: _cc_sweeps(a, b, dx, dy, 0.75, k,
                                              ed, d_wall))(p0, rhs)
        got, r_got = jax.jit(lambda a, b: cc_sweeps_pallas(
            a, b, dx, dy, 0.75, k, ed, d_wall, emit_res=True))(p0, rhs)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"{ny}x{nx}")
        r_ref = jax.jit(lambda a, b: _cc_residual(ref, b, dx, dy, ed,
                                                  d_wall))(p0, rhs)
        # the residual evaluation cancels O(denom |p|) intermediates,
        # so its tolerance is the f32 floor formula (docs/PERF.md
        # item 14), not a fixed atol -- at 2047^2 the floor is ~0.5
        denom = 2 / (dx * dx) + 2 / (dy * dy)
        floor = 4 * np.float32(1.2e-7) * (
            denom * float(jnp.max(jnp.abs(ref)))
            + float(jnp.max(jnp.abs(rhs))))
        np.testing.assert_allclose(np.asarray(r_ref), np.asarray(r_got),
                                   rtol=0, atol=max(floor, 1e-3),
                                   err_msg=f"res {ny}x{nx}")


def test_fused_restrict_and_corr_match_xla_hw():
    """Round-4 transfer-fusion kernels on hardware at 2048^2:
    jacobi_fused_k_restrict (smooth + cell-centered-restricted
    residual) vs _mgp_smooth + _cc_restrict, and jacobi_fused_k_corr
    (y-prolong + add + post-smooth + exit metric + max|p|) vs the XLA
    prolong/add/bc/smooth chain."""
    import jax.numpy as jnp
    from cfd_demo_tpu.kernels.jacobi_pallas import (jacobi_fused_k_corr,
                                                    jacobi_fused_k_restrict)
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs, _cc_prolong,
                                          _cc_prolong_x, _cc_restrict,
                                          _mg_residual, _mgp_smooth)
    ny = nx = 2048
    dx = dy = 1.0 / nx
    rng = np.random.default_rng(29)
    pp = _apply_pprime_bcs(
        jnp.asarray(0.1 * rng.standard_normal((ny, nx)), jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    p_ref = jax.jit(lambda p, r: _mgp_smooth(p, r, dx, dy, 0.75, 3,
                                             _apply_pprime_bcs))(pp, rhs)
    r_ref = _mg_residual(p_ref, rhs, dx, dy)
    rc_ref = _cc_restrict(r_ref[1:ny - 1, 1:nx - 1])
    p_got, m, mr = jax.jit(
        lambda p, r: jacobi_fused_k_restrict(p, r, dx, dy, 0.75, 3))(
        pp, rhs)
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_got),
                               rtol=0, atol=1e-6)
    ncy, ncx = (ny - 2) // 2, (nx - 2) // 2
    rc_got = np.asarray(m)[:ncy, 1::2][:, :ncx]
    tol = 30 * np.finfo(np.float32).eps * (
        4.0 / dx / dx * float(jnp.max(jnp.abs(p_ref)))
        + float(jnp.max(jnp.abs(rhs))))
    np.testing.assert_allclose(np.asarray(rc_ref), rc_got, rtol=0,
                               atol=tol)
    assert np.isclose(float(mr), float(jnp.max(jnp.abs(r_ref))),
                      rtol=1e-3, atol=tol)
    # corr kernel: prolonged correction + post-smooth
    e_c = jnp.asarray(0.05 * rng.standard_normal((ncy, ncx)), jnp.float32)
    e_int = _cc_prolong(e_c, ny - 2, nx - 2, True)
    q_ref = _apply_pprime_bcs(pp + jnp.pad(e_int, 1))
    q_ref = jax.jit(lambda p, r: _mgp_smooth(p, r, dx, dy, 0.75, 3,
                                             _apply_pprime_bcs))(q_ref, rhs)
    qr_ref = _mg_residual(q_ref, rhs, dx, dy)
    row = _cc_prolong_x(e_c, nx - 2, True)
    rowp = jnp.pad(row, ((0, ny // 2 - ncy), (1, 0)))
    q_got, qerr, qpmax = jax.jit(
        lambda p, r, w: jacobi_fused_k_corr(p, r, w, dx, dy, 0.75, 3))(
        pp, rhs, rowp)
    np.testing.assert_allclose(np.asarray(q_ref), np.asarray(q_got),
                               rtol=0, atol=1e-6)
    assert np.isclose(float(qerr), float(jnp.max(jnp.abs(qr_ref))),
                      rtol=1e-3, atol=tol)
    assert float(qpmax) == float(jnp.max(jnp.abs(q_got)))


def test_mgp_exact_while_matches_masked_hw():
    """The round-4 exact do-while exit (ops.poisson._exact_while) must
    reproduce the masked-loop solve on hardware: same fields, residual
    and cycle count at a production-shaped 2048^2 MGP solve."""
    import dataclasses
    import jax.numpy as jnp
    from cfd_demo_tpu import Semantics, solver_options_for
    from cfd_demo_tpu.ops.poisson import multigrid_production
    ny = nx = 2048
    dx = dy = 1.0 / nx
    rng = np.random.default_rng(31)
    pp = jnp.asarray(0.1 * rng.standard_normal((ny, nx)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    o_exact = solver_options_for(Semantics.RUST, early_exit=True,
                                 outer_corrector_rounds=0)
    o_masked = dataclasses.replace(o_exact, early_exit=False)
    pa, ea, na = jax.jit(lambda p, r: multigrid_production(
        p, r, dx, dy, o_exact, 10.0))(pp, rhs)
    pb, eb, nb = jax.jit(lambda p, r: multigrid_production(
        p, r, dx, dy, o_masked, 10.0))(pp, rhs)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    assert float(ea) == float(eb)
    assert int(na) == int(nb)


def test_sor_rb2_matches_uncompressed_hw():
    """Round-4 color-compressed SOR chain on hardware at 2048^2: same
    fields as the uncompressed fused kernel (identical multiplier
    arithmetic per cell, ~1 ulp reassociation envelope) and the same
    launch-granularity error metric."""
    import jax.numpy as jnp
    from cfd_demo_tpu.kernels.sor_pallas import sor_pallas, sor_pallas_rb2
    from cfd_demo_tpu.ops.poisson import _apply_pprime_bcs
    ny = nx = 2048
    dx = dy = 1.0 / nx
    rng = np.random.default_rng(37)
    pp = _apply_pprime_bcs(
        jnp.asarray(0.1 * rng.standard_normal((ny, nx)), jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    ref, err_ref, n_ref = jax.jit(
        lambda p, r: sor_pallas(p, r, dx, dy, 1.5, 0.0, 10, k=5,
                                early_exit=False))(pp, rhs)
    got, err, n_got = jax.jit(
        lambda p, r: sor_pallas_rb2(p, r, dx, dy, 1.5, 0.0, 10, k=5,
                                    early_exit=False))(pp, rhs)
    assert int(n_got) == int(n_ref) == 10
    atol = 1e-6 * max(1.0, float(jnp.max(jnp.abs(ref))))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=atol)
    assert np.isclose(float(err_ref), float(err), rtol=1e-3, atol=1e-7)


def test_step_shmap_2d_default_rust_production_size_hw():
    """Round 5 (VERDICT r4 item 6): the explicit 2-D rows x cols tier
    at a PRODUCTION size on the real chip. The CPU-mesh equality tests
    pin the collective pattern at 32-64-row toys; this runs the
    default-Rust-options step (the config the tier now builds for:
    warm-started Jacobi + the model.rs:696-724 outer corrector loop)
    through make_step_shmap_2d on a 1x1 device mesh at 2048^2 with the
    REAL Pallas kernels inside the shard bodies, and asserts the fields
    match the plain single-device step -- proving the tier composes
    correctly at real size, not just at test shapes.

    pallas_fuse_k is pinned to 10 (a divisor of the default 50
    jacobi_iters): the plain path's auto k=16 and the tier's
    divisibility-constrained k=10 would otherwise check the DEFAULT
    adaptive tolerance exit at different launch granularities --
    different legitimate iteration counts, not a composition bug
    (the same pinning the CPU-mesh reference-mode test uses)."""
    import cfd_demo_tpu as cfd
    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              solver_options_for)
    from cfd_demo_tpu.shard.mesh import join_u, shard_state_2d
    from cfd_demo_tpu.shard.step_shmap2d import (ROW_AXIS, COL_AXIS,
                                                 make_run_shmap_2d)
    from jax.sharding import Mesh

    n = 2048
    grid = Grid(nx=n, ny=n, lx=30.0, ly=30.0,
                obstacles=(Cylinder(7.5, 15.0, 0.75),))
    params = SimulationParams(dt=0.002, viscosity=1e-4)
    opts = solver_options_for(Semantics.RUST, pallas_fuse_k=10)
    scene = cfd.make_scene(grid, params, opts)

    ref_state, _ = cfd.make_run(scene, 3, donate=False)(scene.init_state())
    float(ref_state.res_u)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                (ROW_AXIS, COL_AXIS))
    s = shard_state_2d(scene.init_state(), mesh)
    s, _ = make_run_shmap_2d(scene, mesh, 3)(s)
    got_state = join_u(s)

    for f in ("u", "v", "p", "p_prime"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref_state, f)),
            np.asarray(getattr(got_state, f)), rtol=0, atol=5e-6,
            err_msg=f)
    for f in ("res_u", "res_v", "res_p", "dt", "t"):
        assert np.isclose(float(getattr(ref_state, f)),
                          float(getattr(got_state, f)),
                          rtol=1e-3, atol=1e-7), f
