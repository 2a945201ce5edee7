"""Reverse-mode differentiability (SolverOptions.differentiable).

Capability beyond the reference (no autodiff exists in the Rust/JS
twins): every convergence loop runs as a fixed-trip masked lax.scan,
so jax.grad flows through whole rollouts. These tests pin

1. forward parity: the fixed-trip scan produces bit-identical fields
   to the masked while_loop it replaces,
2. gradient correctness vs central finite differences for the
   physical controls (viscosity, target inlet velocity),
3. gradient flow through the SOR and MG_PRODUCTION projections,
4. the make_scene validation of incompatible options.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cfd_demo_tpu as cfd
from cfd_demo_tpu import (Cylinder, Grid, PressureSolver, Semantics,
                          SimulationParams, solver_options_for)


def _scene(differentiable=True, solver="jacobi", **over):
    grid = Grid(nx=64, ny=32, lx=8.0, ly=4.0,
                obstacles=(Cylinder(2.0, 2.0, 0.5),))
    params = SimulationParams(dt=0.01, viscosity=0.01,
                              pressure_solver=PressureSolver(solver))
    # 12 iterations keep compile time CI-friendly; AD correctness is
    # independent of how converged the solve is.
    base = dict(ramp_up_steps=5, jacobi_tol=1e-4, jacobi_iters=12,
                outer_corrector_rounds=0, early_exit=False,
                differentiable=differentiable)
    base.update(over)
    opts = solver_options_for(Semantics.RUST, **base)
    return cfd.make_scene(grid, params, opts)


def test_fixed_trip_forward_matches_masked_while():
    """The fixed-trip scan is the SAME masked body as the while_loop;
    a converging tolerance exercises the done-freeze, and the fields
    must agree bitwise."""
    sa = _scene(differentiable=False)
    sb = _scene(differentiable=True)
    runa = cfd.make_run(sa, 8, donate=False)
    runb = cfd.make_run(sb, 8, donate=False)
    a, _ = runa(sa.init_state())
    b, _ = runb(sb.init_state())
    for f in ("u", "v", "p", "p_prime", "res_p", "dt"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)


def _loss_fn(scene, n_steps):
    run = cfd.make_run(scene, n_steps, donate=False)
    s0 = scene.init_state()

    def loss(nu, inlet):
        s = dataclasses.replace(s0, nu=nu, target_inlet=inlet)
        s, _ = run(s)
        return jnp.sum(s.u * s.u)

    return loss


def test_grad_matches_finite_differences():
    loss = _loss_fn(_scene(), 5)
    nu0 = jnp.asarray(0.01, jnp.float32)
    i0 = jnp.asarray(1.0, jnp.float32)
    gnu, gin = jax.grad(loss, argnums=(0, 1))(nu0, i0)
    eps = 1e-3  # f32 central FD: O(eps^2) truncation vs ~1e-7/eps noise
    fd_nu = (loss(nu0 + eps, i0) - loss(nu0 - eps, i0)) / (2 * eps)
    fd_in = (loss(nu0, i0 + eps) - loss(nu0, i0 - eps)) / (2 * eps)
    assert np.isclose(float(gnu), float(fd_nu), rtol=5e-3), \
        (float(gnu), float(fd_nu))
    assert np.isclose(float(gin), float(fd_in), rtol=5e-3), \
        (float(gin), float(fd_in))


@pytest.mark.parametrize("solver", ["sor", "mg-production"])
def test_grad_flows_through_alt_projections(solver):
    over = {"mgp_max_cycles": 4} if solver == "mg-production" else {}
    loss = _loss_fn(_scene(solver=solver, **over), 3)
    nu0 = jnp.asarray(0.01, jnp.float32)
    i0 = jnp.asarray(1.0, jnp.float32)
    gnu, gin = jax.grad(loss, argnums=(0, 1))(nu0, i0)
    assert np.isfinite(float(gnu)) and np.isfinite(float(gin))
    assert float(gin) != 0.0
    eps = 1e-3
    fd_in = (loss(nu0, i0 + eps) - loss(nu0, i0 - eps)) / (2 * eps)
    assert np.isclose(float(gin), float(fd_in), rtol=2e-2), \
        (float(gin), float(fd_in))


def test_fast_adjoint_equals_unrolled_gradient():
    """The tol == 0 fixed-schedule solve takes the fast-adjoint path
    (ops.poisson.jacobi_fixed_adjoint: custom VJP = the exact linear
    transpose of the solve map, O(1) activation memory, Pallas-eligible
    forward). Its end-to-end gradient must equal the unrolled-AD
    gradient BITWISE on the same forward (the unrolled path is forced
    via residual_dt_scaling, which gates the fast path but does not
    touch RUST-semantics dynamics)."""
    common = dict(ramp_up_steps=5, jacobi_tol=0.0, jacobi_iters=15,
                  outer_corrector_rounds=0, early_exit=False,
                  differentiable=True)
    grads = {}
    for name, extra in (("fast", {}),
                        ("unroll", {"residual_dt_scaling": True})):
        scene = _scene(**common, **extra)
        loss = _loss_fn(scene, 4)
        nu0 = jnp.asarray(0.01, jnp.float32)
        i0 = jnp.asarray(1.0, jnp.float32)
        grads[name] = jax.grad(loss, argnums=(0, 1))(nu0, i0)
    assert float(grads["fast"][0]) == float(grads["unroll"][0])
    assert float(grads["fast"][1]) == float(grads["unroll"][1])
    assert float(grads["fast"][0]) != 0.0


def test_fast_adjoint_solve_transpose_is_exact():
    """ops.poisson.jacobi_fixed_adjoint vs unrolled AD at the solve
    level: d/d(pp0) bitwise, d/d(rhs) to accumulation-order noise."""
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs, jacobi,
                                          jacobi_fixed_adjoint)
    rng = np.random.default_rng(3)
    pp0 = _apply_pprime_bcs(jnp.asarray(
        rng.standard_normal((32, 48)) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    dx, dy, om, it = 1 / 48, 1 / 32, 0.75, 12

    def loss_unroll(p0, r):
        pp, _, _ = jacobi(p0, r, dx, dy, om, 0.0, it,
                          early_exit=False, fixed_trip=True)
        return jnp.sum(pp ** 2)

    def loss_fast(p0, r):
        def forward(a, b):
            pp, err, _ = jacobi(a, b, dx, dy, om, 0.0, it,
                                early_exit=False, fixed_trip=True)
            return pp, err

        pp, _ = jacobi_fixed_adjoint(p0, r, dx, dy, om, it,
                                     _apply_pprime_bcs, forward)
        return jnp.sum(pp ** 2)

    ga = jax.jit(jax.grad(loss_unroll, argnums=(0, 1)))(pp0, rhs)
    gb = jax.jit(jax.grad(loss_fast, argnums=(0, 1)))(pp0, rhs)
    np.testing.assert_array_equal(np.asarray(ga[0]), np.asarray(gb[0]))
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               rtol=1e-5, atol=1e-9)


def test_drag_gradient_matches_finite_differences():
    """Gradient of the control-volume drag force (ops/forces.py) wrt
    viscosity, through a rollout -- the quantity an aerodynamic
    optimization would descend. FD-validated."""
    from cfd_demo_tpu.ops.forces import control_volume_force
    scene = _scene()
    run = cfd.make_run(scene, 6, donate=False)
    s0 = scene.init_state()

    def drag(nu):
        s = dataclasses.replace(s0, nu=nu)
        s, _ = run(s)
        fx, _ = control_volume_force(s.u, s.v, s.p, nu, scene.grid)
        return fx

    nu0 = jnp.asarray(0.01, jnp.float32)
    g = jax.grad(drag)(nu0)
    eps = 1e-3
    fd = (drag(nu0 + eps) - drag(nu0 - eps)) / (2 * eps)
    assert np.isfinite(float(g)) and float(g) != 0.0
    assert np.isclose(float(g), float(fd), rtol=1e-2), \
        (float(g), float(fd))


def test_distributed_adjoint_matches_single_device():
    """Gradients compose with GSPMD row sharding: jax.grad of a
    rollout loss on the 8-device mesh equals the single-device
    gradient (the sharded step reuses the same jnp path, whose loops
    are fixed-trip scans in differentiable mode -- the backward pass
    shards like the forward)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cfd_demo_tpu.shard.mesh import make_mesh, shard_state
    scene = _scene()
    s0 = scene.init_state()

    def loss(nu, st):
        st = dataclasses.replace(st, nu=nu)

        def body(s, _):
            from cfd_demo_tpu.solver.piso import step_fn
            s, _ = step_fn(scene, s)
            return s, None

        st, _ = jax.lax.scan(body, st, None, length=3)
        return jnp.sum(st.u * st.u) + jnp.sum(st.v * st.v)

    nu0 = jnp.asarray(0.01, jnp.float32)
    g1 = jax.jit(jax.grad(loss))(nu0, s0)

    mesh = make_mesh()
    assert mesh.size == 8
    sharded = shard_state(s0, mesh)
    scalar = NamedSharding(mesh, P())
    g8 = jax.jit(jax.grad(loss),
                 out_shardings=scalar)(nu0, sharded)
    np.testing.assert_allclose(float(g8), float(g1), rtol=1e-5)


def test_js_semantics_static_substeps_grad():
    """JS semantics with a static multi-substep count: the unrolled
    substep loop differentiates, and the gradient matches FD."""
    grid = Grid(nx=64, ny=32, lx=8.0, ly=4.0,
                obstacles=(Cylinder(2.0, 2.0, 0.5),))
    opts = solver_options_for(
        Semantics.JS, ramp_up_steps=5, jacobi_tol=1e-6, jacobi_iters=12,
        early_exit=False, substeps_adaptive=False, substeps_init=2,
        substeps_max=2, differentiable=True)
    scene = cfd.make_scene(
        grid, SimulationParams(dt=0.01, viscosity=0.01), opts)
    loss = _loss_fn(scene, 3)
    nu0 = jnp.asarray(0.01, jnp.float32)
    i0 = jnp.asarray(1.0, jnp.float32)
    gin = jax.grad(loss, argnums=1)(nu0, i0)
    eps = 1e-3
    fd_in = (loss(nu0, i0 + eps) - loss(nu0, i0 - eps)) / (2 * eps)
    assert np.isclose(float(gin), float(fd_in), rtol=1e-2), \
        (float(gin), float(fd_in))


def test_make_scene_rejects_incompatible_options():
    with pytest.raises(ValueError, match="early_exit"):
        _scene(early_exit=True)
    with pytest.raises(ValueError, match="outer_corrector_rounds"):
        _scene(outer_corrector_rounds=20)
    with pytest.raises(ValueError, match="substep"):
        grid = Grid(nx=64, ny=32, lx=8.0, ly=4.0, obstacles=())
        opts = solver_options_for(Semantics.JS, early_exit=False,
                                  differentiable=True)  # JS default is
        cfd.make_scene(grid, SimulationParams(), opts)   # adaptive


def test_sor_fast_adjoint_transpose_is_exact():
    """Round 3 (VERDICT r2 item 7): the fixed-schedule red/black SOR
    solve through ops.poisson.fixed_linear_adjoint vs unrolled AD at
    the solve level -- d/d(pp0) bitwise, d/d(rhs) to accumulation-order
    noise. The sweep composition (red half, black half reading updated
    reds, BCs) is linear in (p'0, rhs) exactly like the Jacobi
    schedule."""
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs, _iota_masks,
                                          _sor_sweep, fixed_linear_adjoint,
                                          sor)
    rng = np.random.default_rng(5)
    pp0 = _apply_pprime_bcs(jnp.asarray(
        rng.standard_normal((32, 48)) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    dx, dy, om, it = 1 / 48, 1 / 32, 1.7, 9
    _, r_, c_ = _iota_masks((32, 48))
    red, black = (r_ + c_) % 2 == 0, (r_ + c_) % 2 == 1

    def loss_unroll(p0, r):
        pp, _, _ = sor(p0, r, dx, dy, om, 0.0, it,
                       early_exit=False, fixed_trip=True)
        return jnp.sum(pp ** 2)

    def loss_fast(p0, r):
        def forward(a, b):
            pp, err, _ = sor(a, b, dx, dy, om, 0.0, it,
                             early_exit=False, fixed_trip=True)
            return pp, err

        def one(p, rr):
            return _sor_sweep(p, rr, dx, dy, om, red, black,
                              _apply_pprime_bcs)[0]

        pp, _ = fixed_linear_adjoint(one, it, forward, p0, r)
        return jnp.sum(pp ** 2)

    ga = jax.jit(jax.grad(loss_unroll, argnums=(0, 1)))(pp0, rhs)
    gb = jax.jit(jax.grad(loss_fast, argnums=(0, 1)))(pp0, rhs)
    np.testing.assert_array_equal(np.asarray(ga[0]), np.asarray(gb[0]))
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               rtol=1e-5, atol=1e-9)


def test_mgp_fixed_cycles_fast_adjoint():
    """mgp_fixed_cycles > 0 + differentiable: the fixed-cycle aligned
    V-cycle solve takes the fast-adjoint path. Solve-level check vs
    unrolled AD through the same XLA cycles: d/d(pp0) bitwise,
    d/d(rhs) to accumulation-order noise."""
    import dataclasses as dc

    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs,
                                          multigrid_production)
    rng = np.random.default_rng(7)
    pp0 = _apply_pprime_bcs(jnp.asarray(
        rng.standard_normal((32, 48)) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    dx, dy = 1 / 48, 1 / 32
    base = solver_options_for(Semantics.RUST, mgp_fixed_cycles=3,
                              early_exit=False,
                              outer_corrector_rounds=0)
    o_fast = dc.replace(base, differentiable=True)
    o_unroll = dc.replace(base, differentiable=False)

    def loss_fast(p0, r):
        pp, _, _ = multigrid_production(p0, r, dx, dy, o_fast, 0.0)
        return jnp.sum(pp ** 2)

    def loss_unroll(p0, r):
        # same fixed-cycle forward, plain AD through the XLA cycles
        pp, _, _ = multigrid_production(p0, r, dx, dy, o_unroll, 0.0)
        return jnp.sum(pp ** 2)

    # forward parity first: identical fields either way
    pa, _, na = multigrid_production(pp0, rhs, dx, dy, o_fast, 0.0)
    pb, _, nb = multigrid_production(pp0, rhs, dx, dy, o_unroll, 0.0)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    assert int(na) == int(nb) == 3

    ga = jax.jit(jax.grad(loss_unroll, argnums=(0, 1)))(pp0, rhs)
    gb = jax.jit(jax.grad(loss_fast, argnums=(0, 1)))(pp0, rhs)
    # the transposed recursion reassociates the multi-level cycle's
    # float ops vs unrolled AD of the same map: equal to ~1 ulp
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]),
                               rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               rtol=1e-5, atol=1e-9)


def test_mgp_implicit_adjoint_solve_level():
    """Round 4 (VERDICT r3 item 7): the ADAPTIVE MG_PRODUCTION solve
    through ops.poisson.mgp_implicit_adjoint. The implicit VJP
    (rbar = one transposed MGP solve of the slaving-transposed
    cotangent) must match the directional finite difference of the
    converged solve itself, and d/d(pp0) must be exactly zero (the
    converged solution forgets its warm start)."""
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs,
                                          mgp_implicit_adjoint)
    rng = np.random.default_rng(11)
    pp0 = _apply_pprime_bcs(jnp.asarray(
        rng.standard_normal((32, 48)) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    dx, dy = 1 / 48, 1 / 32
    opts = solver_options_for(Semantics.RUST, differentiable=True,
                              early_exit=False,
                              outer_corrector_rounds=0)

    def loss(p0, r):
        pp, _, _ = mgp_implicit_adjoint(p0, r, dx, dy, opts, 0.0)
        return jnp.sum(pp ** 2)

    g0, gr = jax.jit(jax.grad(loss, argnums=(0, 1)))(pp0, rhs)
    assert float(jnp.max(jnp.abs(g0))) == 0.0
    # directional FD in a random rhs direction (2 extra solves)
    d = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    eps = 1e-3
    fd = float((loss(pp0, rhs + eps * d) - loss(pp0, rhs - eps * d))
               / (2 * eps))
    got = float(jnp.sum(gr * d))
    assert np.isclose(got, fd, rtol=2e-3), (got, fd)


def test_mgp_adaptive_grad_end_to_end_with_early_exit():
    """differentiable=True now composes with the production adaptive
    projection INCLUDING early_exit=True (make_scene's rejection list
    shrank: the MGP forward's while_loops hide behind the implicit
    VJP). End-to-end rollout gradient is FD-consistent."""
    loss = _loss_fn(_scene(solver="mg-production", early_exit=True), 3)
    nu0 = jnp.asarray(0.01, jnp.float32)
    i0 = jnp.asarray(1.0, jnp.float32)
    gnu, gin = jax.grad(loss, argnums=(0, 1))(nu0, i0)
    assert np.isfinite(float(gnu)) and np.isfinite(float(gin))
    assert float(gin) != 0.0
    eps = 1e-3
    fd_in = (loss(nu0, i0 + eps) - loss(nu0, i0 - eps)) / (2 * eps)
    assert np.isclose(float(gin), float(fd_in), rtol=2e-2), \
        (float(gin), float(fd_in))


def test_mgp_implicit_adjoint_cavity_grad_finite():
    """Cavity (all-Neumann, gauge-pinned) through the implicit path:
    the pseudo-inverse backward solve stays finite and nonzero."""
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs_cavity,
                                          mgp_implicit_adjoint)
    rng = np.random.default_rng(13)
    rhs = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    rhs = rhs - jnp.mean(rhs)  # compatible rhs (as div(u*) is)
    dx, dy = 1 / 48, 1 / 32
    opts = solver_options_for(Semantics.RUST, differentiable=True,
                              early_exit=False,
                              outer_corrector_rounds=0)

    def loss(r):
        pp, _, _ = mgp_implicit_adjoint(
            jnp.zeros_like(r), r, dx, dy, opts,
            0.0, bc=_apply_pprime_bcs_cavity)
        return jnp.sum(pp ** 2)

    g = jax.jit(jax.grad(loss))(rhs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0
    # FD-consistency (ADVICE r4): with the backward cotangent projected
    # onto range(A), the gradient must match a directional FD, not just
    # be finite. Mean-free direction keeps the perturbed rhs compatible.
    d = jnp.asarray(rng.standard_normal(rhs.shape), jnp.float32)
    d = d - jnp.mean(d)
    eps = 1e-3
    loss_j = jax.jit(loss)
    fd = (float(loss_j(rhs + eps * d)) - float(loss_j(rhs - eps * d))) / (2 * eps)
    got = float(jnp.vdot(g, d))
    assert np.isclose(got, fd, rtol=5e-3, atol=1e-6), (got, fd)


@pytest.mark.parametrize("solver,over", [
    ("sor", {"jacobi_tol": 0.0}),
    ("mg-production", {"mgp_fixed_cycles": 3}),
])
def test_fast_adjoint_end_to_end_alt_solvers(solver, over):
    """End-to-end rollout gradients through the SOR / fixed-cycle MGP
    fast-adjoint paths: finite, nonzero, FD-consistent."""
    loss = _loss_fn(_scene(solver=solver, **over), 3)
    nu0 = jnp.asarray(0.01, jnp.float32)
    i0 = jnp.asarray(1.0, jnp.float32)
    gnu, gin = jax.grad(loss, argnums=(0, 1))(nu0, i0)
    assert np.isfinite(float(gnu)) and np.isfinite(float(gin))
    assert float(gin) != 0.0
    eps = 1e-3
    fd_in = (loss(nu0, i0 + eps) - loss(nu0, i0 - eps)) / (2 * eps)
    assert np.isclose(float(gin), float(fd_in), rtol=2e-2), \
        (float(gin), float(fd_in))
