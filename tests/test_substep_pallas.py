"""Fused substep Pallas kernels vs the XLA ops (interpret mode on CPU).

kernels.substep_pallas shares the stencil expressions with the jnp path
through ops.stencil.StencilCtx, so agreement is expected to ~1 ulp
(bitwise when the compiler picks the same fma contractions; tolerances
absorb shape-dependent contraction differences).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfd_demo_tpu.core.config import (Cylinder, FlowCase, Grid, InletProfile,
                                      Semantics, VelocityScheme)
from cfd_demo_tpu.core.masks import masks_traced
from cfd_demo_tpu.kernels.substep_pallas import (correct_bc_pallas,
                                                 predict_div_pallas)
from cfd_demo_tpu.ops.bc import apply_bcs
from cfd_demo_tpu.ops.corrector import correct
from cfd_demo_tpu.ops.divergence import divergence_rhs
from cfd_demo_tpu.ops.predictor import predict

GRID = Grid(nx=96, ny=64, lx=3.0, ly=2.0, obstacles=(Cylinder(0.8, 1.0, 0.3),))
DT, NU, INLET = 0.003, 1e-4, 1.0


def fields(rng, grid):
    ny, nx = grid.ny, grid.nx
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape), jnp.float32)
    return mk((ny, nx + 1)), mk((ny, nx)), mk((ny, nx)), mk((ny, nx))


def assert_close(ref, got, scale_rtol=1e-6):
    ref = np.asarray(ref)
    got = np.asarray(got)
    atol = scale_rtol * max(1.0, float(np.max(np.abs(ref))))
    np.testing.assert_allclose(ref, got, rtol=0, atol=atol)


@pytest.mark.parametrize("semantics", [Semantics.RUST, Semantics.JS])
@pytest.mark.parametrize("scheme", [VelocityScheme.FIRST,
                                    VelocityScheme.SECOND,
                                    VelocityScheme.QUICK])
@pytest.mark.parametrize("block_rows", [16, 256])
def test_predict_div_matches_jnp(rng, semantics, scheme, block_rows):
    u, v, _, _ = fields(rng, GRID)
    nx, ny = GRID.nx, GRID.ny

    @jax.jit
    def ref(u, v):
        mu, mv, _, _ = masks_traced(GRID, semantics, jnp.float32)
        us, vs = predict(u, v, DT, NU, GRID.dx, GRID.dy, nx, ny, scheme,
                         semantics == Semantics.JS, mu, mv)
        return us, vs, divergence_rhs(us, vs, DT, GRID.dx, GRID.dy)

    r = ref(u, v)
    k = predict_div_pallas(u, v, DT, NU, GRID, scheme, semantics,
                           block_rows=block_rows, interpret=True)
    for a, b in zip(r, k):
        assert_close(a, b)


@pytest.mark.parametrize("semantics", [Semantics.RUST, Semantics.JS])
@pytest.mark.parametrize("flow_case,profile", [
    (FlowCase.CHANNEL, InletProfile.UNIFORM),
    (FlowCase.CHANNEL, InletProfile.PARABOLIC),
    (FlowCase.CAVITY, InletProfile.UNIFORM),
])
@pytest.mark.parametrize("block_rows", [16, 256])
def test_correct_bc_matches_jnp(rng, semantics, flow_case, profile,
                                block_rows):
    grid = (GRID if flow_case == FlowCase.CHANNEL
            else Grid(nx=96, ny=64, lx=1.0, ly=1.0))
    u, v, p, pp = fields(rng, grid)

    @jax.jit
    def ref(u, v, p, pp):
        _, _, mub, mvb = masks_traced(grid, semantics, jnp.float32)
        u2, v2, p2 = correct(u, v, p, pp, DT, grid.dx, grid.dy)
        u2, v2 = apply_bcs(u2, v2, grid, profile, INLET, mub, mvb, flow_case)
        res_u = jnp.max(jnp.abs(u2 - u))
        res_v = jnp.max(jnp.abs(v2 - v))
        max_vel = jnp.maximum(jnp.max(jnp.abs(u2)), jnp.max(jnp.abs(v2)))
        return u2, v2, p2, res_u, res_v, max_vel

    r = ref(u, v, p, pp)
    k = correct_bc_pallas(u, v, p, pp, u, v, DT, INLET, grid, profile,
                          flow_case, semantics, block_rows=block_rows,
                          interpret=True)
    for a, b in zip(r, k):
        assert_close(a, b)


def test_no_obstacles(rng):
    """Obstacle-free scenes skip the mask selects entirely."""
    grid = Grid(nx=96, ny=64, lx=1.0, ly=1.0)
    u, v, _, _ = fields(rng, grid)

    @jax.jit
    def ref(u, v):
        us, vs = predict(u, v, DT, NU, grid.dx, grid.dy, grid.nx, grid.ny,
                         VelocityScheme.FIRST, False, None, None)
        return us, vs, divergence_rhs(us, vs, DT, grid.dx, grid.dy)

    r = ref(u, v)
    k = predict_div_pallas(u, v, DT, NU, grid, VelocityScheme.FIRST,
                           Semantics.RUST, block_rows=16, interpret=True)
    for a, b in zip(r, k):
        assert_close(a, b)


def test_pad_io_false_path(rng):
    """The solver fast path: lane-aligned widths, u flowing padded."""
    grid = Grid(nx=128, ny=64, lx=3.0, ly=2.0,
                obstacles=(Cylinder(0.8, 1.0, 0.3),))
    ny, nx = grid.ny, grid.nx
    nxp = 256
    u, v, p, pp = fields(rng, grid)

    @jax.jit
    def ref(u, v, p, pp):
        mu, mv, mub, mvb = masks_traced(grid, Semantics.RUST, jnp.float32)
        us, vs = predict(u, v, DT, NU, grid.dx, grid.dy, nx, ny,
                         VelocityScheme.FIRST, False, mu, mv)
        rhs = divergence_rhs(us, vs, DT, grid.dx, grid.dy)
        u2, v2, p2 = correct(us, vs, p, pp, DT, grid.dx, grid.dy)
        u2, v2 = apply_bcs(u2, v2, grid, InletProfile.UNIFORM, INLET,
                           mub, mvb, FlowCase.CHANNEL)
        return us, vs, rhs, u2, v2, p2

    r = ref(u, v, p, pp)
    up = jnp.pad(u, ((0, 0), (0, nxp - (nx + 1))))
    usp, vs, rhs = predict_div_pallas(up, v, DT, NU, grid,
                                      VelocityScheme.FIRST, Semantics.RUST,
                                      block_rows=16, interpret=True,
                                      pad_io=False)
    assert usp.shape == (ny, nxp) and vs.shape == (ny, nx)
    assert_close(r[0], usp[:, :nx + 1])
    assert_close(r[1], vs)
    assert_close(r[2], rhs)
    u2, v2, p2, ru, rv, mvel = correct_bc_pallas(
        usp, vs, p, pp, up, v, DT, INLET, grid, InletProfile.UNIFORM,
        FlowCase.CHANNEL, Semantics.RUST, block_rows=16, interpret=True,
        pad_io=False)
    assert u2.shape == (ny, nx + 1)
    assert_close(r[3], u2)
    assert_close(r[4], v2)
    assert_close(r[5], p2)


@pytest.mark.parametrize("ny,nx", [(64, 100), (88, 96), (264, 120),
                                   (16, 384), (40, 33)])
def test_shape_sweep(rng, ny, nx):
    """Tiling edge cases: odd widths, non-power-of-2 heights (264 = 8*33
    forces a non-dyadic block size), minimal heights."""
    grid = Grid(nx=nx, ny=ny, lx=3.0, ly=2.0,
                obstacles=(Cylinder(1.0, 1.0, 0.4),))
    u, v, p, pp = fields(rng, grid)

    @jax.jit
    def ref(u, v, p, pp):
        mu, mv, mub, mvb = masks_traced(grid, Semantics.RUST, jnp.float32)
        us, vs = predict(u, v, DT, NU, grid.dx, grid.dy, nx, ny,
                         VelocityScheme.SECOND, False, mu, mv)
        rhs = divergence_rhs(us, vs, DT, grid.dx, grid.dy)
        u2, v2, p2 = correct(us, vs, p, pp, DT, grid.dx, grid.dy)
        u2, v2 = apply_bcs(u2, v2, grid, InletProfile.UNIFORM, INLET,
                           mub, mvb, FlowCase.CHANNEL)
        return us, vs, rhs, u2, v2, p2

    r = ref(u, v, p, pp)
    us, vs, rhs = predict_div_pallas(u, v, DT, NU, grid,
                                     VelocityScheme.SECOND, Semantics.RUST,
                                     block_rows=32, interpret=True)
    assert_close(r[0], us)
    assert_close(r[1], vs)
    assert_close(r[2], rhs)
    k = correct_bc_pallas(us, vs, p, pp, u, v, DT, INLET, grid,
                          InletProfile.UNIFORM, FlowCase.CHANNEL,
                          Semantics.RUST, block_rows=32, interpret=True)
    assert_close(r[3], k[0])
    assert_close(r[4], k[1])
    assert_close(r[5], k[2])


@pytest.mark.parametrize("nx,ny,block_rows", [
    (96, 64, 16),    # unaligned width, multi-window
    (96, 64, 256),   # unaligned, single block
    (128, 64, 16),   # lane-aligned width (the pad_io=False fast path)
    (100, 88, 24),   # odd width, non-dyadic rows
])
def test_correct_div_matches_jnp(rng, nx, ny, block_rows):
    """Fused corrector + next-round divergence (the per-outer-round
    launch, model.rs:696-724) vs the XLA correct + divergence_rhs."""
    from cfd_demo_tpu.kernels.substep_pallas import correct_div_pallas
    grid = Grid(nx=nx, ny=ny, lx=3.0, ly=2.0,
                obstacles=(Cylinder(0.8, 1.0, 0.3),))
    u, v, p, pp = fields(rng, grid)

    @jax.jit
    def ref(u, v, p, pp):
        u2, v2, p2 = correct(u, v, p, pp, DT, grid.dx, grid.dy)
        return u2, v2, p2, divergence_rhs(u2, v2, DT, grid.dx, grid.dy)

    r = ref(u, v, p, pp)
    aligned = nx % 128 == 0
    if aligned:
        nxp = -(-(nx + 1) // 128) * 128
        up = jnp.pad(u, ((0, 0), (0, nxp - (nx + 1))))
        k = correct_div_pallas(up, v, p, pp, DT, grid,
                               block_rows=block_rows, interpret=True,
                               pad_io=False)
        assert k[0].shape == (ny, nxp)
        k = (k[0][:, :nx + 1],) + k[1:]
    else:
        k = correct_div_pallas(u, v, p, pp, DT, grid,
                               block_rows=block_rows, interpret=True)
    for a, b in zip(r, k):
        assert_close(a, b)
