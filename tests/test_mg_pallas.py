"""Interleaved-level Pallas multigrid (kernels.mg_pallas) vs the XLA
V-cycle kit (ops.poisson._mg_*), interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfd_demo_tpu.core.config import Semantics, solver_options_for
from cfd_demo_tpu.kernels.mg_pallas import multigrid_pallas
from cfd_demo_tpu.ops.poisson import multigrid


@pytest.mark.parametrize("shape", [(64, 64), (128, 96), (96, 160),
                                   (64, 200)])
def test_multigrid_pallas_matches_xla(shape):
    """Full 3-V-cycle solve: power-of-two, mixed, non-lane-aligned and
    odd-coarse-level (200 -> 25) grids; deep levels hand off to the
    XLA path mid-recursion."""
    ny, nx = shape
    dx, dy = 1.0 / nx, 1.0 / ny
    rhs = jnp.asarray(
        np.random.default_rng(0).standard_normal((ny, nx)), jnp.float32)
    pp0 = jnp.zeros((ny, nx), jnp.float32)
    opts = solver_options_for(Semantics.JS)
    ref, err_ref, _ = jax.jit(
        lambda r: multigrid(pp0, r, dx, dy, opts))(rhs)
    got, err_got, _ = jax.jit(
        lambda r: multigrid_pallas(pp0, r, dx, dy, opts,
                                   interpret=True))(rhs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-6)
    assert np.isclose(float(err_ref), float(err_got),
                      rtol=1e-4, atol=1e-7)


def test_multigrid_pallas_kernel_pieces():
    """Smoother / residual+restrict / prolong+add against the XLA ops
    at level 1 (stride 2), where the interleaved representation is in
    play on both rows and lanes."""
    from cfd_demo_tpu.kernels.mg_pallas import (
        _interleave, _compact, mg_prolong_add_int,
        mg_residual_restrict_int, mg_smooth_int)
    from cfd_demo_tpu.ops.poisson import (_mg_prolong, _mg_residual,
                                          _mg_restrict, _mg_smooth)
    rng = np.random.default_rng(1)
    ncy, ncx, s, nxp = 32, 48, 2, 128
    # dx = 1 keeps the residual O(1): the kernel folds 1/dx^2 into
    # reciprocal multipliers while the XLA op divides, so comparisons
    # at large 1/dx^2 magnify the ~2 ulp op-order difference.
    dx = dy = 1.0
    p_c = jnp.asarray(rng.standard_normal((ncy, ncx)), jnp.float32)
    r_c = jnp.asarray(rng.standard_normal((ncy, ncx)), jnp.float32)
    p_i = _interleave(p_c, s, nxp)
    r_i = _interleave(r_c, s, nxp)

    sm = mg_smooth_int(p_i, r_i, dx, dy, s, ncx, 5, interpret=True)
    ref = _mg_smooth(p_c, r_c, dx, dy, 5)
    np.testing.assert_allclose(np.asarray(_compact(sm, s, ncx, ncy)),
                               np.asarray(ref), rtol=0, atol=1e-6)

    rr = mg_residual_restrict_int(p_i, r_i, dx, dy, s, ncx,
                                  interpret=True)
    res = _mg_residual(p_c, r_c, dx, dy)
    ref_r = _mg_restrict(res, (ncx + 1) // 2, (ncy + 1) // 2)
    np.testing.assert_allclose(
        np.asarray(_compact(rr, 2 * s, (ncx + 1) // 2, (ncy + 1) // 2)),
        np.asarray(ref_r), rtol=1e-5, atol=1e-6)

    e_c = jnp.asarray(
        rng.standard_normal(((ncy + 1) // 2, (ncx + 1) // 2)), jnp.float32)
    e_i = _interleave(e_c, 2 * s, nxp)
    pa = mg_prolong_add_int(e_i, p_i, s, ncx, interpret=True)
    ref_p = p_c + _mg_prolong(e_c, ncx, ncy)
    np.testing.assert_allclose(np.asarray(_compact(pa, s, ncx, ncy)),
                               np.asarray(ref_p), rtol=0, atol=1e-6)


@pytest.mark.parametrize("cavity", [False, True])
def test_mgp_smooth_int_matches_xla(cavity):
    """BC-aware damped smoother at stride 2 vs ops.poisson._mgp_smooth.

    The input's boundary entries are deliberately garbage: the kernel's
    boundary-read folding must reproduce _mgp_smooth(bc(p)) for ANY
    input boundary values (that equivalence is what lets the V-cycle
    drop the explicit bc(p + prolong(e)) pass)."""
    from cfd_demo_tpu.kernels.mg_pallas import (_compact, _interleave,
                                                mgp_smooth_int)
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs,
                                          _apply_pprime_bcs_cavity,
                                          _mgp_smooth)
    bc = _apply_pprime_bcs_cavity if cavity else _apply_pprime_bcs
    rng = np.random.default_rng(2)
    ncy, ncx, s, nxp = 32, 48, 2, 128
    dx = dy = 1.0
    p_c = jnp.asarray(rng.standard_normal((ncy, ncx)), jnp.float32)
    r_c = jnp.asarray(rng.standard_normal((ncy, ncx)), jnp.float32)
    got = mgp_smooth_int(_interleave(p_c, s, nxp),
                         _interleave(r_c, s, nxp), dx, dy, s, ncx,
                         iterations=4, omega=0.75, cavity=cavity,
                         interpret=True)
    ref = _mgp_smooth(bc(p_c), r_c, dx, dy, 0.75, 4, bc)
    np.testing.assert_allclose(np.asarray(_compact(got, s, ncx, ncy)),
                               np.asarray(ref), rtol=0, atol=1e-6)


@pytest.mark.parametrize("shape,cavity", [((64, 200), False),
                                          ((64, 64), True)])
def test_mgp_vcycle_int_matches_xla(shape, cavity):
    """One full BC-aware V-cycle on interleaved arrays vs
    ops.poisson._mgp_vcycle (warm-started, non-zero p): covers the
    smoother at every level, the shared transfer kernels and the
    folded bc(p + prolong(e)); eager interpret keeps it cheap (the
    jitted while-loop solve is compile-heavy on CPU -- one case of
    that below)."""
    from cfd_demo_tpu.kernels.mg_pallas import (_round_up,
                                                _vcycle_mgp_int)
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs,
                                          _apply_pprime_bcs_cavity,
                                          _mg_residual, _mgp_vcycle)
    ny, nx = shape
    dx, dy = 1.0 / nx, 1.0 / ny
    bc = _apply_pprime_bcs_cavity if cavity else _apply_pprime_bcs
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    pp0 = bc(jnp.asarray(0.1 * rng.standard_normal((ny, nx)),
                         jnp.float32))
    opts = solver_options_for(Semantics.RUST)
    ref = _mgp_vcycle(pp0, rhs, dx, dy, opts, bc)
    nxp = _round_up(nx, 128)
    pad = ((0, 0), (0, nxp - nx))
    got = _vcycle_mgp_int(jnp.pad(pp0, pad), jnp.pad(rhs, pad), dx, dy,
                          1, nx, ny, opts, bc, cavity,
                          interpret=True)[:, :nx]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-5)
    # The cycle must actually solve: residual drops vs the rhs norm.
    err = float(jnp.max(jnp.abs(_mg_residual(got, rhs, dx, dy))))
    assert err < float(jnp.max(jnp.abs(rhs))) / dx / dx


def test_multigrid_production_pallas_matches_xla():
    """Full warm-started MG_PRODUCTION solve under jit: same cycle
    count as the XLA path, fields to 1e-5, exit residual equal."""
    from cfd_demo_tpu.kernels.mg_pallas import multigrid_production_pallas
    from cfd_demo_tpu.ops.poisson import multigrid_production
    ny, nx = 32, 96
    dx, dy = 1.0 / nx, 1.0 / ny
    rng = np.random.default_rng(4)
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    pp0 = jnp.asarray(0.1 * rng.standard_normal((ny, nx)), jnp.float32)
    # The whole-cycle kernels implement the LEGACY hierarchy; the XLA
    # reference must run the same scheme (aligned is the default).
    opts = solver_options_for(Semantics.RUST, mgp_scheme="legacy")
    tol_r = 30.0  # a few cycles at this size; exit actually reached
    ref, err_ref, n_ref = jax.jit(
        lambda p, r: multigrid_production(p, r, dx, dy, opts,
                                          tol_r))(pp0, rhs)
    got, err_got, n_got = jax.jit(
        lambda p, r: multigrid_production_pallas(
            p, r, dx, dy, opts, tol_r, interpret=True))(pp0, rhs)
    assert int(n_ref) == int(n_got)
    assert int(n_ref) < opts.mgp_max_cycles  # the exit fired
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-5)
    assert np.isclose(float(err_ref), float(err_got),
                      rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("ncx,s", [(500, 1), (200, 2)])
def test_mg_kernels_2d_tiling_match_1d(ncx, s):
    """Column-tiled (2-D) kernel variants vs the full-width 1-D path on
    a wide level: parity smoother, restrict and prolong must agree to
    float noise (the 2-D path is what unlocks >= 8192-lane levels,
    where the packed transfer windows exceed any full-width row
    block -- docs/PERF.md)."""
    from cfd_demo_tpu.kernels.mg_pallas import (
        _interleave, mg_prolong_add_int, mg_residual_restrict_int,
        mg_smooth_int)
    rng = np.random.default_rng(7)
    ncy, nxp = 64, 512
    dx = dy = 1.0
    p_i = _interleave(jnp.asarray(
        rng.standard_normal((ncy, ncx)), jnp.float32), s, nxp)
    r_i = _interleave(jnp.asarray(
        rng.standard_normal((ncy, ncx)), jnp.float32), s, nxp)

    sm1 = mg_smooth_int(p_i, r_i, dx, dy, s, ncx, 5, interpret=True,
                        tiling="1d")
    sm2 = mg_smooth_int(p_i, r_i, dx, dy, s, ncx, 5, interpret=True,
                        tiling="2d")
    np.testing.assert_allclose(np.asarray(sm1), np.asarray(sm2),
                               rtol=0, atol=1e-6)

    rr1 = mg_residual_restrict_int(p_i, r_i, dx, dy, s, ncx,
                                   interpret=True, tiling="1d")
    rr2 = mg_residual_restrict_int(p_i, r_i, dx, dy, s, ncx,
                                   interpret=True, tiling="2d")
    np.testing.assert_allclose(np.asarray(rr1), np.asarray(rr2),
                               rtol=0, atol=1e-6)

    e_i = _interleave(jnp.asarray(
        rng.standard_normal(((ncy + 1) // 2, (ncx + 1) // 2)),
        jnp.float32), 2 * s, nxp)
    pa1 = mg_prolong_add_int(e_i, p_i, s, ncx, interpret=True,
                             tiling="1d")
    pa2 = mg_prolong_add_int(e_i, p_i, s, ncx, interpret=True,
                             tiling="2d")
    np.testing.assert_allclose(np.asarray(pa1), np.asarray(pa2),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("cavity", [False, True])
def test_mgp_smooth_2d_tiling_matches_1d(cavity):
    """BC-aware damped smoother through the 2-D column tiles, with
    garbage boundary input (the folding contract must hold in every
    window position, including the edge-clamped ones)."""
    from cfd_demo_tpu.kernels.mg_pallas import _interleave, mgp_smooth_int
    rng = np.random.default_rng(8)
    ncy, ncx, s, nxp = 64, 500, 1, 512
    p_i = _interleave(jnp.asarray(
        rng.standard_normal((ncy, ncx)), jnp.float32), s, nxp)
    r_i = _interleave(jnp.asarray(
        rng.standard_normal((ncy, ncx)), jnp.float32), s, nxp)
    got1 = mgp_smooth_int(p_i, r_i, 1.0, 1.0, s, ncx, iterations=4,
                          omega=0.75, cavity=cavity, interpret=True,
                          tiling="1d")
    got2 = mgp_smooth_int(p_i, r_i, 1.0, 1.0, s, ncx, iterations=4,
                          omega=0.75, cavity=cavity, interpret=True,
                          tiling="2d")
    np.testing.assert_allclose(np.asarray(got1), np.asarray(got2),
                               rtol=0, atol=1e-6)


def test_mgp_vcycle_forced_2d_matches_xla(monkeypatch):
    """A full BC-aware V-cycle with every level forced through the 2-D
    column tiles (falling back to 1-D only where no 2-D tiling exists)
    vs ops.poisson._mgp_vcycle -- pins the composed transfer chain on
    the wide-grid code path end to end."""
    from cfd_demo_tpu.kernels import mg_pallas
    from cfd_demo_tpu.ops.poisson import _apply_pprime_bcs, _mgp_vcycle

    def force_2d(one_d, two_d):
        try:
            return ("2d",) + two_d()
        except ValueError:
            return ("1d",) + one_d()

    monkeypatch.setattr(mg_pallas, "_resolve_tiles", force_2d)
    ny, nx = 64, 500
    dx, dy = 1.0 / nx, 1.0 / ny
    rng = np.random.default_rng(9)
    rhs = jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32)
    pp0 = _apply_pprime_bcs(
        jnp.asarray(0.1 * rng.standard_normal((ny, nx)), jnp.float32))
    opts = solver_options_for(Semantics.RUST)
    ref = _mgp_vcycle(pp0, rhs, dx, dy, opts, _apply_pprime_bcs)
    nxp = mg_pallas._round_up(nx, 128)
    pad = ((0, 0), (0, nxp - nx))
    got = mg_pallas._vcycle_mgp_int(
        jnp.pad(pp0, pad), jnp.pad(rhs, pad), dx, dy, 1, nx, ny, opts,
        _apply_pprime_bcs, False, interpret=True)[:, :nx]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-5)
