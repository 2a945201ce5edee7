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
