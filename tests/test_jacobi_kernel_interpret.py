"""Interpret-mode (CPU) equivalence for the fused Jacobi kernels.

The hardware suite (tests/test_pallas_tpu.py) pins these on the chip;
this file pins the same equivalences in the CI loop so kernel-body
refactors (e.g. the round-3 lean-mask rewrite that freed Mosaic
scoped-VMEM for larger tiles) are caught without TPU access.
Covers: 1-D single-block, 1-D multi-block, the 2-D (row x column)
tiling, and the fused smooth+residual variant.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _mk(shape, seed=0, cavity=False):
    # the fused kernels fold boundary reads, which requires
    # BC-consistent input under the SAME flow case
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs,
                                          _apply_pprime_bcs_cavity)
    bc = _apply_pprime_bcs_cavity if cavity else _apply_pprime_bcs
    rng = np.random.default_rng(seed)
    pp = bc(jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    return pp, rhs


@pytest.mark.parametrize("shape,block_rows,k", [
    ((64, 96), 64, 5),     # single block (whole array in VMEM)
    ((512, 1000), 16, 5),  # 1-D multi-block with halo + width padding
    ((40, 96), 8, 3),      # non-power-of-two rows
])
def test_fused_1d_matches_jnp_interpret(shape, block_rows, k):
    from cfd_demo_tpu.kernels.jacobi_pallas import jacobi_fused_k
    from cfd_demo_tpu.ops.poisson import jacobi

    ny, nx = shape
    dx, dy = 1.0 / nx, 1.0 / ny
    pp, rhs = _mk(shape)
    ref, _, _ = jacobi(pp, rhs, dx, dy, 0.75, 0.0, k, early_exit=False)
    got, err = jacobi_fused_k(pp, rhs, dx, dy, 0.75, k,
                              block_rows=block_rows, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-6)
    assert np.isfinite(float(err))


@pytest.mark.parametrize("cavity", [False, True])
@pytest.mark.parametrize("bs,bsx", [(16, 128), (32, 256)])
def test_fused_2d_tiles_match_jnp_interpret(bs, bsx, cavity):
    """The 2-D tile kernel (wide-grid path) against the jnp sweep,
    including the boundary-fold selects in edge tiles and the
    last-iteration error metric."""
    from cfd_demo_tpu.kernels import jacobi_pallas as K
    from cfd_demo_tpu.ops.poisson import (_apply_pprime_bcs,
                                          _apply_pprime_bcs_cavity, jacobi)

    ny, nx = 64, bsx + 2 * K.COL_HALO  # >= one interior + 2 edge tiles
    dx, dy = 1.0 / nx, 1.0 / ny
    pp, rhs = _mk((ny, nx), seed=3, cavity=cavity)
    k = 3
    bc = _apply_pprime_bcs_cavity if cavity else _apply_pprime_bcs
    ref, err_ref, _ = jacobi(pp, rhs, dx, dy, 0.75, 0.0, k,
                             early_exit=False, bc=bc)
    got, err = K._fused_k_2d(pp, rhs, dx, dy, 0.75, k, bs, bsx, nx,
                             interpret=True, cavity=cavity)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-6)
    # err is the raw per-block SMEM vector (the caller maxes it)
    assert np.isclose(float(err_ref), float(jnp.max(err)), rtol=1e-4)


@pytest.mark.parametrize("shape", [(64, 96), (63, 97)])  # odd row-pad
@pytest.mark.parametrize("east_dirichlet,d_wall_mult", [
    (True, 1.0), (True, 1.5), (False, 1.0)])
@pytest.mark.parametrize("emit_res", [True, False])
def test_cc_sweeps_kernel_matches_xla_interpret(shape, east_dirichlet,
                                                d_wall_mult, emit_res):
    """Round 3: the cell-centered coarse-level sweep kernel
    (kernels.jacobi_pallas.cc_sweeps_pallas) against the XLA folded
    operator (ops.poisson._cc_sweeps/_cc_residual) -- mirror folds,
    Dirichlet east ghost, distance-aware outlet diagonal, odd-size
    row padding."""
    from cfd_demo_tpu.kernels.jacobi_pallas import cc_sweeps_pallas
    from cfd_demo_tpu.ops.poisson import _cc_residual, _cc_sweeps

    ny, nx = shape
    dx, dy = 1.0 / nx, 1.0 / ny
    d_wall = d_wall_mult * dx
    rng = np.random.default_rng(11)
    p0 = jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = 3
    ref = _cc_sweeps(p0, rhs, dx, dy, 0.75, k, east_dirichlet, d_wall)
    got, r_got = cc_sweeps_pallas(p0, rhs, dx, dy, 0.75, k,
                                  east_dirichlet, d_wall,
                                  emit_res=emit_res, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)
    if emit_res:
        r_ref = _cc_residual(ref, rhs, dx, dy, east_dirichlet, d_wall)
        np.testing.assert_allclose(np.asarray(r_ref), np.asarray(r_got),
                                   rtol=1e-4, atol=1e-3)
    else:
        assert r_got is None
