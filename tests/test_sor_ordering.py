"""Measured bound on the SOR ordering deviation (docs/SPEC.md item 4).

The JS twin's SOR is an in-place LEXICOGRAPHIC sweep
(index.html:747-760); every device path here is red/black. The
deviation is quantified, not just asserted: the oracle carries both
orderings (sor_ordering option), and these tests pin

  1. the per-solve gap is bounded by a small multiple of the reported
     per-sweep residual and VANISHES as the solve converges (the two
     orderings share the fixed point; only the iterate path differs);
  2. convergence quality parity: both orderings reach the same
     per-sweep delta within a few percent at equal iteration count;
  3. the step-trajectory envelope on a JS-style cylinder scene.
"""
import dataclasses

import numpy as np
import pytest

from cfd_demo_tpu import solver_options_for
from cfd_demo_tpu.core.config import (Cylinder, Grid, PressureSolver,
                                      Semantics, SimulationParams)
from cfd_demo_tpu.oracle.reference import NumpyModel

F = np.float32


def _scene():
    grid = Grid(nx=60, ny=20, lx=30.0, ly=10.0,
                obstacles=(Cylinder(7.5, 5.0, 0.75),))
    params = SimulationParams(dt=0.005, viscosity=1e-4,
                              pressure_solver=PressureSolver.SOR)
    opts = solver_options_for(Semantics.JS, ramp_up_steps=10,
                              substeps_adaptive=False, substeps_init=1)
    return grid, params, opts


def _developed_rhs(grid, params, opts, steps=10):
    m = NumpyModel(grid, params, opts)
    for _ in range(steps):
        m.update()
    us, vs = m._predict(F(m.dt))
    return m._divergence_rhs(us, vs, F(m.dt)), m.p


def test_sor_ordering_gap_bounded_by_residual():
    """Per-solve gap <= 15x the per-sweep residual, and it shrinks
    ~proportionally as iterations increase (shared fixed point).
    Measured on this scene: rel gap 1.3e-1 at 50 iters, 4.1e-2 at 200,
    2.2e-5 at 4000; gap/residual ratio 8-12 throughout."""
    grid, params, opts = _scene()
    rhs, p = _developed_rhs(grid, params, opts)
    rel_gaps = []
    for iters, _ in ((50, None), (400, None)):
        o = dataclasses.replace(opts, jacobi_iters=iters)
        m1 = NumpyModel(grid, params, o)
        pp_rb, err_rb = m1._sor_redblack(np.zeros_like(p), rhs.copy())
        m2 = NumpyModel(grid, params,
                        dataclasses.replace(o, sor_ordering="lexicographic"))
        pp_lex, err_lex = m2._sor_lexicographic(np.zeros_like(p), rhs.copy())
        gap = float(np.abs(pp_rb - pp_lex).max())
        assert gap <= 15.0 * max(float(err_rb), float(err_lex)), (iters, gap)
        # convergence-quality parity at equal iteration count
        assert np.isclose(float(err_rb), float(err_lex), rtol=0.10), iters
        rel_gaps.append(gap / float(np.abs(pp_lex).max()))
    # converging solves close the ordering gap
    assert rel_gaps[1] < rel_gaps[0] / 3.0, rel_gaps


def test_sor_ordering_trajectory_envelope():
    """12 steps of the JS-style scene with each ordering: velocity
    fields stay within a ~1% infinity-norm envelope of each other and
    the reported residuals track within 5%. (Measured: rel u gap
    1.0e-2 at step 12 while the wake develops.)"""
    grid, params, opts = _scene()
    m_rb = NumpyModel(grid, params, opts)
    m_lex = NumpyModel(
        grid, params, dataclasses.replace(opts,
                                          sor_ordering="lexicographic"))
    for _ in range(12):
        m_rb.update()
        m_lex.update()
    umax = float(np.abs(m_lex.u).max())
    assert float(np.abs(m_rb.u - m_lex.u).max()) <= 0.03 * umax
    assert np.isclose(m_rb.res_p, m_lex.res_p, rtol=0.05)


def test_lexicographic_rejected_on_device_paths():
    """The device solver refuses the sequential ordering loudly."""
    import cfd_demo_tpu as cfd
    grid, params, opts = _scene()
    scene = cfd.make_scene(
        grid, params,
        dataclasses.replace(opts, sor_ordering="lexicographic",
                            pressure_impl="jnp", substep_impl="jnp"))
    with pytest.raises(ValueError, match="lexicographic"):
        cfd.make_step(scene, donate=False)(scene.init_state())
