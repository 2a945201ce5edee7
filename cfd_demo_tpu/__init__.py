"""cfd-demo-tpu: a TPU-native 2D incompressible Navier-Stokes framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
TSultanov/cfd-demo (staggered-grid PISO solver with upwind schemes,
iterative pressure projection, obstacles, tracer particles, meshing and
rendering), designed for TPU: pure pytree state, fused whole-array
stencils, lax.scan/while_loop iteration, sharding over ICI meshes, and
Pallas kernels on the hot path.
"""

from .core.config import (Box, Cylinder, FlowCase, Grid, InletProfile, PressureSolver,
                          Semantics, SimulationParams, SolverOptions,
                          VelocityScheme, cavity_grid, default_grid,
                          default_js_grid, solver_options_for)
from .core.state import State, init_state, set_params
from .solver.piso import (Scene, StepDiagnostics, make_run, make_scene,
                          make_step, piso_substep, step_fn)

__version__ = "0.1.0"
