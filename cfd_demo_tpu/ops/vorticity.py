"""Cell-centered derived fields: velocity magnitude and vorticity.

* velocity magnitude: face-average u and v to cell centers
  (src/app.rs:289-306, index.html:1014-1016).
* vorticity: the two references differ --
  - Rust (src/app.rs:345-361): central differences of the *cell-
    centered averaged* velocity field on interior cells,
    w = dv/dx - du/dy over 2dx/2dy, zero on the boundary ring.
  - JS (index.html:933-946): averages the staggered neighbors first
    (equivalent formulation), also zero on the boundary ring.
  Both reduce to the same stencil on the cell-centered field; we
  implement that once.
"""
from __future__ import annotations

import jax.numpy as jnp

from .stencil import shifted


def cell_center_velocity(u: jnp.ndarray, v: jnp.ndarray):
    """(uc, vc) on pressure cells. v is in the implicit-top-row layout
    (Grid.shape_v); the zero-padding shift supplies v[ny] = 0."""
    uc = 0.5 * (u[:, :-1] + u[:, 1:])
    vc = 0.5 * (v + shifted(v, v.shape, 1, 0))
    return uc, vc


def velocity_magnitude(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    uc, vc = cell_center_velocity(u, v)
    return jnp.sqrt(uc * uc + vc * vc)


def vorticity(u: jnp.ndarray, v: jnp.ndarray, dx: float, dy: float) -> jnp.ndarray:
    # Whole-array shifts + an iota interior select (NOT an
    # .at[1:-1,1:-1].set scatter): update-slice writes are
    # mis-partitioned by GSPMD under row sharding (CLAUDE.md
    # invariant), and this runs under jit in the render path of
    # sharded states.
    from .stencil import iota_masks, shifted
    uc, vc = cell_center_velocity(u, v)
    shape = uc.shape
    dvdx = (shifted(vc, shape, 0, 1) - shifted(vc, shape, 0, -1)) / (2.0 * dx)
    dudy = (shifted(uc, shape, 1, 0) - shifted(uc, shape, -1, 0)) / (2.0 * dy)
    interior, _, _ = iota_masks(shape)
    return jnp.where(interior, dvdx - dudy, 0.0)
