"""Velocity boundary conditions.

model.rs:826-875 apply_boundary_conditions / index.html:870-930, applied
at the end of every PISO substep, in this exact order:

1. inlet:  u[j, 0] = profile(y_j)    (uniform or clamped parabolic)
2. outlet: u[j, nx] = u[j, nx-1]     (zero-gradient)
3. no-slip rows: u[0, :] = u[ny-1, :] = 0   (overwrites inlet/outlet
   corners -- order matters and is preserved)
4. v rows: v[0, :] = v[ny, :] = 0
5. obstacle zeroing via the per-semantics BC masks (Rust: west u face /
   south v face of obstacle cells, model.rs:869-874; JS: every face
   whose position is inside, index.html:912-929)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.config import Grid, InletProfile


def inlet_profile_column(grid: Grid, profile: InletProfile,
                         inlet_velocity, dtype=jnp.float32) -> jnp.ndarray:
    """Per-row inlet u value (model.rs:833-848). ``inlet_velocity`` may
    be a traced scalar (ramp)."""
    y = (np.arange(grid.ny, dtype=np.float32) + 0.5) * np.float32(grid.dy)
    if profile == InletProfile.UNIFORM:
        return inlet_velocity * jnp.ones((grid.ny,), dtype)
    center = grid.ly / 2.0
    radius = grid.ly / 2.0
    shape_fn = jnp.asarray(1.0 - ((y - center) / radius) ** 2, dtype)
    # The reference clamps the final value, not the shape (model.rs:842-847).
    return jnp.maximum(inlet_velocity * shape_fn, 0.0)


def apply_bcs(u: jnp.ndarray, v: jnp.ndarray, grid: Grid,
              profile: InletProfile, inlet_velocity,
              mask_u_bc: jnp.ndarray, mask_v_bc: jnp.ndarray):
    """Returns (u, v) with boundary conditions enforced."""
    u = u.at[:, 0].set(inlet_profile_column(grid, profile, inlet_velocity,
                                            u.dtype))
    u = u.at[:, -1].set(u[:, -2])
    u = u.at[0, :].set(0.0)
    u = u.at[-1, :].set(0.0)
    v = v.at[0, :].set(0.0)
    v = v.at[-1, :].set(0.0)
    u = jnp.where(mask_u_bc > 0, 0.0, u)
    v = jnp.where(mask_v_bc > 0, 0.0, v)
    return u, v
