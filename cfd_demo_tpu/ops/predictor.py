"""Velocity predictor (u*, v*): convection + viscous diffusion.

Re-derivation of the reference predictor loops:
  Rust: piso_step u loop model.rs:538-581, v loop :586-670,
        compute_ustar :381-436, compute_vstar :438-521.
  JS:   index.html:372-549 (u), :553-725 (v).

u* = u + dt*(-[(Fe-Fw)/dx + (Fn-Fs)/dy] + nu*laplace(u)), with
Fe = face_e^2, Fn = v_n*face_n (u-momentum) and Fe = u_e*face_e,
Fn = face_n^2 (v-momentum). Obstacle faces are forced to zero
(select-to-zero, model.rs:434/519; position test index.html:377-380).

The interior update regions are
  u: j in [1, ny-2], i in [1, nx-1]   (model.rs:540-541 loop bounds)
  v: j in [1, ny-1], i in [1, nx-2]   (model.rs:588-589 / index.html:554)
outside of which u* = u (the JS `uStar.set(u)` at index.html:370-371;
see docs/SPEC.md for the deviation from Rust's stale-buffer boundary
quirk).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.config import VelocityScheme
from .schemes import u_faces, v_faces
from .stencil import DEFAULT_CTX, StencilCtx, apply_solid_mask


def predict(u, v, dt_sub, nu, dx, dy, nx: int, ny: int,
            scheme: VelocityScheme, avg_conv_v: bool,
            mask_u, mask_v, ctx: StencilCtx = DEFAULT_CTX):
    """Returns (u_star, v_star)."""
    # ---- u momentum -------------------------------------------------
    fu = u_faces(u, v, nx, ny, scheme, avg_conv_v, ctx=ctx)
    conv_u = ((fu.e * fu.e - fu.w * fu.w) / dx
              + (fu.v_n * fu.n - fu.v_s * fu.s) / dy)
    su = ctx.shifts(u, u.shape)
    lap_u = ((su(0, 1) - 2.0 * u + su(0, -1)) / (dx * dx)
             + (su(1, 0) - 2.0 * u + su(-1, 0)) / (dy * dy))
    u_cand = u + dt_sub * (-conv_u + nu * lap_u)
    iu, ju = ctx.col_index(u.shape), ctx.row_index(u.shape)
    interior_u = (iu >= 1) & (iu <= nx - 1) & (ju >= 1) & (ju <= ny - 2)
    u_cand = apply_solid_mask(u_cand, mask_u)
    u_star = jnp.where(interior_u, u_cand, u)

    # ---- v momentum -------------------------------------------------
    fv = v_faces(u, v, nx, ny, scheme, ctx=ctx)
    conv_v = ((fv.u_e * fv.e - fv.u_w * fv.w) / dx
              + (fv.n * fv.n - fv.s * fv.s) / dy)
    sv = ctx.shifts(v, v.shape)
    lap_v = ((sv(0, 1) - 2.0 * v + sv(0, -1)) / (dx * dx)
             + (sv(1, 0) - 2.0 * v + sv(-1, 0)) / (dy * dy))
    v_cand = v + dt_sub * (-conv_v + nu * lap_v)
    iv, jv = ctx.col_index(v.shape), ctx.row_index(v.shape)
    interior_v = (iv >= 1) & (iv <= nx - 2) & (jv >= 1) & (jv <= ny - 1)
    v_cand = apply_solid_mask(v_cand, mask_v)
    v_star = jnp.where(interior_v, v_cand, v)
    return u_star, v_star
