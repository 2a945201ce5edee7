"""Velocity corrector + pressure accumulation.

u[j,i]  = u*[j,i]  - dt_sub * (p'[j,i] - p'[j,i-1]) / dx   (i in [1, nx-1])
v[j,i]  = v*[j,i]  - dt_sub * (p'[j,i] - p'[j-1,i]) / dy   (j in [1, ny-1])
p      += p'                                              (everywhere)

model.rs:1334-1404 apply_corrector / index.html:841-863. Faces outside
the update range keep their u*/v* values via .at[] region writes (the
reference writes u in place from u_star, so untouched faces hold the
pre-corrector u; our u* equals that by construction).
"""
from __future__ import annotations

import jax.numpy as jnp


def correct(u_star: jnp.ndarray, v_star: jnp.ndarray, p: jnp.ndarray,
            p_prime: jnp.ndarray, dt_sub, dx: float, dy: float):
    """Returns (u, v, p)."""
    dpx = (p_prime[:, 1:] - p_prime[:, :-1]) / dx     # (ny, nx-1) at u faces 1..nx-1
    u = u_star.at[:, 1:-1].set(u_star[:, 1:-1] - dt_sub * dpx)
    dpy = (p_prime[1:, :] - p_prime[:-1, :]) / dy     # (ny-1, nx) at v faces 1..ny-1
    v = v_star.at[1:-1, :].set(v_star[1:-1, :] - dt_sub * dpy)
    return u, v, p + p_prime
