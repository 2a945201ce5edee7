"""shard_map Jacobi pressure solve with explicit ppermute halo exchange.

Two variants over a row-sharded p' (SURVEY.md section 7, "Multi-chip
Jacobi"):

* ``k=1``: one 1-row halo exchange per sweep -- latency-bound at 50
  iterations but minimal redundant compute.
* ``k>1`` (wide halo): exchange K rows once, run K sweeps locally with
  the valid region shrinking into the halo, so only ceil(iters/K)
  exchanges cross ICI -- the multi-chip analog of the fused-K Pallas
  kernel (kernels/jacobi_pallas.py).

Both produce fields identical to the single-device solver
(tests/test_shmap.py asserts equality on the virtual CPU mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.stencil import shifted
from .halo import exchange_rows, global_row_index


def _pvary(x, axis):
    """Mark a replicated value device-varying over ``axis`` (scan carry
    types must match). jax >= 0.9 renames pvary -> pcast(to='varying')."""
    if hasattr(lax, "pcast"):
        return lax.pcast(x, (axis,), to="varying")
    return lax.pvary(x, (axis,))


def _sweep_ext(ppx, rhsx, gr, gc, ny, nx, dx2, dy2, omega):
    """One damped-Jacobi sweep on a halo-extended block, with the
    reference's per-iteration p' BCs applied via *global* index masks
    (channel flow: Neumann bottom/top/left, outlet column 0)."""
    denom = 2.0 / dx2 + 2.0 / dy2
    east = shifted(ppx, ppx.shape, 0, 1)
    west = shifted(ppx, ppx.shape, 0, -1)
    north = shifted(ppx, ppx.shape, 1, 0)
    south = shifted(ppx, ppx.shape, -1, 0)
    update = ((east + west) / dx2 + (north + south) / dy2 - rhsx) / denom
    new = omega * update + (1.0 - omega) * ppx
    interior = (gr >= 1) & (gr <= ny - 2) & (gc >= 1) & (gc <= nx - 2)
    delta = jnp.where(interior, jnp.abs(new - ppx), 0.0)
    ppx = jnp.where(interior, new, ppx)
    ppx = jnp.where(gr == 0, shifted(ppx, ppx.shape, 1, 0), ppx)
    ppx = jnp.where(gr == ny - 1, shifted(ppx, ppx.shape, -1, 0), ppx)
    ppx = jnp.where(gc == 0, shifted(ppx, ppx.shape, 0, 1), ppx)
    ppx = jnp.where(gc == nx - 1, 0.0, ppx)
    return ppx, delta


def jacobi_shmap(pp: jnp.ndarray, rhs: jnp.ndarray, mesh: Mesh,
                 dx: float, dy: float, omega: float, iters: int,
                 k: int = 1, axis: str = "y"):
    """Fixed-iteration sharded Jacobi. Returns (p', last-sweep max err).

    Requires iters % k == 0 and local_rows >= k.
    """
    ny, nx = pp.shape
    n_shards = mesh.shape[axis]
    local = ny // n_shards
    assert iters % k == 0 and local >= k
    dx2, dy2 = dx * dx, dy * dy

    def shard_fn(pp_loc, rhs_loc):
        gc = lax.broadcasted_iota(jnp.int32, (local + 2 * k, nx), 1)
        gr = global_row_index(local, axis, halo=k)
        # rhs never changes across launches: one halo exchange total.
        rhsx = exchange_rows(rhs_loc, axis, k)

        def launch(carry, _):
            pp_loc, _ = carry
            ppx = exchange_rows(pp_loc, axis, k)

            def body(i, c):
                ppx, _ = c
                ppx, delta = _sweep_ext(ppx, rhsx, gr, gc, ny, nx,
                                        dx2, dy2, omega)
                # Only rows this shard owns count toward the residual;
                # halo rows go stale as the valid region shrinks.
                owned = (gr >= lax.axis_index(axis) * local) & \
                        (gr < (lax.axis_index(axis) + 1) * local)
                err = jnp.max(jnp.where(owned, delta, 0.0))
                return ppx, err

            ppx, err = lax.fori_loop(
                0, k, body,
                (ppx, _pvary(jnp.float32(0.0), axis)))
            return (ppx[k:k + local, :], err), None

        # Initial err must already be device-varying over the mesh axis
        # or the scan carry types mismatch.
        err0 = _pvary(jnp.float32(jnp.inf), axis)
        (pp_loc, err), _ = lax.scan(launch, (pp_loc, err0),
                                    None, length=iters // k)
        return pp_loc, lax.pmax(err, axis)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(axis, None), P(axis, None)),
                       out_specs=(P(axis, None), P()))
    return fn(pp, rhs)


def jacobi_pallas_shard_body(pp_loc: jnp.ndarray, rhs_loc: jnp.ndarray,
                             gny: int, axis: str, dx: float, dy: float,
                             omega: float, iters: int, k: int = 10,
                             interpret: bool = False,
                             cavity: bool = False, tol: float = 0.0,
                             early_exit: bool = False):
    """Shard-local body of the fused multi-chip Jacobi: must be called
    INSIDE shard_map over a row-sharded (gny, nx) p'. Exchanges a
    k-iteration-wide halo via ppermute once per fused-K Pallas launch
    (kernels.jacobi_pallas._kernel_shard). Returns
    (local p', global last-launch max error). Requires iters % k == 0
    and local rows % 8 == 0.

    ``early_exit`` stops between launches once the globally pmax'd
    last-sweep residual drops below ``tol`` -- the multi-chip analog of
    kernels.jacobi_pallas.jacobi_pallas's K-granularity convergence
    check (the while condition is replicated, so every shard runs the
    same launch count)."""
    from ..kernels.jacobi_pallas import _halo8, jacobi_fused_k_shard

    local = pp_loc.shape[0]
    halo = _halo8(k)
    assert iters % k == 0 and local % 8 == 0 and local >= halo

    # rhs is launch-invariant: exchange once.
    rhs_ext = exchange_rows(rhs_loc, axis, halo)
    row_off = lax.axis_index(axis) * local - halo

    def one_launch(pp_loc):
        ppx = exchange_rows(pp_loc, axis, halo)
        out_ext, err = jacobi_fused_k_shard(
            ppx, rhs_ext, row_off, gny, dx, dy, omega, k,
            own_lo=halo, own_hi=halo + local,
            interpret=interpret, cavity=cavity)
        return out_ext[halo:halo + local, :], lax.pmax(err, axis)

    if early_exit and tol > 0.0:
        def cond(carry):
            _, err, it = carry
            return jnp.logical_and(it < iters // k, err >= tol)

        def body(carry):
            pp_loc, _, it = carry
            pp_loc, err = one_launch(pp_loc)
            return pp_loc, err, it + 1

        pp_loc, err, _ = lax.while_loop(
            cond, body,
            (pp_loc, jnp.asarray(jnp.inf, jnp.float32),
             jnp.asarray(0, jnp.int32)))
        return pp_loc, err

    def launch(carry, _):
        pp_loc, _ = carry
        pp_loc, err = one_launch(pp_loc)
        return (pp_loc, err), None

    err0 = jnp.asarray(jnp.inf, jnp.float32)
    (pp_loc, err), _ = lax.scan(launch, (pp_loc, err0), None,
                                length=iters // k)
    return pp_loc, err


def jacobi_pallas_shard_body_2d(pp_loc: jnp.ndarray, rhs_loc: jnp.ndarray,
                                gny: int, gnx: int, yaxis: str, xaxis: str,
                                dx: float, dy: float, omega: float,
                                iters: int, k: int = 10,
                                interpret: bool = False,
                                cavity: bool = False, tol: float = 0.0,
                                early_exit: bool = False):
    """2-D (rows x cols) twin of jacobi_pallas_shard_body: each fused-K
    launch is preceded by ONE both-axis wide-halo exchange (row AND
    column ppermutes, corners included), and the per-shard kernel runs
    on the (loc_y + 2h, loc_x + 2h) extended block with global row and
    column offsets. Returns (local p', global last-launch max error).
    Requires iters % k == 0, local rows % 8 == 0 and local rows/cols
    >= halo8(k)."""
    from ..kernels.jacobi_pallas import _halo8, jacobi_fused_k_shard
    from .halo import exchange_rows_cols

    loc_y, loc_x = pp_loc.shape
    halo = _halo8(k)
    assert iters % k == 0 and loc_y % 8 == 0
    assert loc_y >= halo and loc_x >= halo

    rhs_ext = exchange_rows_cols(rhs_loc, yaxis, xaxis, halo, halo)
    row_off = lax.axis_index(yaxis) * loc_y - halo
    col_off = lax.axis_index(xaxis) * loc_x - halo

    def one_launch(pp_loc):
        ppx = exchange_rows_cols(pp_loc, yaxis, xaxis, halo, halo)
        out_ext, err = jacobi_fused_k_shard(
            ppx, rhs_ext, row_off, gny, dx, dy, omega, k,
            own_lo=halo, own_hi=halo + loc_y,
            interpret=interpret, cavity=cavity,
            col_offset=col_off, gnx=gnx,
            own_cols=(halo, halo + loc_x))
        return (out_ext[halo:halo + loc_y, halo:halo + loc_x],
                lax.pmax(lax.pmax(err, yaxis), xaxis))

    if early_exit and tol > 0.0:
        def cond(carry):
            _, err, it = carry
            return jnp.logical_and(it < iters // k, err >= tol)

        def body(carry):
            pp_loc, _, it = carry
            pp_loc, err = one_launch(pp_loc)
            return pp_loc, err, it + 1

        pp_loc, err, _ = lax.while_loop(
            cond, body,
            (pp_loc, jnp.asarray(jnp.inf, jnp.float32),
             jnp.asarray(0, jnp.int32)))
        return pp_loc, err

    def launch(carry, _):
        pp_loc, _ = carry
        pp_loc, err = one_launch(pp_loc)
        return (pp_loc, err), None

    err0 = jnp.asarray(jnp.inf, jnp.float32)
    (pp_loc, err), _ = lax.scan(launch, (pp_loc, err0), None,
                                length=iters // k)
    return pp_loc, err


def jacobi_pallas_shmap(pp: jnp.ndarray, rhs: jnp.ndarray, mesh: Mesh,
                        dx: float, dy: float, omega: float, iters: int,
                        k: int = 10, axis: str = "y",
                        interpret: bool = False, cavity: bool = False,
                        tol: float = 0.0, early_exit: bool = False):
    """Multi-chip fused Jacobi: ppermute halo exchange between launches,
    the fused-K Pallas kernel (kernels.jacobi_pallas._kernel_shard) on
    each shard's halo-extended block. One ICI exchange per K iterations
    (the wide-halo batching of SURVEY.md section 7 "Multi-chip Jacobi").

    ``interpret=True`` runs the kernel in the Pallas interpreter so the
    whole path is testable on the virtual CPU mesh. Requires
    iters % k == 0 and local rows divisible by 8.
    """
    ny, nx = pp.shape

    def shard_fn(pp_loc, rhs_loc):
        return jacobi_pallas_shard_body(pp_loc, rhs_loc, ny, axis, dx, dy,
                                        omega, iters, k, interpret, cavity,
                                        tol=tol, early_exit=early_exit)

    # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no
    # varying-mesh-axes annotation.
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(axis, None), P(axis, None)),
                       out_specs=(P(axis, None), P()),
                       check_vma=False)
    return fn(pp, rhs)
