"""shard_map red/black SOR pressure solve with explicit halo exchange.

The multi-chip form of the SOR solver (ops.poisson.sor, the parallel
red/black redesign of the JS twin's lexicographic sweep,
index.html:741-774): each fused-K Pallas launch
(kernels.sor_pallas._kernel_shard) consumes a 2K-row halo -- the black
half-sweep reads the red half's updated values, so validity shrinks TWO
rings per iteration -- exchanged once per launch via ppermute
(shard.halo.exchange_rows). Structure mirrors
shard.jacobi_shmap.jacobi_pallas_shard_body.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.jacobi_pallas import _halo8
from .halo import exchange_rows


def sor_pallas_shard_body(pp_loc: jnp.ndarray, rhs_loc: jnp.ndarray,
                          gny: int, axis: str, dx: float, dy: float,
                          omega: float, iters: int, k: int = 5,
                          interpret: bool = False,
                          cavity: bool = False, tol: float = 0.0,
                          early_exit: bool = False):
    """Shard-local body of the fused multi-chip SOR: call INSIDE
    shard_map over a row-sharded (gny, nx) p'. Exchanges a 2K-row halo
    once per fused-K launch. Returns (local p', global last-launch max
    error). Requires iters % k == 0 and local rows % 8 == 0."""
    from ..kernels.sor_pallas import sor_fused_k_shard

    local = pp_loc.shape[0]
    halo = _halo8(2 * k)
    assert iters % k == 0 and local % 8 == 0 and local >= halo

    rhs_ext = exchange_rows(rhs_loc, axis, halo)
    row_off = lax.axis_index(axis) * local - halo

    def one_launch(pp_loc):
        ppx = exchange_rows(pp_loc, axis, halo)
        out_ext, err = sor_fused_k_shard(
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


def sor_pallas_shmap(pp: jnp.ndarray, rhs: jnp.ndarray, mesh: Mesh,
                     dx: float, dy: float, omega: float, iters: int,
                     k: int = 5, axis: str = "y",
                     interpret: bool = False, cavity: bool = False,
                     tol: float = 0.0, early_exit: bool = False):
    """Multi-chip fused red/black SOR over a row-sharded (ny, nx) p'.
    ``interpret=True`` runs the kernel in the Pallas interpreter so the
    path is testable on the virtual CPU mesh (tests/test_shmap.py)."""
    ny, nx = pp.shape

    def shard_fn(pp_loc, rhs_loc):
        return sor_pallas_shard_body(pp_loc, rhs_loc, ny, axis, dx, dy,
                                     omega, iters, k, interpret, cavity,
                                     tol=tol, early_exit=early_exit)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(axis, None), P(axis, None)),
                       out_specs=(P(axis, None), P()),
                       check_vma=False)
    return fn(pp, rhs)


def sor_pallas_shard_body_2d(pp_loc: jnp.ndarray, rhs_loc: jnp.ndarray,
                             gny: int, gnx: int, yaxis: str, xaxis: str,
                             dx: float, dy: float, omega: float,
                             iters: int, k: int = 5,
                             interpret: bool = False,
                             cavity: bool = False, tol: float = 0.0,
                             early_exit: bool = False):
    """2-D (rows x cols) twin of sor_pallas_shard_body (round 3,
    mirroring jacobi_shmap.jacobi_pallas_shard_body_2d): one both-axis
    2K-wide halo exchange per fused-K launch, the shard kernel running
    with global row AND column offsets (the red/black parity is keyed
    on global row+col, so colors are shard-invariant). Returns
    (local p', global last-launch max error)."""
    from ..kernels.sor_pallas import sor_fused_k_shard
    from .halo import exchange_rows_cols

    loc_y, loc_x = pp_loc.shape
    halo = _halo8(2 * k)
    assert iters % k == 0 and loc_y % 8 == 0
    assert loc_y >= halo and loc_x >= halo

    rhs_ext = exchange_rows_cols(rhs_loc, yaxis, xaxis, halo, halo)
    row_off = lax.axis_index(yaxis) * loc_y - halo
    col_off = lax.axis_index(xaxis) * loc_x - halo

    def one_launch(pp_loc):
        ppx = exchange_rows_cols(pp_loc, yaxis, xaxis, halo, halo)
        out_ext, err = sor_fused_k_shard(
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
