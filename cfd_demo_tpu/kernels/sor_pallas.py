"""Fused multi-iteration red/black SOR sweep as a Pallas TPU kernel.

Same wide-halo window design as kernels.jacobi_pallas (manual DMA of
overlapping row windows, K iterations per launch in VMEM), for the
red/black SOR pressure solver (ops.poisson.sor -- the parallel form of
the JS twin's lexicographic SOR, index.html:741-774). Each iteration is
two color half-sweeps, and the black half reads the red half's updated
values, so the valid region shrinks TWO rings per iteration: the halo
spans 2K rows.

Boundary-read folding carries over from the Jacobi kernel: a boundary
cell always mirrors the very neighbor that reads it, and that neighbor
cannot have changed between the (end-of-iteration) BC application and
the read -- in either half -- so interior cells adjacent to a Neumann
boundary read themselves, the Dirichlet outlet reads 0, and the BC
refresh runs once per launch. Requires BC-consistent p' input, which
the solver always supplies.

Update arithmetic uses reciprocal multipliers (omega/(dx2*denom), ...)
rather than the jnp path's literal divides; XLA compiles the divides to
the same form under --xla_allow_excess_precision, and the equivalence
tests bound the difference at ~1 ulp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jacobi_pallas import _halo8


def _kernel(pp_hbm, rhs_hbm, out_ref, err_ref, pp_win, rhs_win, sem,
            *, ny, nx, nxp, bs, halo, k, dx2, dy2, omega, cavity):
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    # 2k halo rows below row0 (two rings of validity per iteration).
    start = pl.multiple_of(
        jnp.clip(((row0 - 2 * k) // 8) * 8, 0, ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(pp_hbm.at[pl.ds(start, w), :], pp_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # 1-D masks (lean form, round 3 -- see jacobi_pallas); only the
    # red/black parity needs the true 2-D combine, built once.
    gr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    gc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    interior_r = (gr >= 1) & (gr <= ny - 2)
    interior_c = (gc >= 1) & (gc <= nx - 2)
    owned_r = interior_r & (gr >= row0) & (gr < row0 + bs)
    interior = interior_r & interior_c
    par = (gr + gc) % 2
    red = interior & (par == 0)
    black = interior & (par == 1)
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / (dx2 * denom))
    by = jnp.float32(1.0 / (dy2 * denom))
    br = jnp.float32(1.0 / denom)
    om = jnp.float32(omega)
    # scale rhs in place: a separate scaled copy would stay live across
    # the whole sweep loop
    rhs_win[:] = br * rhs_win[:]

    def half(pp, mask, fold_rows=True):
        E = pltpu.roll(pp, nxp - 1, 1)
        W = pltpu.roll(pp, 1, 1)
        N = pltpu.roll(pp, w - 1, 0)
        S = pltpu.roll(pp, 1, 0)
        if fold_rows:
            S = jnp.where(adj_bot, pp, S)
            N = jnp.where(adj_top, pp, N)
        W = jnp.where(adj_left, pp, W)
        E = (jnp.where(adj_right, pp, E) if cavity
             else jnp.where(adj_right, 0.0, E))
        update = bx * (E + W) + by * (N + S) - rhs_win[:]
        new = (1.0 - om) * pp + om * update
        return jnp.where(mask, new, pp)

    def iterate(want_err, fold_rows=True):
        old = pp_win[:]
        pp = half(old, red, fold_rows)
        pp = half(pp, black, fold_rows)
        err = (jnp.max(jnp.where(owned_r & interior_c,
                                 jnp.abs(pp - old), 0.0))
               if want_err else jnp.float32(0.0))
        pp_win[:] = pp
        return err

    # Row-interior window specialization (see jacobi_pallas._kernel):
    # windows with no boundary-adjacent rows drop the row-fold selects
    # in both color half-sweeps.
    inner_rows = jnp.logical_and(start >= 2, start + w <= ny - 2)

    @pl.when(inner_rows)
    def _():
        lax.fori_loop(0, k - 1,
                      lambda _, c: (iterate(False, fold_rows=False), c)[1], 0)

    @pl.when(jnp.logical_not(inner_rows))
    def _():
        lax.fori_loop(0, k - 1, lambda _, c: (iterate(False), c)[1], 0)

    err = iterate(True)
    # BCs once per launch (ops.poisson._apply_pprime_bcs[_cavity]).
    pp = pp_win[:]
    pp = jnp.where(is_bot, pltpu.roll(pp, w - 1, 0), pp)
    pp = jnp.where(is_top, pltpu.roll(pp, 1, 0), pp)
    pp = jnp.where(is_left, pltpu.roll(pp, nxp - 1, 1), pp)
    if cavity:
        pp = jnp.where(is_right, pltpu.roll(pp, 1, 1), pp)
        pp = jnp.where(is_bot & is_left, 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    pp_win[:] = pp
    out_cp = pltpu.make_async_copy(pp_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()
    err_ref[i, 0] = err


COL_HALO = 128  # lane-tile-aligned column halo for the 2-D tiling
_N_TEMPS = 7    # live window temporaries of the two color half-sweeps
_LIMIT = 14 * 1024 * 1024


def _tile(ny: int, nxp: int, k: int, block_rows: int):
    """(bs, halo) or None when no VMEM-feasible row tiling exists.
    Models ~7 window-sized live temporaries (the two color half-sweeps
    keep more values alive than the Jacobi body) against the 16 MB
    scoped-VMEM limit."""
    def fits(bs, halo):
        w = bs + 2 * halo
        return ((2 + _N_TEMPS) * w + bs) * nxp * 4 <= _LIMIT

    if ny % 8 == 0 and fits(ny, 0):
        return ny, 0
    halo = _halo8(2 * k)
    bs = block_rows
    while bs >= 8:
        if ny % bs == 0 and ny >= bs + 2 * halo and fits(bs, halo):
            return bs, halo
        bs //= 2
    return None


def _tile2d(ny: int, nxp: int, k: int, block_rows: int):
    """2-D (row x column) tiling for grids too wide for any full-width
    row block (same fall-through as kernels.jacobi_pallas /
    mg_pallas._resolve_tiles). The fixed 128-lane column halo must
    cover the TWO validity rings each red/black iteration consumes,
    hence the 2k <= COL_HALO gate. Returns (bs, halo, bsx) with the
    least window-read redundancy, or None."""
    if 2 * k > COL_HALO:
        return None
    halo = _halo8(2 * k)

    # Calibrated against Mosaic's scoped-vmem accounting IN-SCAN (the
    # production context): a (w=144, cw=2304) window compiled to 18.23M
    # scoped -- ~13.7 window-sized buffers -- where the 1-D model's 9
    # predicted 13.0M. 16 gives margin across k.
    n_bufs = 16

    def fits(bs, bsx):
        w, cw = bs + 2 * halo, bsx + 2 * COL_HALO
        return (n_bufs * w * cw + bs * bsx) * 4 <= _LIMIT

    nlanes = nxp // 128
    cands = [d * 128 for d in range(nlanes // 2, 0, -1)
             if nlanes % d == 0]
    best = None
    bs = block_rows
    while bs >= 8:
        if ny % bs == 0 and ny >= bs + 2 * halo:
            for bsx in cands:
                if nxp >= bsx + 2 * COL_HALO and fits(bs, bsx):
                    cost = ((bs + 2 * halo) * (bsx + 2 * COL_HALO)
                            / (bs * bsx))
                    if best is None or cost < best[0]:
                        best = (cost, bs, halo, bsx)
                    break  # larger bsx always beats smaller at this bs
        bs //= 2
    return None if best is None else best[1:]


def _tiles(ny: int, nxp: int, k: int, block_rows: int, tiling="auto"):
    """("1d", bs, halo) | ("2d", bs, halo, bsx) | None -- least
    window-read redundancy wins (mirror of mg_pallas._resolve_tiles).
    ``tiling`` forces one family ("1d"/"2d", for tests/benchmarks);
    auto only considers 2-D at >= 4096 lanes (below that the 1-D
    windows always fit with less redundancy)."""
    t1 = _tile(ny, nxp, k, block_rows) if tiling != "2d" else None
    if tiling == "1d":
        return None if t1 is None else ("1d",) + t1
    if t1 is not None and t1[1] == 0:
        return ("1d",) + t1
    if tiling == "auto" and nxp < 4096:
        return None if t1 is None else ("1d",) + t1
    t2 = _tile2d(ny, nxp, k, block_rows)
    if t2 is None:
        return None if t1 is None else ("1d",) + t1
    if t1 is not None:
        cost1 = (t1[0] + 2 * t1[1]) / t1[0]
        cost2 = ((t2[0] + 2 * t2[1]) * (t2[2] + 2 * COL_HALO)
                 / (t2[0] * t2[2]))
        if cost1 <= cost2:
            return ("1d",) + t1
    return ("2d",) + t2


def _kernel2d(pp_hbm, rhs_hbm, out_ref, err_ref, pp_win, rhs_win, sem,
              *, ny, nx, nxp, bs, bsx, halo, k, dx2, dy2, omega,
              cavity):
    """2-D (row x column) tile variant of _kernel for wide grids where
    no full-width row block fits VMEM. Same numerics; the column
    windows carry a fixed 128-lane halo (>= 2k, so the two validity
    rings each iteration consumes never reach the owned tile)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = bs + 2 * halo
    cw = bsx + 2 * COL_HALO
    row0 = i * bs
    col0 = j * bsx
    start = pl.multiple_of(
        jnp.clip(((row0 - 2 * k) // 8) * 8, 0, ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)
    cstart = pl.multiple_of(jnp.clip(col0 - COL_HALO, 0, nxp - cw), 128)
    out_cl = pl.multiple_of(col0 - cstart, 128)

    cp1 = pltpu.make_async_copy(
        pp_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], pp_win, sem.at[0])
    cp2 = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], rhs_win, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    gr = start + lax.broadcasted_iota(jnp.int32, (w, cw), 0)
    gc = cstart + lax.broadcasted_iota(jnp.int32, (w, cw), 1)
    interior = ((gr >= 1) & (gr <= ny - 2) & (gc >= 1) & (gc <= nx - 2))
    owned = (interior & (gr >= row0) & (gr < row0 + bs)
             & (gc >= col0) & (gc < col0 + bsx))
    red = interior & (((gr + gc) % 2) == 0)
    black = interior & (((gr + gc) % 2) == 1)
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / (dx2 * denom))
    by = jnp.float32(1.0 / (dy2 * denom))
    br = jnp.float32(1.0 / denom)
    om = jnp.float32(omega)
    rhs = br * rhs_win[:]

    def half(pp, mask, fold_rows=True, fold_cols=True):
        E = pltpu.roll(pp, cw - 1, 1)
        W = pltpu.roll(pp, 1, 1)
        N = pltpu.roll(pp, w - 1, 0)
        S = pltpu.roll(pp, 1, 0)
        if fold_rows:
            S = jnp.where(adj_bot, pp, S)
            N = jnp.where(adj_top, pp, N)
        if fold_cols:
            W = jnp.where(adj_left, pp, W)
            E = (jnp.where(adj_right, pp, E) if cavity
                 else jnp.where(adj_right, 0.0, E))
        update = bx * (E + W) + by * (N + S) - rhs
        new = (1.0 - om) * pp + om * update
        return jnp.where(mask, new, pp)

    def iterate(want_err, fold_rows=True, fold_cols=True):
        old = pp_win[:]
        pp = half(old, red, fold_rows, fold_cols)
        pp = half(pp, black, fold_rows, fold_cols)
        err = (jnp.max(jnp.where(owned, jnp.abs(pp - old), 0.0))
               if want_err else jnp.float32(0.0))
        pp_win[:] = pp
        return err

    # Interior-window specialization, COARSER than the Jacobi 2-D
    # kernel's 2x2 variants: only fully-interior windows (the vast
    # majority at the widths this kernel serves) drop the fold
    # selects. The SOR body keeps more live temporaries than Jacobi's
    # and Mosaic's scoped-vmem accounting STACKS the pl.when regions,
    # so four variants blew the 16M scoped limit in-scan at 8192^2
    # where two fit.
    inner = jnp.logical_and(
        jnp.logical_and(start >= 2, start + w <= ny - 2),
        jnp.logical_and(cstart >= 2, cstart + cw <= nx - 2))

    @pl.when(inner)
    def _():
        lax.fori_loop(
            0, k - 1,
            lambda _, c: (iterate(False, fold_rows=False,
                                  fold_cols=False), c)[1], 0)

    @pl.when(jnp.logical_not(inner))
    def _():
        lax.fori_loop(0, k - 1, lambda _, c: (iterate(False), c)[1], 0)

    err = iterate(True)
    # BCs once per launch (ops.poisson._apply_pprime_bcs[_cavity]).
    pp = pp_win[:]
    pp = jnp.where(is_bot, pltpu.roll(pp, w - 1, 0), pp)
    pp = jnp.where(is_top, pltpu.roll(pp, 1, 0), pp)
    pp = jnp.where(is_left, pltpu.roll(pp, cw - 1, 1), pp)
    if cavity:
        pp = jnp.where(is_right, pltpu.roll(pp, 1, 1), pp)
        pp = jnp.where(is_bot & is_left, 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    pp_win[:] = pp
    out_cp = pltpu.make_async_copy(
        pp_win.at[pl.ds(out_lo, bs), pl.ds(out_cl, bsx)], out_ref,
        sem.at[0])
    out_cp.start()
    out_cp.wait()
    # (nrb, ncb)-shaped err -- SMEM windows pad each ROW to 512 B, so
    # the 1-D kernels' (nblocks, 1) layout costs 512 B/scalar and blows
    # the 1 MB SMEM cap at the block counts these tiles reach (16384^2:
    # 2048+); one row per row-block keeps it at nrb * 512 B.
    err_ref[i, j] = err


def sor_fused_k(pp, rhs, dx, dy, omega, k, block_rows=256,
                interpret=False, cavity=False, tiling="auto"):
    """K fused red/black SOR iterations. Returns (p', last max err)."""
    ny, nx = pp.shape
    if ny % 8 != 0:
        raise ValueError(f"ny={ny} must be a multiple of 8")
    nxp = -(-nx // 128) * 128
    tile = _tiles(ny, nxp, k, block_rows, tiling)
    vmem_limit = None
    if tiling == "auto" and not interpret and nxp >= 4096:
        # Large-window mode (round 3, mirrors jacobi_pallas): the
        # raised scoped limit admits full-width 1-D row blocks where
        # the 14 MB model forced tiny blocks or 2-D tiles. SOR model:
        # (2 + _N_TEMPS) windows + the out block under 96 MB.
        from .jacobi_pallas import _LARGE_SCOPED_BUDGET, _LARGE_VMEM_LIMIT
        halo_l = _halo8(2 * k)
        small_1d = tile is None or tile[0] == "2d" or (
            tile[0] == "1d" and tile[2] > 0 and tile[1] < 128)
        if small_1d:
            for cand in (256, 128, 64):
                # +2 over the 14 MB model's temp count: the measured
                # scoped usage at bs=256/8192 lanes was 105.4 MB where
                # (2+_N_TEMPS) predicted 93 (the two half-sweeps pin
                # more live windows under the raised limit)
                if (ny % cand == 0 and ny >= cand + 2 * halo_l
                        and ((4 + _N_TEMPS) * (cand + 2 * halo_l) + cand)
                        * nxp * 4 <= _LARGE_SCOPED_BUDGET):
                    tile = ("1d", cand, halo_l)
                    vmem_limit = _LARGE_VMEM_LIMIT
                    break
    if tile is None:
        raise ValueError(f"no SOR tiling for ny={ny}, k={k}")
    if nxp != nx:
        pad = ((0, 0), (0, nxp - nx))
        pp = jnp.pad(pp, pad)
        rhs = jnp.pad(rhs, pad)
    if tile[0] == "2d":
        _, bs, halo, bsx = tile
        nrb, ncb = ny // bs, nxp // bsx
        w, cw = bs + 2 * halo, bsx + 2 * COL_HALO
        kern = functools.partial(
            _kernel2d, ny=ny, nx=nx, nxp=nxp, bs=bs, bsx=bsx, halo=halo,
            k=k, dx2=dx * dx, dy2=dy * dy, omega=omega,
            cavity=cavity)
        from .jacobi_pallas import _compiler_params
        out, err = pl.pallas_call(
            kern,
            grid=(nrb, ncb),
            compiler_params=_compiler_params(vmem_limit),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((bs, bsx), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM),
                       # whole-array window revisited by every program,
                       # one row per ROW-block: see _kernel2d err note
                       pl.BlockSpec((nrb, ncb), lambda i, j: (0, 0),
                                    memory_space=pltpu.SMEM)],
            out_shape=[jax.ShapeDtypeStruct((ny, nxp), pp.dtype),
                       jax.ShapeDtypeStruct((nrb, ncb), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((w, cw), pp.dtype),
                pltpu.VMEM((w, cw), rhs.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(pp, rhs)
        if nxp != nx:
            out = out[:, :nx]
        return out, jnp.max(err)
    _, bs, halo = tile
    nblocks = ny // bs
    w = bs + 2 * halo
    kern = functools.partial(
        _kernel, ny=ny, nx=nx, nxp=nxp, bs=bs, halo=halo, k=k,
        dx2=dx * dx, dy2=dy * dy, omega=omega, cavity=cavity)
    from .jacobi_pallas import _compiler_params
    out, err = pl.pallas_call(
        kern,
        grid=(nblocks,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), pp.dtype),
                   jax.ShapeDtypeStruct((nblocks, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((w, nxp), pp.dtype),
            pltpu.VMEM((w, nxp), rhs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pp, rhs)
    if nxp != nx:
        out = out[:, :nx]
    return out, jnp.max(err)


def _kernel_shard(off_ref, pp_hbm, rhs_hbm, out_ref, err_ref,
                  pp_win, rhs_win, sem,
                  *, gny, gnx, nx, nxp, ext_ny, bs, halo, k,
                  own_lo, own_hi, own_clo, own_chi,
                  dx2, dy2, omega, cavity):
    """Like _kernel, but rows (and, on the 2-D rows x cols tier,
    columns) are a window of the *global* array: global row =
    off_ref[0] + local row, global column = off_ref[1] + local column
    (mirror of jacobi_pallas._kernel_shard; the red/black parity mask
    uses GLOBAL (row + col), so color assignment is shard-invariant).
    ``own_lo:own_hi`` / ``own_clo:own_chi`` are the local rows/columns
    the shard owns; exchanged halos go stale two rings per iteration
    and are discarded by the caller."""
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    # 2k halo rows below row0 (two rings of validity per iteration).
    start = pl.multiple_of(
        jnp.clip(((row0 - 2 * k) // 8) * 8, 0, ext_ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(pp_hbm.at[pl.ds(start, w), :], pp_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # 1-D masks (lean form, see jacobi_pallas._kernel_shard); only the
    # red/black parity needs a true 2-D combine, built once.
    lr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)  # local row
    gr = off_ref[0] + lr                                     # global row
    lc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    gc = off_ref[1] + lc                                     # global col
    interior_r = ((gr >= 1) & (gr <= gny - 2))
    interior_c = ((gc >= 1) & (gc <= gnx - 2))
    owned_r = (interior_r & (lr >= row0) & (lr < row0 + bs)
               & (lr >= own_lo) & (lr < own_hi))
    owned_c = (interior_c & (lc >= own_clo) & (lc < own_chi))
    interior = interior_r & interior_c
    par = (gr + gc) % 2
    red = interior & (par == 0)
    black = interior & (par == 1)
    is_bot = gr == 0
    is_top = gr == gny - 1
    is_left = gc == 0
    is_right = gc == gnx - 1
    adj_bot = gr == 1
    adj_top = gr == gny - 2
    adj_left = gc == 1
    adj_right = gc == gnx - 2
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / (dx2 * denom))
    by = jnp.float32(1.0 / (dy2 * denom))
    br = jnp.float32(1.0 / denom)
    om = jnp.float32(omega)
    rhs = br * rhs_win[:]

    def half(pp, mask, fold_rows=True):
        E = pltpu.roll(pp, nxp - 1, 1)
        W = pltpu.roll(pp, 1, 1)
        N = pltpu.roll(pp, w - 1, 0)
        S = pltpu.roll(pp, 1, 0)
        if fold_rows:
            S = jnp.where(adj_bot, pp, S)
            N = jnp.where(adj_top, pp, N)
        W = jnp.where(adj_left, pp, W)
        E = (jnp.where(adj_right, pp, E) if cavity
             else jnp.where(adj_right, 0.0, E))
        update = bx * (E + W) + by * (N + S) - rhs
        new = (1.0 - om) * pp + om * update
        return jnp.where(mask, new, pp)

    def iterate(want_err, fold_rows=True):
        old = pp_win[:]
        pp = half(old, red, fold_rows)
        pp = half(pp, black, fold_rows)
        err = (jnp.max(jnp.where(owned_r & owned_c,
                                 jnp.abs(pp - old), 0.0))
               if want_err else jnp.float32(0.0))
        pp_win[:] = pp
        return err

    # Row-interior specialization on *global* rows (see _kernel).
    g0 = off_ref[0] + start
    inner_rows = jnp.logical_and(g0 >= 2, g0 + w <= gny - 2)

    @pl.when(inner_rows)
    def _():
        lax.fori_loop(0, k - 1,
                      lambda _, c: (iterate(False, fold_rows=False), c)[1], 0)

    @pl.when(jnp.logical_not(inner_rows))
    def _():
        lax.fori_loop(0, k - 1, lambda _, c: (iterate(False), c)[1], 0)

    err = iterate(True)
    # BCs once per launch, on global boundary rows/columns only.
    pp = pp_win[:]
    pp = jnp.where(is_bot, pltpu.roll(pp, w - 1, 0), pp)
    pp = jnp.where(is_top, pltpu.roll(pp, 1, 0), pp)
    pp = jnp.where(is_left, pltpu.roll(pp, nxp - 1, 1), pp)
    if cavity:
        pp = jnp.where(is_right, pltpu.roll(pp, 1, 1), pp)
        pp = jnp.where(is_bot & is_left, 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    pp_win[:] = pp
    out_cp = pltpu.make_async_copy(pp_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()
    err_ref[i, 0] = err


def sor_fused_k_shard(pp_ext, rhs_ext, row_offset, gny: int,
                      dx: float, dy: float, omega: float, k: int,
                      own_lo: int, own_hi: int, block_rows: int = 256,
                      interpret: bool = False, cavity: bool = False,
                      col_offset=None, gnx: int = None, own_cols=None):
    """K fused red/black iterations on a halo-extended (ext_ny, nx)
    local block whose row 0 is global row ``row_offset`` (traced
    scalar). Returns (updated ext block, max |delta| over owned rows).
    The halo must span 2K rows (two rings per iteration).

    ``col_offset``/``gnx``/``own_cols`` (2-D rows x cols tier): the
    block is additionally a column block whose column 0 is global
    column ``col_offset`` of a ``gnx``-wide array."""
    ext_ny, nx = pp_ext.shape
    if gnx is None:
        gnx = nx
    if col_offset is None:
        col_offset = 0
    own_clo, own_chi = own_cols if own_cols is not None else (0, nx)
    if ext_ny % 8 != 0:
        raise ValueError(f"ext_ny={ext_ny} must be a multiple of 8")
    nxp = -(-nx // 128) * 128
    # Same calibrated VMEM model as the single-chip path (_tile): the
    # two color half-sweeps keep ~_N_TEMPS window-sized temporaries
    # alive, so the Jacobi 2-window model under-budgets this kernel.
    tile = _tile(ext_ny, nxp, k, block_rows)
    if tile is None:
        raise ValueError(f"no SOR tile for ext_ny={ext_ny}, k={k}")
    bs, halo = tile
    nblocks = ext_ny // bs
    w = bs + 2 * halo
    if nxp != nx:
        pad = ((0, 0), (0, nxp - nx))
        pp_ext = jnp.pad(pp_ext, pad)
        rhs_ext = jnp.pad(rhs_ext, pad)
    kern = functools.partial(
        _kernel_shard, gny=gny, gnx=gnx, nx=nx, nxp=nxp, ext_ny=ext_ny,
        bs=bs, halo=halo, k=k, own_lo=own_lo, own_hi=own_hi,
        own_clo=own_clo, own_chi=own_chi,
        dx2=dx * dx, dy2=dy * dy, omega=omega, cavity=cavity)
    out, err = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ext_ny, nxp), pp_ext.dtype),
                   jax.ShapeDtypeStruct((nblocks, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((w, nxp), pp_ext.dtype),
            pltpu.VMEM((w, nxp), rhs_ext.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.stack([jnp.asarray(row_offset, jnp.int32),
                 jnp.asarray(col_offset, jnp.int32)]), pp_ext, rhs_ext)
    if nxp != nx:
        out = out[:, :nx]
    return out, jnp.max(err)


def sor_pallas_ok(ny: int, nx: int, k: int, block_rows: int = 256) -> bool:
    if ny % 8 != 0:
        return False
    nxp = -(-nx // 128) * 128
    return _tiles(ny, nxp, k, block_rows) is not None


def sor_pallas(pp0, rhs, dx, dy, omega, tol, iters, k=5,
               block_rows=256, early_exit=True, interpret=False,
               cavity=False):
    """Drop-in replacement for ops.poisson.sor on the throughput path:
    iters//k fused launches (+ remainder), convergence checked between
    launches like jacobi_pallas. Returns (p', last err, iterations)."""
    n_full = iters // k
    rem = iters % k
    step = functools.partial(sor_fused_k, rhs=rhs, dx=dx, dy=dy,
                             omega=omega, k=k, block_rows=block_rows,
                             interpret=interpret, cavity=cavity)

    if early_exit and tol > 0.0 and n_full > 0:
        def cond(carry):
            _, err, it = carry
            return jnp.logical_and(it < n_full, err >= tol)

        def body(carry):
            pp, _, it = carry
            pp, err = step(pp)
            return pp, err, it + 1

        pp, err, it = lax.while_loop(
            cond, body,
            (pp0, jnp.asarray(jnp.inf, jnp.float32),
             jnp.asarray(0, jnp.int32)))
        n_run = it * k
    elif n_full > 0:
        def body(carry, _):
            pp, _ = carry
            pp, err = step(pp)
            return (pp, err), None

        (pp, err), _ = lax.scan(
            body, (pp0, jnp.asarray(jnp.inf, jnp.float32)),
            None, length=n_full)
        n_run = jnp.asarray(n_full * k, jnp.int32)
    else:
        pp, err = pp0, jnp.asarray(jnp.inf, jnp.float32)
        n_run = jnp.asarray(0, jnp.int32)

    if rem:
        pp, err = sor_fused_k(pp, rhs, dx, dy, omega, rem,
                              block_rows=block_rows, interpret=interpret,
                              cavity=cavity)
        n_run = n_run + rem
    return pp, err, n_run


# ---------------------------------------------------------------------------
# Color-compressed red/black kernel (round 4, VERDICT r3 item 4).
#
# The uncompressed kernel pays 8 full-width rolls per iteration (4 per
# color half-sweep) although each half only UPDATES half the cells and
# only READS the other color. Storing the two colors as separate
# half-width arrays -- PR[j, t] = p[j, 2t + (j&1)] (red, (r+c) even),
# PB[j, t] = p[j, 2t + 1 - (j&1)] -- turns every neighbor access into
# the OTHER color's array at lane offset {-1, 0, +1} selected by row
# parity: 2 half-width lane rolls + 2 half-width sublane rolls per
# half-sweep, i.e. HALF the roll volume and half the fma width of the
# uncompressed form. Compression/decompression are two XLA passes each,
# paid once per launch chain (strided lane slices are XLA-legal; Mosaic
# cannot lower them, which is why the compression lives outside).
# ---------------------------------------------------------------------------


def _kernel_rb2(pr_hbm, pb_hbm, rr_hbm, rb_hbm, pr_out, pb_out, err_ref,
                pr_win, pb_win, rr_win, rb_win, sem,
                *, ny, nx, nxc, nxcp, bs, halo, k, dx2, dy2, omega,
                cavity):
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    # two validity rings per iteration, like the uncompressed kernel
    start = pl.multiple_of(
        jnp.clip(((row0 - 2 * k) // 8) * 8, 0, ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cps = [pltpu.make_async_copy(h.at[pl.ds(start, w), :], wdw, sem.at[j])
           for j, (h, wdw) in enumerate(
               ((pr_hbm, pr_win), (pb_hbm, pb_win),
                (rr_hbm, rr_win), (rb_hbm, rb_win)))]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    gr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    gt = lax.broadcasted_iota(jnp.int32, (1, nxcp), 1)
    rodd = gr % 2 == 1
    interior_r = (gr >= 1) & (gr <= ny - 2)
    owned_r = interior_r & (gr >= row0) & (gr < row0 + bs)
    # red global col = 2t + (j&1); black = 2t + 1 - (j&1). Interior
    # column windows per color follow from 1 <= col <= nx - 2 (nx
    # even): red odd rows t <= nxc-2, even rows t >= 1; black mirrored.
    reven = jnp.logical_not(rodd)
    red_c = (rodd & (gt <= nxc - 2)) | (reven & (gt >= 1))
    black_c = (rodd & (gt >= 1)) | (reven & (gt <= nxc - 2))
    in_c = gt <= nxc - 1
    adj_bot = gr == 1
    adj_top = gr == ny - 2
    is_bot = gr == 0
    is_top = gr == ny - 1
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / (dx2 * denom))
    by = jnp.float32(1.0 / (dy2 * denom))
    br = jnp.float32(1.0 / denom)
    om = jnp.float32(omega)
    rr_win[:] = br * rr_win[:]
    rb_win[:] = br * rb_win[:]

    def west(a):
        return pltpu.roll(a, 1, 1)

    def east(a):
        return pltpu.roll(a, nxcp - 1, 1)

    def north(a):
        return pltpu.roll(a, w - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def half(upd, oth, rhs_s, own_mask, w_fold_odd, e_fold_even,
             fold_rows):
        """One color half-sweep: ``upd`` is the color being updated
        (reads itself only through the boundary folds), ``oth`` the
        other color's current window. w_fold_odd: the global-col-1
        fold lands on (odd row, t=0) for red and (even row, t=0) for
        black; e_fold_even mirrors for global col nx-2."""
        W = jnp.where(rodd, oth if w_fold_odd else west(oth),
                      west(oth) if w_fold_odd else oth)
        E = jnp.where(rodd, east(oth) if w_fold_odd else oth,
                      oth if w_fold_odd else east(oth))
        N = north(oth)
        S = south(oth)
        if fold_rows:
            S = jnp.where(adj_bot, upd, S)
            N = jnp.where(adj_top, upd, N)
        wf = rodd if w_fold_odd else jnp.logical_not(rodd)
        W = jnp.where(wf & (gt == 0), upd, W)
        ef = jnp.logical_not(rodd) if e_fold_even else rodd
        E = (jnp.where(ef & (gt == nxc - 1), upd, E) if cavity
             else jnp.where(ef & (gt == nxc - 1), 0.0, E))
        update = bx * (E + W) + by * (N + S) - rhs_s
        new = (1.0 - om) * upd + om * update
        return jnp.where(interior_r & own_mask, new, upd)

    def iterate(want_err, fold_rows=True):
        pr_old = pr_win[:]
        pb_old = pb_win[:]
        # red reads black: W at PB[t-1] on EVEN rows (w_fold odd-row
        # t=0); E at PB[t+1] on ODD rows; outlet-adjacent red is the
        # (even row, t=nxc-1) cell.
        pr = half(pr_old, pb_old, rr_win[:], red_c,
                  w_fold_odd=True, e_fold_even=True, fold_rows=fold_rows)
        pr_win[:] = pr
        # black reads UPDATED red: W at PR[t-1] on ODD rows; E at
        # PR[t+1] on EVEN rows; outlet-adjacent black is (odd, nxc-1).
        pb = half(pb_old, pr, rb_win[:], black_c,
                  w_fold_odd=False, e_fold_even=False,
                  fold_rows=fold_rows)
        pb_win[:] = pb
        if not want_err:
            return jnp.float32(0.0)
        d = jnp.maximum(
            jnp.max(jnp.where(owned_r & in_c, jnp.abs(pr - pr_old), 0.0)),
            jnp.max(jnp.where(owned_r & in_c, jnp.abs(pb - pb_old), 0.0)))
        return d

    inner_rows = jnp.logical_and(start >= 2, start + w <= ny - 2)

    @pl.when(inner_rows)
    def _():
        lax.fori_loop(0, k - 1,
                      lambda _, c: (iterate(False, fold_rows=False), c)[1],
                      0)

    @pl.when(jnp.logical_not(inner_rows))
    def _():
        lax.fori_loop(0, k - 1, lambda _, c: (iterate(False), c)[1], 0)

    err = iterate(True)
    # BCs once per launch in compressed coordinates (rows, then col 0,
    # then the outlet/east treatment, then the cavity gauge pin --
    # exactly _apply_pprime_bcs[_cavity]'s write order). Row writes
    # swap colors (rows 0/1 have opposite parity at equal t).
    pr = pr_win[:]
    pb = pb_win[:]
    prn = jnp.where(is_bot, north(pb), pr)
    pbn = jnp.where(is_bot, north(pr), pb)
    prn = jnp.where(is_top, south(pb), prn)
    pbn = jnp.where(is_top, south(pr), pbn)
    # col 0 <- col 1: even rows write PR[.,0] from PB[.,0]; odd rows
    # write PB[.,0] from PR[.,0] (both sources are global col 1).
    pr2 = jnp.where(jnp.logical_not(rodd) & (gt == 0), pbn, prn)
    pb2 = jnp.where(rodd & (gt == 0), prn, pbn)
    if cavity:
        # col nx-1 <- col nx-2 (same lane t=nxc-1, opposite color).
        pb3 = jnp.where(jnp.logical_not(rodd) & (gt == nxc - 1), pr2, pb2)
        pr3 = jnp.where(rodd & (gt == nxc - 1), pb2, pr2)
        pr3 = jnp.where(is_bot & (gt == 0), 0.0, pr3)  # gauge pin (0,0)
    else:
        pb3 = jnp.where(jnp.logical_not(rodd) & (gt == nxc - 1), 0.0, pb2)
        pr3 = jnp.where(rodd & (gt == nxc - 1), 0.0, pr2)
    pr_win[:] = pr3
    pb_win[:] = pb3
    cp1 = pltpu.make_async_copy(pr_win.at[pl.ds(out_lo, bs), :], pr_out,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(pb_win.at[pl.ds(out_lo, bs), :], pb_out,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    err_ref[i, 0] = err


def sor_compress(x):
    """(ny, nx even) -> (red, black) half-width arrays:
    red[j, t] = x[j, 2t + (j&1)], black[j, t] = x[j, 2t + 1 - (j&1)].
    XLA-side (strided lane slices are not Mosaic-lowerable).

    Round 5 NOTE: the pair-reshape minor-index form (docs/PERF.md
    item 29) is 5x faster as an ISOLATED extraction but was tried
    here and REGRESSED the 16384^2 SOR step 1.06e9 -> 0.47e9: in
    this context XLA fuses the strided gathers into the two
    where-selects, while the reshape materializes a relayout of the
    full array. Context decides -- measure before switching forms."""
    ny, nx = x.shape
    a, b = x[:, 0::2], x[:, 1::2]
    rodd = lax.broadcasted_iota(jnp.int32, (ny, 1), 0) % 2 == 1
    return jnp.where(rodd, b, a), jnp.where(rodd, a, b)


def sor_decompress(xr, xb):
    """Inverse of sor_compress."""
    ny, nxc = xr.shape
    rodd = lax.broadcasted_iota(jnp.int32, (ny, 1), 0) % 2 == 1
    even_c = jnp.where(rodd, xb, xr)
    odd_c = jnp.where(rodd, xr, xb)
    return jnp.stack([even_c, odd_c], axis=2).reshape(ny, 2 * nxc)


def _tile_rb2(ny: int, nxcp: int, k: int, interpret: bool):
    """(bs, halo, vmem_limit) for the compressed kernel's full-width
    1-D row blocks, or None. Scoped model: 4 half-width windows + ~6
    half-width half-sweep temporaries + 2 out blocks."""
    halo = _halo8(2 * k)

    def scoped(bs, h=None):
        h = halo if h is None else h
        return (10 * (bs + 2 * h) + 2 * bs) * nxcp * 4

    if ny % 8 == 0 and scoped(ny, 0) <= _LIMIT:
        # whole-array window: edges are domain edges, no halo needed
        return ny, 0, None
    for bs in (256, 128, 64, 32, 16, 8):
        if ny % bs == 0 and ny >= bs + 2 * halo:
            if scoped(bs) <= _LIMIT:
                return bs, halo, None
            if not interpret and nxcp >= 2048:
                from .jacobi_pallas import (_LARGE_SCOPED_BUDGET,
                                            _LARGE_VMEM_LIMIT)
                if scoped(bs) <= _LARGE_SCOPED_BUDGET:
                    return bs, halo, _LARGE_VMEM_LIMIT
    return None


def sor_rb2_ok(ny: int, nx: int, k: int, interpret: bool = False) -> bool:
    return (ny % 8 == 0 and nx % 2 == 0
            and _tile_rb2(ny, -(-(nx // 2) // 128) * 128, k,
                          interpret) is not None)


def sor_fused_k_rb2(pr, pb, rr, rb, nx, dx, dy, omega, k,
                    interpret=False, cavity=False):
    """K fused red/black iterations on color-compressed arrays.
    Returns (pr', pb', last max err)."""
    ny, nxc = pr.shape
    nxcp = -(-nxc // 128) * 128
    tile = _tile_rb2(ny, nxcp, k, interpret)
    if tile is None:
        raise ValueError(f"no rb2 tiling for ny={ny}, k={k}")
    bs, halo, vmem_limit = tile
    if nxcp != nxc:
        pad = ((0, 0), (0, nxcp - nxc))
        pr, pb = jnp.pad(pr, pad), jnp.pad(pb, pad)
        rr, rb = jnp.pad(rr, pad), jnp.pad(rb, pad)
    nblocks = ny // bs
    w = bs + 2 * halo
    kern = functools.partial(
        _kernel_rb2, ny=ny, nx=nx, nxc=nxc, nxcp=nxcp, bs=bs, halo=halo,
        k=k, dx2=dx * dx, dy2=dy * dy, omega=omega, cavity=cavity)
    from .jacobi_pallas import _compiler_params
    field = pl.BlockSpec((bs, nxcp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((ny, nxcp), pr.dtype)
    pr2, pb2, err = pl.pallas_call(
        kern,
        grid=(nblocks,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[field, field,
                   pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[fshape, fshape,
                   jax.ShapeDtypeStruct((nblocks, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((w, nxcp), pr.dtype)] * 4 + [
            pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(pr, pb, rr, rb)
    if nxcp != nxc:
        pr2, pb2 = pr2[:, :nxc], pb2[:, :nxc]
    return pr2, pb2, jnp.max(err)


def sor_pallas_rb2(pp0, rhs, dx, dy, omega, tol, iters, k=5,
                   early_exit=True, interpret=False, cavity=False):
    """ops.poisson.sor through the color-compressed launch chain:
    compress once, iters//k fused launches (+ remainder) with the
    K-granularity convergence check, decompress once. Returns
    (p', last err, iterations).

    Round 5 (VERDICT r4 item 2): on the FIXED schedule (no tolerance
    exit) a remainder launch costs one extra full pass of window
    traffic for just ``iters % k`` iterations -- at 16384^2 the
    50 = 4*12 + 2 split measured 202.7 ms/solve vs 187.2 for
    [12,12,12,14] (tools/probe_r5.py; fields bit-identical: the same
    50 iterations, only the launch partition changes). So the
    remainder folds into the LAST launch (k_last = k + rem) whenever
    a tiling exists for it; the adaptive early-exit path keeps the
    uniform-k while_loop + remainder (its convergence-check
    granularity is part of the contract, solver/piso.py)."""
    ny, nx = pp0.shape
    pr, pb = sor_compress(pp0)
    rr, rb = sor_compress(rhs)
    n_full = iters // k
    rem = iters % k
    adaptive = early_exit and tol > 0.0 and n_full > 0
    if (not adaptive and rem and n_full
            and sor_rb2_ok(ny, nx, k + rem, interpret)):
        n_full -= 1
        k_last, rem = k + rem, 0
    else:
        k_last = 0
    step = functools.partial(sor_fused_k_rb2, rr=rr, rb=rb, nx=nx,
                             dx=dx, dy=dy, omega=omega, k=k,
                             interpret=interpret, cavity=cavity)

    if adaptive:
        def cond(carry):
            _, _, err, it = carry
            return jnp.logical_and(it < n_full, err >= tol)

        def body(carry):
            pr, pb, _, it = carry
            pr, pb, err = step(pr, pb)
            return pr, pb, err, it + 1

        pr, pb, err, it = lax.while_loop(
            cond, body,
            (pr, pb, jnp.asarray(jnp.inf, jnp.float32),
             jnp.asarray(0, jnp.int32)))
        n_run = it * k
    elif n_full > 0:
        def body(carry, _):
            pr, pb, _ = carry
            pr, pb, err = step(pr, pb)
            return (pr, pb, err), None

        (pr, pb, err), _ = lax.scan(
            body, (pr, pb, jnp.asarray(jnp.inf, jnp.float32)),
            None, length=n_full)
        n_run = jnp.asarray(n_full * k, jnp.int32)
    else:
        err = jnp.asarray(jnp.inf, jnp.float32)
        n_run = jnp.asarray(0, jnp.int32)

    if k_last:
        pr, pb, err = sor_fused_k_rb2(pr, pb, rr, rb, nx, dx, dy,
                                      omega, k_last, interpret=interpret,
                                      cavity=cavity)
        n_run = n_run + k_last
    elif rem:
        pr, pb, err = sor_fused_k_rb2(pr, pb, rr, rb, nx, dx, dy,
                                      omega, rem, interpret=interpret,
                                      cavity=cavity)
        n_run = n_run + rem
    return sor_decompress(pr, pb), err, n_run
