"""Pallas TPU multigrid: V-cycle with lane-interleaved coarse levels.

The JS twin's multigrid kit (index.html:1344-1470; XLA form in
ops.poisson._mg_*) spends most of its time OUTSIDE the smoothers at
scale: the restriction/prolongation transfers are stride-2 resamplings,
which XLA lowers to gather-flavored ops, and every level pays separate
residual/restrict/prolong passes over HBM.

Mosaic cannot lower strided *lane* accesses at all (``x[:, ::2]``
rejects), so a TPU-native multigrid needs a representation trick rather
than a faithful resampling kernel. Two observations make every
transfer expressible with plain rolls/selects/concats:

* **Rows compact for free.** A row-major (ny, nxp) array IS a
  (ny//2, 2*nxp) array: fine row pair (2r, 2r+1) = lanes [0:nxp) /
  [nxp:2*nxp) of packed row r. Reshaping in HBM costs nothing, and the
  kernels read the even/odd planes as static lane slices.
* **Lanes never need to move.** Coarse level d keeps the full nxp lane
  width and stores its points *in place* at lane stride 2^d: coarse
  point c lives at lane c * 2^d. Restriction writes through a
  ``lane % 2s == 0`` mask; prolongation is rolls by s; the smoother
  masks its interior to valid lanes. Junk lanes are never read (every
  stencil roll lands valid-to-valid), at the cost of sweeping 2x the
  cells per level -- a VPU-cycle trade that beats any shuffle.

Level arrays therefore shrink by 2x per level (rows halve, lanes stay),
so a full V-cycle sweeps ~2x the fine level's cells, vs ~1.33x for
compact storage. All three kernels are single-pass row-block windows
(manual DMA, like kernels.jacobi_pallas):

  * ``_kernel_smooth``   -- k undamped interior Jacobi sweeps at lane
    stride s (the interleaved generalization of _kernel_mg).
  * ``_kernel_restrict`` -- fused residual + full-weighting restriction:
    reads packed (p, rhs) row pairs, computes r = rhs - A p in-window,
    the separable 9-point weighting, and writes the coarse level
    (stride 2s) with zero boundary injection (the restricted field is
    a residual, which is identically 0 on the boundary, so the JS
    kit's boundary injection rows/cols are exact zeros).
  * ``_kernel_prolong``  -- fused bilinear prolongation + correction
    add: reads the coarse level and the packed fine p, emits the
    packed corrected fine level (clamped edge interpolation,
    index.html:1398-1421).

Levels with odd point counts (non-power-of-two grids) or below the
efficiency cutoff hand the remaining sub-V-cycle to the XLA path on
compact arrays (ops.poisson._mg_vcycle); the interleaved<->compact
conversions happen outside the kernels where XLA's strided slices are
legal (the arrays are small by then).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8  # 8-row halos keep every DMA start sublane-aligned

# Mosaic's scoped-VMEM budget shared by every tiling search below
# (monkeypatched small by tests to force the 2-D fall-through path on
# CPU-sized grids).
_VMEM_LIMIT = 14 * 1024 * 1024


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# Smoother: k undamped interior Jacobi sweeps at lane stride s
# (ops.poisson._mg_smooth on the interleaved representation).
# ---------------------------------------------------------------------------

def _kernel_smooth(p_hbm, rhs_hbm, out_ref, p_win, rhs_win, sem,
                   *, nyr, ncx, nxp, s, bs, halo, k, dx2, dy2):
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    start = pl.multiple_of(jnp.clip(((row0 - k) // 8) * 8, 0, nyr - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(p_hbm.at[pl.ds(start, w), :], p_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    gr = start + lax.broadcasted_iota(jnp.int32, (w, nxp), 0)
    gl = lax.broadcasted_iota(jnp.int32, (w, nxp), 1)
    # Valid interior points: rows 1..nyr-2, lanes c*s for c in 1..ncx-2.
    interior = ((gr >= 1) & (gr <= nyr - 2)
                & ((gl & (s - 1)) == 0)
                & (gl >= s) & (gl <= (ncx - 2) * s))
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / (dx2 * denom))
    by = jnp.float32(1.0 / (dy2 * denom))
    br = jnp.float32(1.0 / denom)
    rhs = br * rhs_win[:]

    def body(_, c):
        p = p_win[:]
        update = (bx * (pltpu.roll(p, nxp - s, 1) + pltpu.roll(p, s, 1))
                  + by * (pltpu.roll(p, w - 1, 0) + pltpu.roll(p, 1, 0))
                  - rhs)
        p_win[:] = jnp.where(interior, update, p)
        return c

    lax.fori_loop(0, k, body, 0)
    out_cp = pltpu.make_async_copy(p_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()


def _kernel_smooth2d(p_hbm, rhs_hbm, out_ref, p_win, rhs_win, sem,
                     *, nyr, ncx, nxp, s, bs, bsx, halo, ch, k, dx2,
                     dy2):
    """Column-tiled variant of _kernel_smooth for levels too wide for
    any full-width row block: lane windows carry a ch-lane halo
    (>= k*s, so k sweeps of wrap-garbage never reach the owned tile;
    masks stay global-index-based so every block applies exactly the
    rows/lanes it owns)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = bs + 2 * halo
    cw = bsx + 2 * ch
    row0 = i * bs
    col0 = j * bsx
    start = pl.multiple_of(jnp.clip(((row0 - k) // 8) * 8, 0, nyr - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)
    cstart = pl.multiple_of(jnp.clip(col0 - ch, 0, nxp - cw), 128)
    out_cl = pl.multiple_of(col0 - cstart, 128)

    cp1 = pltpu.make_async_copy(
        p_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], p_win, sem.at[0])
    cp2 = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], rhs_win,
        sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    gr = start + lax.broadcasted_iota(jnp.int32, (w, cw), 0)
    gl = cstart + lax.broadcasted_iota(jnp.int32, (w, cw), 1)
    interior = ((gr >= 1) & (gr <= nyr - 2)
                & ((gl & (s - 1)) == 0)
                & (gl >= s) & (gl <= (ncx - 2) * s))
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / (dx2 * denom))
    by = jnp.float32(1.0 / (dy2 * denom))
    br = jnp.float32(1.0 / denom)
    rhs = br * rhs_win[:]

    def body(_, c):
        p = p_win[:]
        update = (bx * (pltpu.roll(p, cw - s, 1) + pltpu.roll(p, s, 1))
                  + by * (pltpu.roll(p, w - 1, 0) + pltpu.roll(p, 1, 0))
                  - rhs)
        p_win[:] = jnp.where(interior, update, p)
        return c

    lax.fori_loop(0, k, body, 0)
    out_cp = pltpu.make_async_copy(
        p_win.at[pl.ds(out_lo, bs), pl.ds(out_cl, bsx)], out_ref,
        sem.at[0])
    out_cp.start()
    out_cp.wait()


def mg_smooth_int(p, rhs, dx, dy, s, ncx, iterations, block_rows=256,
                  interpret=False, tiling="auto"):
    """k interior sweeps on an interleaved (nyr, nxp) level.

    ``tiling``: "auto" uses full-width row blocks when any fit VMEM and
    falls through to 2-D column tiles (wide levels); "1d"/"2d" force a
    path (tests, A/B)."""
    nyr, nxp = p.shape
    if tiling == "1d":
        tiles = ("1d",) + _tile(nyr, nxp, iterations, block_rows, 6)
    elif tiling == "2d":
        tiles = ("2d",) + _tile2d(nyr, nxp, iterations, iterations * s,
                                  8, block_rows)
    else:
        tiles = _smooth_tiles(nyr, nxp, iterations, s, block_rows)
    if tiles[0] == "2d":
        _, bs, halo, bsx, ch = tiles
        w = bs + 2 * halo
        cw = bsx + 2 * ch
        kern = functools.partial(_kernel_smooth2d, nyr=nyr, ncx=ncx,
                                 nxp=nxp, s=s, bs=bs, bsx=bsx, halo=halo,
                                 ch=ch, k=iterations, dx2=dx * dx,
                                 dy2=dy * dy)
        return pl.pallas_call(
            kern,
            grid=(nyr // bs, nxp // bsx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((bs, bsx), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nyr, nxp), p.dtype),
            scratch_shapes=[
                pltpu.VMEM((w, cw), p.dtype),
                pltpu.VMEM((w, cw), rhs.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(p, rhs)
    _, bs, halo = tiles
    w = bs + 2 * halo
    kern = functools.partial(_kernel_smooth, nyr=nyr, ncx=ncx, nxp=nxp,
                             s=s, bs=bs, halo=halo, k=iterations,
                             dx2=dx * dx, dy2=dy * dy)
    return pl.pallas_call(
        kern,
        grid=(nyr // bs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nyr, nxp), p.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, nxp), p.dtype),
            pltpu.VMEM((w, nxp), rhs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p, rhs)


def _tile(nyr: int, width: int, k: int, block_rows: int, n_temps: int):
    limit = _VMEM_LIMIT

    def fits(bs, halo):
        w = bs + 2 * halo
        return ((2 + n_temps) * w + bs) * width * 4 <= limit

    if nyr % 8 == 0 and fits(nyr, 0):
        return nyr, 0
    halo = _round_up(max(k, _HALO), 8)
    bs = block_rows
    while bs >= 8:
        if nyr % bs == 0 and nyr >= bs + 2 * halo and fits(bs, halo):
            return bs, halo
        bs //= 2
    raise ValueError(f"no mg tiling for nyr={nyr}, k={k}")


def _tile2d(nyp: int, width: int, k_rows: int, reach_lanes: int,
            n_bufs: int, block_rows: int):
    """2-D (row x column) tiling for levels too wide for any full-width
    row block (>= 8192 lanes; the packed transfer windows are 2x lane
    width): column windows carry a lane halo covering the kernel's
    full lane reach, rounded to the 128-lane DMA alignment. Returns
    (bs, halo, bsx, ch); picks the feasible tile with the least
    window-read redundancy. Raises ValueError when none exists."""
    halo = _round_up(max(k_rows, _HALO), 8)
    ch = _round_up(max(reach_lanes, 128), 128)

    def fits(bs, bsx):
        return ((n_bufs * (bs + 2 * halo) * (bsx + 2 * ch)
                 + bs * bsx) * 4 <= _VMEM_LIMIT)

    # Column tiles must be 128-aligned divisors of the (128-aligned)
    # width -- which need not be a power of two (e.g. nxp = 8064 =
    # 128 * 63), so enumerate divisors rather than halving.
    nlanes = width // 128
    cands = [d * 128 for d in range(nlanes // 2, 0, -1)
             if nlanes % d == 0]
    best = None
    bs = block_rows
    while bs >= 8:
        if nyp % bs == 0 and nyp >= bs + 2 * halo:
            for bsx in cands:
                if width >= bsx + 2 * ch and fits(bs, bsx):
                    # window area per owned cell
                    cost = ((bs + 2 * halo) * (bsx + 2 * ch)) / (bs * bsx)
                    if best is None or cost < best[0]:
                        best = (cost, bs, halo, bsx, ch)
                    break  # larger bsx always beats smaller at this bs
        bs //= 2
    if best is None:
        raise ValueError(
            f"no 2-D mg tiling for nyp={nyp}, width={width}, "
            f"reach={reach_lanes}")
    return best[1:]


# Per-kernel tiling resolution: 1-D full-width row blocks vs 2-D
# column tiles by least window-read redundancy (window cells DMA'd per
# owned cell): a wide grid that only affords tiny full-width row
# blocks pays more in halo re-reads than a 2-D column tile does.
# Shared by the wrappers and the _level_ok gate so they never disagree.

def _resolve_tiles(one_d, two_d):
    t1 = None
    try:
        t1 = one_d()
    except ValueError:
        pass
    if t1 is not None and t1[1] == 0:
        return ("1d",) + t1  # whole level in one window: optimal
    try:
        t2 = two_d()
    except ValueError:
        if t1 is not None:
            return ("1d",) + t1
        raise
    if t1 is not None:
        cost1 = (t1[0] + 2 * t1[1]) / t1[0]
        cost2 = ((t2[0] + 2 * t2[1]) * (t2[2] + 2 * t2[3])
                 / (t2[0] * t2[2]))
        if cost1 <= cost2:
            return ("1d",) + t1
    return ("2d",) + t2


def _smooth_tiles(nyr, nxp, k, s, block_rows):
    return _resolve_tiles(
        lambda: _tile(nyr, nxp, k, block_rows, n_temps=6),
        lambda: _tile2d(nyr, nxp, k, k * s, 8, block_rows))


def _restrict_tiles(nyp, nxp, s, block_rows):
    # Packed-row reach: residual reads +-1 packed row, the row
    # weighting one more below -> 2; lane reach: residual s + rx s.
    return _resolve_tiles(
        lambda: _tile(nyp, 2 * nxp, 1, block_rows, n_temps=8),
        lambda: _tile2d(nyp, nxp, 2, 2 * s, 12, block_rows))


def _prolong_tiles(nyc, nxp, s, block_rows):
    return _resolve_tiles(
        lambda: _tile(nyc, 2 * nxp, 1, block_rows, n_temps=8),
        lambda: _tile2d(nyc, nxp, 1, s, 10, block_rows))


# ---------------------------------------------------------------------------
# Fused residual + restriction.
# ---------------------------------------------------------------------------

def _kernel_restrict(p_hbm, rhs_hbm, out_ref, p_win, rhs_win, sem,
                     *, nyr, ncx, nxp, s, bs, halo, dx2, dy2):
    """Inputs are PACKED row pairs of the fine level: (nyr//2, 2*nxp),
    lanes [0:nxp) = even fine rows, [nxp:2*nxp) = odd fine rows. The
    output block is ``bs`` coarse rows at lane stride 2s."""
    i = pl.program_id(0)
    w = bs + 2 * halo
    nyp = nyr // 2  # packed rows
    row0 = i * bs
    start = pl.multiple_of(jnp.clip(row0 - halo, 0, nyp - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(p_hbm.at[pl.ds(start, w), :], p_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # Even/odd fine-row planes as static lane slices of the window.
    pE, pO = p_win[:, :nxp], p_win[:, nxp:]
    rhE, rhO = rhs_win[:, :nxp], rhs_win[:, nxp:]
    gp = start + lax.broadcasted_iota(jnp.int32, (w, nxp), 0)  # packed row
    gl = lax.broadcasted_iota(jnp.int32, (w, nxp), 1)
    lane_ok = (((gl & (s - 1)) == 0)
               & (gl >= s) & (gl <= (ncx - 2) * s))
    denom = jnp.float32(2.0 / dx2 + 2.0 / dy2)
    idx2 = jnp.float32(1.0 / dx2)
    idy2 = jnp.float32(1.0 / dy2)

    def up(a):    # row r -> r+1 (reads the next packed row)
        return pltpu.roll(a, w - 1, 0)

    def down(a):  # row r -> r-1
        return pltpu.roll(a, 1, 0)

    def lap_x(a):
        return idx2 * (pltpu.roll(a, nxp - s, 1) + pltpu.roll(a, s, 1))

    # Residual on fine rows 2r (plane E): N = O[r], S = O[r-1];
    # fine rows 2r+1 (plane O): N = E[r+1], S = E[r]. Interior-masked
    # to 0 elsewhere (ops.poisson._mg_residual). Fine row 2*gp is
    # interior iff gp >= 1 (2*gp <= nyr-2 holds for every packed row);
    # fine row 2*gp+1 iff 2*gp+1 <= nyr-2.
    intE = lane_ok & (gp >= 1)
    intO = lane_ok & (gp <= nyr // 2 - 2)
    apE = lap_x(pE) + idy2 * (pO + down(pO)) - denom * pE
    apO = lap_x(pO) + idy2 * (up(pE) + pE) - denom * pO
    rE = jnp.where(intE, rhE - apE, 0.0)
    rO = jnp.where(intO, rhO - apO, 0.0)

    # Separable full weighting: rx = (1/4, 1/2, 1/4) along lanes on
    # each plane, then w9 at even fine rows = 1/4*rxO[r-1] + 1/2*rxE[r]
    # + 1/4*rxO[r] (the stride-2 row samples are exactly plane E).
    def rx(a):
        return (0.5 * a
                + 0.25 * (pltpu.roll(a, nxp - s, 1) + pltpu.roll(a, s, 1)))

    rxE = rx(rE)
    rxO = rx(rO)
    w9 = 0.5 * rxE + 0.25 * (rxO + down(rxO))
    # Coarse points live at lanes c*(2s); boundary rows/cols inject the
    # fine residual's boundary values, which are identically 0.
    s2 = 2 * s
    ncx2 = (ncx + 1) // 2
    nyc = (nyr + 1) // 2
    core = (((gl & (s2 - 1)) == 0)
            & (gl >= s2) & (gl <= (ncx2 - 2) * s2)
            & (gp >= 1) & (gp <= nyc - 2))
    out = jnp.where(core, w9, 0.0)
    p_win[:, :nxp] = out  # reuse the window as the output staging buffer
    out_cp = pltpu.make_async_copy(
        p_win.at[pl.ds(out_lo, bs), pl.ds(0, nxp)], out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()


def _kernel_restrict2d(pk_hbm, rk_hbm, out_ref, pE_win, pO_win, rE_win,
                       rO_win, sem, *, nyr, ncx, nxp, s, bs, bsx, halo,
                       ch, dx2, dy2):
    """Column-tiled variant of _kernel_restrict: the even/odd fine-row
    planes are DMA'd as two lane windows of the packed array (plane E =
    packed lanes [l, l+cw), plane O = [nxp+l, nxp+l+cw)), so no window
    ever spans the full 2*nxp packed width. Lane halo ch >= 2s covers
    the residual + weighting reach."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = bs + 2 * halo
    cw = bsx + 2 * ch
    nyp = nyr // 2  # packed rows
    row0 = i * bs
    col0 = j * bsx
    start = pl.multiple_of(jnp.clip(row0 - halo, 0, nyp - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)
    cstart = pl.multiple_of(jnp.clip(col0 - ch, 0, nxp - cw), 128)
    out_cl = pl.multiple_of(col0 - cstart, 128)

    cps = [pltpu.make_async_copy(
               pk_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], pE_win,
               sem.at[0]),
           pltpu.make_async_copy(
               pk_hbm.at[pl.ds(start, w), pl.ds(nxp + cstart, cw)],
               pO_win, sem.at[1]),
           pltpu.make_async_copy(
               rk_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], rE_win,
               sem.at[2]),
           pltpu.make_async_copy(
               rk_hbm.at[pl.ds(start, w), pl.ds(nxp + cstart, cw)],
               rO_win, sem.at[3])]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    pE, pO = pE_win[:], pO_win[:]
    rhE, rhO = rE_win[:], rO_win[:]
    gp = start + lax.broadcasted_iota(jnp.int32, (w, cw), 0)
    gl = cstart + lax.broadcasted_iota(jnp.int32, (w, cw), 1)
    lane_ok = (((gl & (s - 1)) == 0)
               & (gl >= s) & (gl <= (ncx - 2) * s))
    denom = jnp.float32(2.0 / dx2 + 2.0 / dy2)
    idx2 = jnp.float32(1.0 / dx2)
    idy2 = jnp.float32(1.0 / dy2)

    def up(a):
        return pltpu.roll(a, w - 1, 0)

    def down(a):
        return pltpu.roll(a, 1, 0)

    def lap_x(a):
        return idx2 * (pltpu.roll(a, cw - s, 1) + pltpu.roll(a, s, 1))

    intE = lane_ok & (gp >= 1)
    intO = lane_ok & (gp <= nyr // 2 - 2)
    apE = lap_x(pE) + idy2 * (pO + down(pO)) - denom * pE
    apO = lap_x(pO) + idy2 * (up(pE) + pE) - denom * pO
    rE = jnp.where(intE, rhE - apE, 0.0)
    rO = jnp.where(intO, rhO - apO, 0.0)

    def rx(a):
        return (0.5 * a
                + 0.25 * (pltpu.roll(a, cw - s, 1) + pltpu.roll(a, s, 1)))

    rxE = rx(rE)
    rxO = rx(rO)
    w9 = 0.5 * rxE + 0.25 * (rxO + down(rxO))
    s2 = 2 * s
    ncx2 = (ncx + 1) // 2
    nyc = (nyr + 1) // 2
    core = (((gl & (s2 - 1)) == 0)
            & (gl >= s2) & (gl <= (ncx2 - 2) * s2)
            & (gp >= 1) & (gp <= nyc - 2))
    pE_win[:] = jnp.where(core, w9, 0.0)
    out_cp = pltpu.make_async_copy(
        pE_win.at[pl.ds(out_lo, bs), pl.ds(out_cl, bsx)], out_ref,
        sem.at[0])
    out_cp.start()
    out_cp.wait()


def mg_residual_restrict_int(p, rhs, dx, dy, s, ncx, block_rows=256,
                             interpret=False, tiling="auto"):
    """Fine interleaved level (nyr, nxp; stride s) -> coarse rhs
    (nyr//2, nxp; stride 2s). Requires even nyr and even ncx."""
    nyr, nxp = p.shape
    nyc = nyr // 2
    pk = p.reshape(nyc, 2 * nxp)      # free: row-major bitcast
    rk = rhs.reshape(nyc, 2 * nxp)
    if tiling == "1d":
        tiles = ("1d",) + _tile(nyc, 2 * nxp, 1, block_rows, 8)
    elif tiling == "2d":
        tiles = ("2d",) + _tile2d(nyc, nxp, 2, 2 * s, 12, block_rows)
    else:
        tiles = _restrict_tiles(nyc, nxp, s, block_rows)
    if tiles[0] == "2d":
        _, bs, halo, bsx, ch = tiles
        w = bs + 2 * halo
        cw = bsx + 2 * ch
        kern = functools.partial(_kernel_restrict2d, nyr=nyr, ncx=ncx,
                                 nxp=nxp, s=s, bs=bs, bsx=bsx, halo=halo,
                                 ch=ch, dx2=dx * dx, dy2=dy * dy)
        return pl.pallas_call(
            kern,
            grid=(nyc // bs, nxp // bsx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((bs, bsx), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nyc, nxp), p.dtype),
            scratch_shapes=[
                pltpu.VMEM((w, cw), p.dtype),
                pltpu.VMEM((w, cw), p.dtype),
                pltpu.VMEM((w, cw), rhs.dtype),
                pltpu.VMEM((w, cw), rhs.dtype),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
        )(pk, rk)
    _, bs, halo = tiles
    w = bs + 2 * halo
    kern = functools.partial(_kernel_restrict, nyr=nyr, ncx=ncx, nxp=nxp,
                             s=s, bs=bs, halo=halo, dx2=dx * dx,
                             dy2=dy * dy)
    return pl.pallas_call(
        kern,
        grid=(nyc // bs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nyc, nxp), p.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, 2 * nxp), p.dtype),
            pltpu.VMEM((w, 2 * nxp), rhs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pk, rk)


# ---------------------------------------------------------------------------
# Fused bilinear prolongation + correction add.
# ---------------------------------------------------------------------------

def _kernel_prolong(e_hbm, p_hbm, out_ref, e_win, p_win, sem,
                    *, nyr, ncx, nxp, s, bs, halo):
    """e: coarse level (nyc rows, stride 2s). p: packed fine row pairs
    (nyc, 2*nxp). Output: packed corrected fine (bs, 2*nxp) rows."""
    i = pl.program_id(0)
    w = bs + 2 * halo
    nyc = nyr // 2
    row0 = i * bs
    start = pl.multiple_of(jnp.clip(row0 - halo, 0, nyc - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(e_hbm.at[pl.ds(start, w), :], e_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(p_hbm.at[pl.ds(start, w), :], p_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    e = e_win[:]
    gc = start + lax.broadcasted_iota(jnp.int32, (w, nxp), 0)  # coarse row
    gl = lax.broadcasted_iota(jnp.int32, (w, nxp), 1)
    s2 = 2 * s
    # x-interpolation (index.html:1398-1421): even fine lanes coincide
    # with coarse lanes; odd fine lanes average the two neighbors, the
    # right edge clamping to the last coarse point.
    left = pltpu.roll(e, s, 1)          # coarse value from the west
    right = pltpu.roll(e, nxp - s, 1)   # coarse value from the east
    odd_lane = (gl & (s2 - 1)) == s
    last_odd = gl == (ncx - 1) * s      # ncx even: last fine point is odd
    xrow = jnp.where(odd_lane, 0.5 * (left + right), e)
    xrow = jnp.where(last_odd, left, xrow)
    # y-interpolation: fine row 2rc = xrow(rc); 2rc+1 averages rc and
    # rc+1, clamping at the last coarse row.
    xup = pltpu.roll(xrow, w - 1, 0)
    po = jnp.where(gc == nyc - 1, xrow, 0.5 * (xrow + xup))
    out = jnp.concatenate([xrow, po], axis=1) + p_win[:]
    e_win[:, :nxp] = out[:, :nxp]
    p_win[:, :nxp] = out[:, nxp:]
    # Stage through the windows to keep the dynamic-offset copy a DMA.
    o1 = pltpu.make_async_copy(
        e_win.at[pl.ds(out_lo, bs), pl.ds(0, nxp)],
        out_ref.at[:, pl.ds(0, nxp)], sem.at[0])
    o2 = pltpu.make_async_copy(
        p_win.at[pl.ds(out_lo, bs), pl.ds(0, nxp)],
        out_ref.at[:, pl.ds(nxp, nxp)], sem.at[1])
    o1.start()
    o2.start()
    o1.wait()
    o2.wait()


def _kernel_prolong2d(e_hbm, pk_hbm, out_hbm, e_win, pE_win, pO_win,
                      sem, *, nyr, ncx, nxp, s, bs, bsx, halo, ch):
    """Column-tiled variant of _kernel_prolong: the packed fine planes
    arrive as two lane windows (see _kernel_restrict2d) and the output
    planes leave as two manually-DMA'd lane slices of the packed
    (nyc, 2*nxp) output. Lane halo ch >= s covers the x-interpolation
    reach."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = bs + 2 * halo
    cw = bsx + 2 * ch
    nyc = nyr // 2
    row0 = pl.multiple_of(i * bs, 8)
    col0 = pl.multiple_of(j * bsx, 128)
    start = pl.multiple_of(jnp.clip(row0 - halo, 0, nyc - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)
    cstart = pl.multiple_of(jnp.clip(col0 - ch, 0, nxp - cw), 128)
    out_cl = pl.multiple_of(col0 - cstart, 128)

    cps = [pltpu.make_async_copy(
               e_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], e_win,
               sem.at[0]),
           pltpu.make_async_copy(
               pk_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], pE_win,
               sem.at[1]),
           pltpu.make_async_copy(
               pk_hbm.at[pl.ds(start, w), pl.ds(nxp + cstart, cw)],
               pO_win, sem.at[2])]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    e = e_win[:]
    gc = start + lax.broadcasted_iota(jnp.int32, (w, cw), 0)
    gl = cstart + lax.broadcasted_iota(jnp.int32, (w, cw), 1)
    s2 = 2 * s
    left = pltpu.roll(e, s, 1)
    right = pltpu.roll(e, cw - s, 1)
    odd_lane = (gl & (s2 - 1)) == s
    last_odd = gl == (ncx - 1) * s
    xrow = jnp.where(odd_lane, 0.5 * (left + right), e)
    xrow = jnp.where(last_odd, left, xrow)
    xup = pltpu.roll(xrow, w - 1, 0)
    po = jnp.where(gc == nyc - 1, xrow, 0.5 * (xrow + xup))
    e_win[:] = xrow + pE_win[:]
    pE_win[:] = po + pO_win[:]
    o1 = pltpu.make_async_copy(
        e_win.at[pl.ds(out_lo, bs), pl.ds(out_cl, bsx)],
        out_hbm.at[pl.ds(row0, bs), pl.ds(col0, bsx)], sem.at[0])
    o2 = pltpu.make_async_copy(
        pE_win.at[pl.ds(out_lo, bs), pl.ds(out_cl, bsx)],
        out_hbm.at[pl.ds(row0, bs), pl.ds(nxp + col0, bsx)], sem.at[1])
    o1.start()
    o2.start()
    o1.wait()
    o2.wait()


def mg_prolong_add_int(e, p, s, ncx, block_rows=256, interpret=False,
                       tiling="auto"):
    """p + prolong(e): e is the coarse (nyc, nxp; stride 2s) level,
    p the fine interleaved (nyr, nxp; stride s) level."""
    nyr, nxp = p.shape
    nyc = nyr // 2
    assert e.shape == (nyc, nxp)
    pk = p.reshape(nyc, 2 * nxp)
    if tiling == "1d":
        tiles = ("1d",) + _tile(nyc, 2 * nxp, 1, block_rows, 8)
    elif tiling == "2d":
        tiles = ("2d",) + _tile2d(nyc, nxp, 1, s, 10, block_rows)
    else:
        tiles = _prolong_tiles(nyc, nxp, s, block_rows)
    if tiles[0] == "2d":
        _, bs, halo, bsx, ch = tiles
        w = bs + 2 * halo
        cw = bsx + 2 * ch
        kern = functools.partial(_kernel_prolong2d, nyr=nyr, ncx=ncx,
                                 nxp=nxp, s=s, bs=bs, bsx=bsx,
                                 halo=halo, ch=ch)
        out = pl.pallas_call(
            kern,
            grid=(nyc // bs, nxp // bsx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nyc, 2 * nxp), p.dtype),
            scratch_shapes=[
                pltpu.VMEM((w, cw), e.dtype),
                pltpu.VMEM((w, cw), p.dtype),
                pltpu.VMEM((w, cw), p.dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )(e, pk)
        return out.reshape(nyr, nxp)
    _, bs, halo = tiles
    w = bs + 2 * halo
    kern = functools.partial(_kernel_prolong, nyr=nyr, ncx=ncx, nxp=nxp,
                             s=s, bs=bs, halo=halo)
    out = pl.pallas_call(
        kern,
        grid=(nyc // bs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bs, 2 * nxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nyc, 2 * nxp), p.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, nxp), e.dtype),
            pltpu.VMEM((w, 2 * nxp), p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(e, pk)
    return out.reshape(nyr, nxp)


# ---------------------------------------------------------------------------
# The interleaved V-cycle.
# ---------------------------------------------------------------------------

def _compact(x, s, ncx, ncy):
    """Interleaved (nyr, nxp; stride s) -> compact (ncy, ncx). Plain XLA
    strided slice -- only used at the (small) XLA handoff level."""
    return x[:ncy, ::s][:, :ncx]


def _interleave(x, s, nxp):
    """Compact (ncy, ncx) -> interleaved (ncy, nxp; stride s)."""
    ncy, ncx = x.shape
    wide = jnp.concatenate(
        [x[:, :, None], jnp.zeros((ncy, ncx, s - 1), x.dtype)], axis=2
    ).reshape(ncy, ncx * s)
    pad = nxp - ncx * s
    if pad:
        wide = jnp.pad(wide, ((0, 0), (0, pad)))
    return wide


def _level_ok(nyr, ncx, ncy, s, nxp, ksmooth):
    """Use the Pallas kernels at this level? (1-D full-width row blocks
    or, for wide levels, 2-D column tiles -- whichever the wrappers
    would resolve to.)"""
    if nyr % 8 != 0 or nyr < 16:
        return False
    if ncx % 2 or ncy % 2 or ncx <= 4 or ncy <= 4:
        return False  # odd next level / coarsest: hand off to XLA
    if s > nxp // 8:
        return False
    try:
        _smooth_tiles(nyr, nxp, ksmooth, s, 256)
        _restrict_tiles(nyr // 2, nxp, s, 256)
        _prolong_tiles(nyr // 2, nxp, s, 256)
        return True
    except ValueError:
        return False


def _vcycle_int(p_int, rhs_int, dx, dy, s, ncx, ncy, opts, interpret):
    """p_int, rhs_int: interleaved level arrays (ncy rows... rows are
    compact = ncy; lanes at stride s)."""
    from ..ops.poisson import _mg_vcycle
    nyr, nxp = p_int.shape
    ksmooth = max(opts.mg_pre_smooth, opts.mg_post_smooth,
                  opts.mg_coarse_smooth)
    if not _level_ok(nyr, ncx, ncy, s, nxp, ksmooth):
        pc = _compact(p_int, s, ncx, ncy)
        rc = _compact(rhs_int, s, ncx, ncy)
        out = _mg_vcycle(pc, rc, dx, dy, opts)
        return _interleave(out, s, nxp)
    p_int = mg_smooth_int(p_int, rhs_int, dx, dy, s, ncx,
                          opts.mg_pre_smooth, opts.pallas_block_rows,
                          interpret)
    if ncx <= opts.mg_coarsest or ncy <= opts.mg_coarsest:
        return mg_smooth_int(p_int, rhs_int, dx, dy, s, ncx,
                             opts.mg_coarse_smooth,
                             opts.pallas_block_rows, interpret)
    r_c = mg_residual_restrict_int(p_int, rhs_int, dx, dy, s, ncx,
                                   opts.pallas_block_rows, interpret)
    ncx2, ncy2 = (ncx + 1) // 2, (ncy + 1) // 2
    e_c = _vcycle_int(jnp.zeros_like(r_c), r_c, 2 * dx, 2 * dy,
                      2 * s, ncx2, ncy2, opts, interpret)
    p_int = mg_prolong_add_int(e_c, p_int, s, ncx,
                               opts.pallas_block_rows, interpret)
    return mg_smooth_int(p_int, rhs_int, dx, dy, s, ncx,
                         opts.mg_post_smooth, opts.pallas_block_rows,
                         interpret)


# ---------------------------------------------------------------------------
# MG_PRODUCTION (docs/SPEC.md item 12): BC-aware damped smoother +
# interleaved V-cycle. Same transfer kernels as the parity kit (the
# restricted field is an interior-masked residual either way); only the
# smoother changes -- damped, with the reference p' BCs every sweep.
# ---------------------------------------------------------------------------


def _kernel_smooth_mgp(p_hbm, rhs_hbm, out_ref, p_win, rhs_win, sem, *,
                       nyr, ncx, nxp, s, bs, halo, k, dx2, dy2, omega,
                       cavity):
    """k damped-Jacobi sweeps WITH the p' BCs at lane stride s
    (ops.poisson._mgp_smooth on the interleaved representation).

    Boundary-read folding (see jacobi_pallas._kernel): interior points
    adjacent to a Neumann edge read their own value (exactly what the
    per-sweep BC copy would have put there) and the Dirichlet outlet
    reads 0, so the sweeps never read boundary lanes/rows and ONE BC
    refresh at the end of the launch reproduces the XLA
    bc o (sweep+bc)^k chain exactly -- for ANY input boundary values,
    which also absorbs the bc(p + prolong(e)) the XLA path applies
    between prolongation and post-smoothing (ops.poisson._mgp_vcycle).
    """
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    start = pl.multiple_of(jnp.clip(((row0 - k) // 8) * 8, 0, nyr - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(p_hbm.at[pl.ds(start, w), :], p_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    gr = start + lax.broadcasted_iota(jnp.int32, (w, nxp), 0)
    gl = lax.broadcasted_iota(jnp.int32, (w, nxp), 1)
    last = (ncx - 1) * s
    interior = ((gr >= 1) & (gr <= nyr - 2)
                & ((gl & (s - 1)) == 0)
                & (gl >= s) & (gl <= last - s))
    is_bot = gr == 0
    is_top = gr == nyr - 1
    is_left = gl == 0
    is_right = gl == last
    adj_bot = gr == 1
    adj_top = gr == nyr - 2
    adj_left = gl == s
    adj_right = gl == last - s

    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    rhs = ar * rhs_win[:]

    def north(a):
        return pltpu.roll(a, w - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def east(a):
        return pltpu.roll(a, nxp - s, 1)

    def west(a):
        return pltpu.roll(a, s, 1)

    def body(_, c):
        pp = p_win[:]
        E = east(pp)
        W = west(pp)
        N = north(pp)
        S = south(pp)
        S = jnp.where(adj_bot, pp, S)
        N = jnp.where(adj_top, pp, N)
        W = jnp.where(adj_left, pp, W)
        E = (jnp.where(adj_right, pp, E) if cavity
             else jnp.where(adj_right, 0.0, E))
        new = ax * (E + W) + ay * (N + S) + ac * pp - rhs
        p_win[:] = jnp.where(interior, new, pp)
        return c

    lax.fori_loop(0, k, body, 0)

    # The single BC refresh: rows then columns (corner order matters,
    # ops.poisson._apply_pprime_bcs / _apply_pprime_bcs_cavity).
    pp = p_win[:]
    pp = jnp.where(is_bot, north(pp), pp)
    pp = jnp.where(is_top, south(pp), pp)
    pp = jnp.where(is_left, east(pp), pp)
    if cavity:
        pp = jnp.where(is_right, west(pp), pp)
        pp = jnp.where(is_bot & is_left, 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    p_win[:] = pp
    out_cp = pltpu.make_async_copy(p_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()


def _kernel_smooth_mgp2d(p_hbm, rhs_hbm, out_ref, p_win, rhs_win, sem,
                         *, nyr, ncx, nxp, s, bs, bsx, halo, ch, k,
                         dx2, dy2, omega, cavity):
    """Column-tiled variant of _kernel_smooth_mgp (see
    _kernel_smooth2d for the windowing): ch >= k*s lanes of halo, all
    BC-folding masks on global indices. The final BC refresh only
    *applies* at global boundary rows/lanes, which occur exclusively in
    edge-clamped windows where the window edge IS the array edge, so
    its neighbor reads are always within the valid region."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = bs + 2 * halo
    cw = bsx + 2 * ch
    row0 = i * bs
    col0 = j * bsx
    start = pl.multiple_of(jnp.clip(((row0 - k) // 8) * 8, 0, nyr - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)
    cstart = pl.multiple_of(jnp.clip(col0 - ch, 0, nxp - cw), 128)
    out_cl = pl.multiple_of(col0 - cstart, 128)

    cp1 = pltpu.make_async_copy(
        p_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], p_win, sem.at[0])
    cp2 = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(start, w), pl.ds(cstart, cw)], rhs_win,
        sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    gr = start + lax.broadcasted_iota(jnp.int32, (w, cw), 0)
    gl = cstart + lax.broadcasted_iota(jnp.int32, (w, cw), 1)
    last = (ncx - 1) * s
    interior = ((gr >= 1) & (gr <= nyr - 2)
                & ((gl & (s - 1)) == 0)
                & (gl >= s) & (gl <= last - s))
    is_bot = gr == 0
    is_top = gr == nyr - 1
    is_left = gl == 0
    is_right = gl == last
    adj_bot = gr == 1
    adj_top = gr == nyr - 2
    adj_left = gl == s
    adj_right = gl == last - s

    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    rhs = ar * rhs_win[:]

    def north(a):
        return pltpu.roll(a, w - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def east(a):
        return pltpu.roll(a, cw - s, 1)

    def west(a):
        return pltpu.roll(a, s, 1)

    def body(_, c):
        pp = p_win[:]
        E = east(pp)
        W = west(pp)
        N = north(pp)
        S = south(pp)
        S = jnp.where(adj_bot, pp, S)
        N = jnp.where(adj_top, pp, N)
        W = jnp.where(adj_left, pp, W)
        E = (jnp.where(adj_right, pp, E) if cavity
             else jnp.where(adj_right, 0.0, E))
        new = ax * (E + W) + ay * (N + S) + ac * pp - rhs
        p_win[:] = jnp.where(interior, new, pp)
        return c

    lax.fori_loop(0, k, body, 0)

    pp = p_win[:]
    pp = jnp.where(is_bot, north(pp), pp)
    pp = jnp.where(is_top, south(pp), pp)
    pp = jnp.where(is_left, east(pp), pp)
    if cavity:
        pp = jnp.where(is_right, west(pp), pp)
        pp = jnp.where(is_bot & is_left, 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    p_win[:] = pp
    out_cp = pltpu.make_async_copy(
        p_win.at[pl.ds(out_lo, bs), pl.ds(out_cl, bsx)], out_ref,
        sem.at[0])
    out_cp.start()
    out_cp.wait()


def mgp_smooth_int(p, rhs, dx, dy, s, ncx, iterations, omega, cavity,
                   block_rows=256, interpret=False, tiling="auto"):
    """k BC-aware damped sweeps on an interleaved (nyr, nxp) level."""
    nyr, nxp = p.shape
    if tiling == "1d":
        tiles = ("1d",) + _tile(nyr, nxp, iterations, block_rows, 6)
    elif tiling == "2d":
        tiles = ("2d",) + _tile2d(nyr, nxp, iterations, iterations * s,
                                  8, block_rows)
    else:
        tiles = _smooth_tiles(nyr, nxp, iterations, s, block_rows)
    if tiles[0] == "2d":
        _, bs, halo, bsx, ch = tiles
        w = bs + 2 * halo
        cw = bsx + 2 * ch
        kern = functools.partial(_kernel_smooth_mgp2d, nyr=nyr, ncx=ncx,
                                 nxp=nxp, s=s, bs=bs, bsx=bsx, halo=halo,
                                 ch=ch, k=iterations, dx2=dx * dx,
                                 dy2=dy * dy, omega=omega, cavity=cavity)
        return pl.pallas_call(
            kern,
            grid=(nyr // bs, nxp // bsx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((bs, bsx), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nyr, nxp), p.dtype),
            scratch_shapes=[
                pltpu.VMEM((w, cw), p.dtype),
                pltpu.VMEM((w, cw), rhs.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(p, rhs)
    _, bs, halo = tiles
    w = bs + 2 * halo
    kern = functools.partial(_kernel_smooth_mgp, nyr=nyr, ncx=ncx,
                             nxp=nxp, s=s, bs=bs, halo=halo, k=iterations,
                             dx2=dx * dx, dy2=dy * dy, omega=omega,
                             cavity=cavity)
    return pl.pallas_call(
        kern,
        grid=(nyr // bs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nyr, nxp), p.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, nxp), p.dtype),
            pltpu.VMEM((w, nxp), rhs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p, rhs)


def _vcycle_mgp_int(p_int, rhs_int, dx, dy, s, ncx, ncy, opts, bc,
                    cavity, interpret):
    """One BC-aware V-cycle (ops.poisson._mgp_vcycle) on interleaved
    level arrays; levels that fail _level_ok hand the remaining
    sub-V-cycle to the XLA path on compact arrays."""
    from ..ops.poisson import _mgp_vcycle
    nyr, nxp = p_int.shape
    ksmooth = max(opts.mgp_smooth, opts.mg_coarse_smooth)
    if not _level_ok(nyr, ncx, ncy, s, nxp, ksmooth):
        pc = _compact(p_int, s, ncx, ncy)
        rc = _compact(rhs_int, s, ncx, ncy)
        out = _mgp_vcycle(pc, rc, dx, dy, opts, bc)
        return _interleave(out, s, nxp)
    omega = opts.jacobi_omega
    br = opts.pallas_block_rows
    p_int = mgp_smooth_int(p_int, rhs_int, dx, dy, s, ncx,
                           opts.mgp_smooth, omega, cavity, br, interpret)
    if ncx <= opts.mg_coarsest or ncy <= opts.mg_coarsest:
        return mgp_smooth_int(p_int, rhs_int, dx, dy, s, ncx,
                              opts.mg_coarse_smooth, omega, cavity, br,
                              interpret)
    r_c = mg_residual_restrict_int(p_int, rhs_int, dx, dy, s, ncx, br,
                                   interpret)
    ncx2, ncy2 = (ncx + 1) // 2, (ncy + 1) // 2
    e_c = _vcycle_mgp_int(jnp.zeros_like(r_c), r_c, 2 * dx, 2 * dy,
                          2 * s, ncx2, ncy2, opts, bc, cavity, interpret)
    p_int = mg_prolong_add_int(e_c, p_int, s, ncx, br, interpret)
    # No explicit bc(p + prolong) pass: the post-smoother's boundary-
    # read folding makes it bitwise-equivalent (see _kernel_smooth_mgp).
    return mgp_smooth_int(p_int, rhs_int, dx, dy, s, ncx,
                          opts.mgp_smooth, omega, cavity, br, interpret)


def multigrid_production_pallas_ok(ny: int, nx: int, opts) -> bool:
    """Gate for the interleaved-kernel MG_PRODUCTION V-cycle (same
    shape conditions as the parity kit, with its smoother depth)."""
    nxp = _round_up(nx, 128)
    ksmooth = max(opts.mgp_smooth, opts.mg_coarse_smooth)
    return (ny % 8 == 0 and ny * nx >= 65_536
            and _level_ok(ny, nx, ny, 1, nxp, ksmooth))


def multigrid_production_pallas(pp0, rhs, dx, dy, opts, tol_r,
                                cavity=False, interpret=False):
    """Drop-in for ops.poisson.multigrid_production on TPU: V-cycles
    until max|rhs - A p'| <= tol_r, warm-started, whole cycle as the
    interleaved Pallas kernels with the BC-aware damped smoother."""
    from ..ops.poisson import (_apply_pprime_bcs, _apply_pprime_bcs_cavity,
                               _masked_while, _mg_residual,
                               _mgp_noise_floor)
    bc = _apply_pprime_bcs_cavity if cavity else _apply_pprime_bcs
    ny, nx = pp0.shape
    nxp = _round_up(nx, 128)
    pad = ((0, 0), (0, nxp - nx))
    rhs_w = jnp.pad(rhs, pad) if nxp != nx else rhs

    def cycle(p):
        p = _vcycle_mgp_int(p, rhs_w, dx, dy, 1, nx, ny, opts, bc,
                            cavity, interpret)
        err = jnp.max(jnp.abs(_mg_residual(p[:, :nx], rhs, dx, dy)))
        return p, err

    p0 = jnp.pad(bc(pp0), pad) if nxp != nx else bc(pp0)
    floor = _mgp_noise_floor(opts, dx, dy, pp0.dtype)
    if floor is not None:
        rhs_max = jnp.max(jnp.abs(rhs))
        inner = cycle

        def cycle(p):  # noqa: F811 -- floor-augmented variant
            p, err = inner(p)
            # Padded lanes can hold transfer-kernel junk; the valid
            # fine level is [:, :nx].
            return p, err, floor(jnp.max(jnp.abs(p[:, :nx])), rhs_max)

        p, err, n = _masked_while(cycle, p0, tol_r, opts.mgp_max_cycles,
                                  dynamic_tol=True)
        return p[:, :nx], err, n
    p, err, n = _masked_while(cycle, p0, tol_r, opts.mgp_max_cycles)
    return p[:, :nx], err, n


def multigrid_pallas_ok(ny: int, nx: int) -> bool:
    """Gate for the interleaved-kernel V-cycle: the fine level must be
    even-dimensioned, tile-friendly and large enough that the kernels
    beat XLA (coarser levels degrade to the XLA path automatically).
    Measured on v5e: Pallas wins at every size from 256^2 (3.45 -> 2.99
    ms/3-cycle solve) through 4096^2 (190 -> 24 ms, 7.8x)."""
    nxp = _round_up(nx, 128)
    return (ny % 8 == 0 and ny * nx >= 65_536
            and _level_ok(ny, nx, ny, 1, nxp, 10))


def multigrid_pallas(pp0, rhs, dx, dy, opts, interpret=False):
    """Drop-in for ops.poisson.multigrid on the TPU throughput path:
    mg_cycles V-cycles + final residual report, numerics matching the
    XLA kit (same smooth counts, restriction, prolongation, zero init).
    """
    from ..ops.poisson import _mg_residual
    ny, nx = pp0.shape
    nxp = _round_up(nx, 128)
    pad = ((0, 0), (0, nxp - nx))
    rhs_w = jnp.pad(rhs, pad) if nxp != nx else rhs
    pp = jnp.zeros((ny, nxp), pp0.dtype)
    for _ in range(opts.mg_cycles):
        pp = _vcycle_int(pp, rhs_w, dx, dy, 1, nx, ny, opts, interpret)
    pp = pp[:, :nx] if nxp != nx else pp
    r = _mg_residual(pp, rhs, dx, dy)
    err = jnp.max(jnp.abs(r))
    return pp, err, jnp.asarray(opts.mg_cycles, jnp.int32)
