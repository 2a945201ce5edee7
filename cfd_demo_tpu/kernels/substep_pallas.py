"""Fused PISO substep passes as Pallas TPU kernels.

Outside the pressure solve, a substep is two memory-bound sweeps
(SURVEY.md section 3.1): predictor + divergence (u,v -> u*,v*,rhs) and
corrector + boundary conditions (+ the residual/CFL reductions of
model.rs:333-348/:877-889). The XLA path runs them as several fusions
with intermediate HBM round trips; these kernels run each group as one
VMEM-resident pass:

  * ``predict_div_pallas``  : reads u,v; writes u*,v*,rhs.
  * ``correct_bc_pallas``   : reads u*,v*,p,p',u_entry,v_entry; writes
    u,v,p and the (res_u, res_v, max|vel|) reductions.

Numerical identity with the XLA path is by construction, not by
re-derivation: the kernels call the *same* ops (ops.predictor.predict,
ops.divergence.divergence_rhs, ops.corrector.correct, ops.bc.apply_bcs,
core.masks.masks_traced) with a window stencil context (``RollCtx``)
that swaps zero-padded shifted views for pltpu.roll with zero-fill at
window edges, and broadcast iota for global-row iota. Zero-filled rows
at *interior* window edges only ever corrupt halo rows whose outputs
are discarded; at true array edges zero-fill IS the XLA semantics.

Same manual-DMA window layout as kernels.jacobi_pallas: a 1-D grid over
row blocks, each program copying an 8-row-haloed window of every input
from HBM into VMEM (overlapping windows are not expressible as
BlockSpecs), computing on the window, and DMA-ing the owned rows to the
output block. All arrays are padded to one common lane-aligned width so
the staggered shapes ((ny, nx+1), (ny, nx)) share one tiling.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import FlowCase, Grid, InletProfile, Semantics, VelocityScheme
from ..core.masks import masks_traced
from ..ops.bc import apply_bcs
from ..ops.corrector import correct
from ..ops.divergence import divergence_rhs
from ..ops.predictor import predict
from ..ops.stencil import StencilCtx
from .jacobi_pallas import _compiler_params

_HALO = 8          # sublane-aligned row halo; stencils need <= 3 rows
# Mosaic's ~16 MB scoped-VMEM limit covers explicit buffers PLUS the
# live vector temporaries of the kernel body; the predictor DAG keeps
# O(10) (w, nxp) f32 values alive, so tiling must budget them too
# (bs=128 at 2048^2 compiled to 17.14 MB scoped and was rejected).
_VMEM_LIMIT = 14 * 1024 * 1024  # margin under the 16 MB scoped limit


class RollCtx(StencilCtx):
    """Stencil provider on a (w, nxp) VMEM window whose row 0 is global
    row ``start`` (traced) and column 0 is global column ``start_col``
    (traced; 0 except on the 2-D rows x cols shard tier, where the
    window is a column block of the global array). Shifts are
    pltpu.roll with zero-fill of the wrapped rows/columns, reproducing
    the zero-padding semantics of ops.stencil.shifted at array edges."""

    def __init__(self, start_row, w: int, nxp: int, start_col=0):
        self.start = start_row
        self.start_col = start_col
        self.w = w
        self.nxp = nxp
        # 1-D index vectors, broadcast at use (lean-mask form, round 3):
        # full (w, nxp) iotas each counted as a window-sized buffer
        # against Mosaic's scoped-VMEM limit and cost whole-window
        # compares wherever only a row or column predicate is needed.
        self._lr = lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        self._lc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)

    def shifts(self, src, out_shape):
        return _RollShifts(src, self)

    def col_index(self, shape):
        return self.start_col + self._lc

    def row_index(self, shape):
        return self.start + self._lr


class _RollShifts:
    def __init__(self, src, ctx: RollCtx):
        self._src = src
        self._ctx = ctx
        self._cache = {}

    def __call__(self, dj: int, di: int):
        key = (dj, di)
        if key not in self._cache:
            self._cache[key] = self._compute(dj, di)
        return self._cache[key]

    def _compute(self, dj: int, di: int):
        c = self._ctx
        out = self._src
        if dj:
            out = pltpu.roll(out, (-dj) % c.w, 0)
            if dj > 0:
                out = jnp.where(c._lr >= c.w - dj, 0.0, out)
            else:
                out = jnp.where(c._lr < -dj, 0.0, out)
        if di:
            out = pltpu.roll(out, (-di) % c.nxp, 1)
            if di > 0:
                out = jnp.where(c._lc >= c.nxp - di, 0.0, out)
            else:
                out = jnp.where(c._lc < -di, 0.0, out)
        return out


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _tile_rows(ny: int, nxp: int, n_windows: int, n_blocks: int,
               n_temps: int, block_rows: int) -> Tuple[int, int, int]:
    """(bs, halo, vmem_limit): row-block size for a kernel holding
    ``n_windows`` (bs+2*halo, nxp) windows plus ``n_blocks`` (bs, nxp)
    blocks in VMEM, with ``n_temps`` window-sized live temporaries
    estimated for the kernel body. Whole-array single block (halo 0)
    when it fits. vmem_limit is None under the default scoped limit; on
    very wide grids where no >= 32-row block fits it (8192^2 would tile
    at bs=8, 3x window reads), the raised Mosaic limit admits efficient
    blocks -- the round-3 large-window mode validated for the Jacobi
    kernels (kernels.jacobi_pallas._LARGE_VMEM_LIMIT)."""
    from .jacobi_pallas import _LARGE_SCOPED_BUDGET, _LARGE_VMEM_LIMIT
    row_bytes = nxp * 4

    def fits(bs: int, halo: int, limit: int) -> bool:
        w = bs + 2 * halo
        return ((n_windows + n_temps) * w + n_blocks * bs) * row_bytes \
            <= limit

    if ny % 8 == 0 and fits(ny, 0, _VMEM_LIMIT):
        return ny, 0, None
    # Candidate block sizes: multiples of 8 dividing ny, largest first,
    # capped at block_rows (ny need not be a power of two: 264 -> 88).
    fallback = None
    for bs in range(min(block_rows, ny), 7, -8):
        if ny % bs == 0 and ny >= bs + 2 * _HALO \
                and fits(bs, _HALO, _VMEM_LIMIT):
            # On wide grids small blocks pay heavy window-read
            # redundancy; prefer large-window blocks when the default
            # search lands below 128 rows (measured: 4096^2 fast step
            # 12.1 -> 10.4 ms at bs 32 -> 256; at 2048 lanes the big
            # windows LOSE -- 2.03 -> 2.50 ms -- hence the nxp gate).
            if bs >= 128 or nxp < 4096:
                if bs >= 32:
                    return bs, _HALO, None
            elif bs >= 32:
                fallback = (bs, _HALO, None)
            break
    for bs in (256, 128, 64, 32):
        if (bs <= block_rows and ny % bs == 0 and ny >= bs + 2 * _HALO
                and fits(bs, _HALO, _LARGE_SCOPED_BUDGET)
                and (fallback is None or bs > fallback[0])):
            return bs, _HALO, _LARGE_VMEM_LIMIT
    if fallback is not None:
        return fallback
    raise ValueError(f"no Pallas substep tiling for ny={ny}, width={nxp}")


def _window_start(row0, halo: int, ny: int, w: int):
    start = pl.multiple_of(jnp.clip(row0 - halo, 0, ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)
    return start, out_lo


# ---------------------------------------------------------------------------
# Kernel A: predictor + divergence
# ---------------------------------------------------------------------------

def _kernel_pre(scal_ref, u_hbm, v_hbm, us_out, vs_out, rhs_out,
                u_win, v_win, rhs_win, sem,
                *, grid, scheme, avg_conv_v, semantics, ny_arr, gny, nx,
                nxp, wv, bs, halo):
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    start, out_lo = _window_start(row0, halo, ny_arr, w)

    # u arrives lane-padded to nxp (its logical width nx+1 is never
    # 128-aligned); v is DMA-ed at its own width wv -- the buffer lanes
    # beyond wv hold garbage that no selected stencil read ever touches
    # (interior predicates stop 2 columns earlier; see module docstring).
    cp1 = pltpu.make_async_copy(u_hbm.at[pl.ds(start, w), :], u_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(v_hbm.at[pl.ds(start, w), :],
                                v_win.at[:, :wv], sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    dt_sub = scal_ref[0]
    nu = scal_ref[1]
    # Global row of local row 0 (sharded blocks; f32-encoded scalar is
    # exact for any realistic grid height). 0 on a single chip. coff:
    # global column of local column 0 (2-D rows x cols shard tier).
    off = scal_ref[2].astype(jnp.int32)
    coff = scal_ref[3].astype(jnp.int32)
    ctx = RollCtx(off + start, w, nxp, start_col=coff)
    mask_u, mask_v, _, _ = masks_traced(grid, semantics, jnp.float32,
                                        ctx=ctx, shp_u=(w, nxp),
                                        shp_v=(w, nxp))
    u = u_win[:]
    v = v_win[:]
    u_star, v_star = predict(u, v, dt_sub, nu, grid.dx, grid.dy, nx, gny,
                             scheme, avg_conv_v, mask_u, mask_v, ctx=ctx)
    rhs = divergence_rhs(u_star, v_star, dt_sub, grid.dx, grid.dy,
                         ctx=ctx, out_shape=(w, nxp))
    u_win[:] = u_star
    v_win[:] = v_star
    rhs_win[:] = rhs
    wo = vs_out.shape[1]
    for win, out, ww in ((u_win, us_out, nxp), (v_win, vs_out, wo),
                         (rhs_win, rhs_out, wo)):
        cp = pltpu.make_async_copy(win.at[pl.ds(out_lo, bs), :ww], out,
                                   sem.at[0])
        cp.start()
        cp.wait()


def predict_div_pallas(u: jnp.ndarray, v: jnp.ndarray, dt_sub, nu,
                       grid: Grid, scheme: VelocityScheme,
                       semantics: Semantics, block_rows: int = 256,
                       interpret: bool = False, pad_io: bool = True,
                       row_offset=None, col_offset=None):
    """Fused predictor + divergence.

    ``pad_io=True`` (tests / generic widths): takes and returns the
    reference storage shapes ((ny, nx+1), (ny, nx), (ny, nx)).
    ``pad_io=False`` (the solver fast path, requires nx % 128 == 0):
    ``u`` arrives already lane-padded to (ny, nxp) and ``u_star`` is
    returned padded, so the whole substep flows without pad/slice
    copies; v and rhs are always exact (ny, nx).

    ``row_offset`` (traced scalar; multi-chip shard_map path): the
    inputs are a halo-extended *local* row block of a grid.ny-row
    global array whose row 0 is global row ``row_offset``; outputs
    cover the same local rows (the caller discards the halo rows).
    ``col_offset`` (2-D rows x cols shard tier): the inputs are
    additionally a halo-extended column block -- u covering global
    faces [col_offset, col_offset + u.shape[1]) and v/outputs the same
    cell columns -- and every mask/BC predicate uses global columns.
    """
    nx = grid.nx
    ny = u.shape[0]       # local rows (== grid.ny on a single chip)
    gny = grid.ny
    if row_offset is None:
        assert ny == gny
        row_offset = 0
    if col_offset is None:
        col_offset = 0
        width_u = nx + 1
    else:
        width_u = u.shape[1]  # local column block (2-D tier)
        assert v.shape[1] == width_u - 1
    nxp = _round_up(width_u, 128)
    bs, halo, vmem_limit = _tile_rows(ny, nxp, 3, 3, 12, block_rows)
    w = bs + 2 * halo
    aligned = (width_u - 1) % 128 == 0
    if pad_io:
        up = jnp.pad(u, ((0, 0), (0, nxp - width_u)))
    else:
        assert aligned and u.shape[1] == nxp
        up = u
    if aligned:
        vp, wv, wo = v, width_u - 1, width_u - 1
    else:
        vp = jnp.pad(v, ((0, 0), (0, nxp - (width_u - 1))))
        wv, wo = nxp, nxp
    scal = jnp.stack([jnp.asarray(dt_sub, jnp.float32),
                      jnp.asarray(nu, jnp.float32),
                      jnp.asarray(row_offset, jnp.float32),
                      jnp.asarray(col_offset, jnp.float32)])
    kern = functools.partial(
        _kernel_pre, grid=grid, scheme=scheme,
        avg_conv_v=(semantics == Semantics.JS), semantics=semantics,
        ny_arr=ny, gny=gny, nx=nx, nxp=nxp, wv=wv, bs=bs, halo=halo)
    us, vs, rhs = pl.pallas_call(
        kern,
        grid=(ny // bs,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((bs, wo), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), u.dtype)]
        + [jax.ShapeDtypeStruct((ny, wo), u.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((w, nxp), u.dtype),
                        pltpu.VMEM((w, nxp), v.dtype),
                        pltpu.VMEM((w, nxp), u.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(scal, up, vp)
    if pad_io:
        us = us[:, :width_u]
    if not aligned:
        vs = vs[:, :width_u - 1]
        rhs = rhs[:, :width_u - 1]
    return us, vs, rhs


# ---------------------------------------------------------------------------
# Kernel B: corrector + boundary conditions + reductions
# ---------------------------------------------------------------------------

def _kernel_post(scal_ref, us_hbm, vs_hbm, p_hbm, pp_hbm, ue_ref, ve_ref,
                 u_out, v_out, p_out, red_ref,
                 us_win, vs_win, p_win, pp_win, sem,
                 *, grid, profile, flow_case, semantics, ny_arr, gny, nx,
                 nxp, wp, bs, halo, own_lo, own_hi, oc_lo, oc_hi):
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    start, out_lo = _window_start(row0, halo, ny_arr, w)

    # u* arrives lane-padded to nxp; v*, p, p' are DMA-ed at width wp
    # (exact when nx is lane-aligned) -- garbage lanes beyond wp are
    # never selected (see _kernel_pre).
    cps = [pltpu.make_async_copy(h.at[pl.ds(start, w), :],
                                 win.at[:, :ww], sem.at[k])
           for k, (h, win, ww) in enumerate((
               (us_hbm, us_win, nxp), (vs_hbm, vs_win, wp),
               (p_hbm, p_win, wp), (pp_hbm, pp_win, wp)))]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    dt_sub = scal_ref[0]
    inlet = scal_ref[1]
    off = scal_ref[2].astype(jnp.int32)
    coff = scal_ref[3].astype(jnp.int32)
    ctx = RollCtx(off + start, w, nxp, start_col=coff)
    u, v, p_new = correct(us_win[:], vs_win[:], p_win[:], pp_win[:],
                          dt_sub, grid.dx, grid.dy, ctx=ctx, nx=nx)
    _, _, mask_u_bc, mask_v_bc = masks_traced(grid, semantics, jnp.float32,
                                              ctx=ctx, shp_u=(w, nxp),
                                              shp_v=(w, nxp))
    u, v = apply_bcs(u, v, grid, profile, inlet, mask_u_bc, mask_v_bc,
                     flow_case, ctx=ctx)
    us_win[:] = u
    vs_win[:] = v
    p_win[:] = p_new
    for win, out, ww in ((us_win, u_out, nxp), (vs_win, v_out, wp),
                         (p_win, p_out, wp)):
        cp = pltpu.make_async_copy(win.at[pl.ds(out_lo, bs), :ww],
                                   out.at[:, :ww], sem.at[0])
        cp.start()
        cp.wait()

    # Residual / CFL reductions on the owned block (model.rs:333-348,
    # :877-889), masking the lane padding beyond each field's width and
    # -- in shard mode -- the exchanged halo rows/columns outside
    # [own_lo, own_hi) x [oc_lo, oc_hi), which the caller discards.
    lr = row0 + lax.broadcasted_iota(jnp.int32, (bs, nxp), 0)
    lrv = row0 + lax.broadcasted_iota(jnp.int32, (bs, wp), 0)
    lc = lax.broadcasted_iota(jnp.int32, (bs, nxp), 1)
    lcv = lax.broadcasted_iota(jnp.int32, (bs, wp), 1)
    gc = coff + lc
    gcv = coff + lcv
    u_own = ((gc <= nx) & (lc >= oc_lo) & (lc < oc_hi)    # u: nx+1 cols
             & (lr >= own_lo) & (lr < own_hi))
    v_own = ((gcv <= nx - 1) & (lcv >= oc_lo) & (lcv < oc_hi)
             & (lrv >= own_lo) & (lrv < own_hi))
    u_fin = u_out[:]
    v_fin = v_out[:]
    red_ref[i, 0] = jnp.max(jnp.where(u_own, jnp.abs(u_fin - ue_ref[:]), 0.0))
    red_ref[i, 1] = jnp.max(jnp.where(v_own, jnp.abs(v_fin - ve_ref[:]), 0.0))
    red_ref[i, 2] = jnp.maximum(
        jnp.max(jnp.where(u_own, jnp.abs(u_fin), 0.0)),
        jnp.max(jnp.where(v_own, jnp.abs(v_fin), 0.0)))


def correct_bc_pallas(u_star: jnp.ndarray, v_star: jnp.ndarray,
                      p: jnp.ndarray, p_prime: jnp.ndarray,
                      u_entry: jnp.ndarray, v_entry: jnp.ndarray,
                      dt_sub, inlet, grid: Grid, profile: InletProfile,
                      flow_case: FlowCase, semantics: Semantics,
                      block_rows: int = 256, interpret: bool = False,
                      pad_io: bool = True, row_offset=None,
                      own_rows=None, return_padded_u: bool = False,
                      col_offset=None, own_cols=None):
    """Fused corrector + BCs + step reductions. Returns
    (u, v, p, res_u, res_v, max_vel) where res_* = max|field - entry|
    (the model.rs:333-348 residuals) and max_vel feeds the CFL dt
    controller.

    ``pad_io=False`` (solver fast path, nx % 128 == 0): ``u_star`` and
    ``u_entry`` arrive lane-padded to (ny, nxp) -- straight from
    :func:`predict_div_pallas` and the step-entry pad -- while v*, p,
    p' stay exact-shaped; the returned u is sliced back to (ny, nx+1).

    ``row_offset``/``own_rows`` (multi-chip shard_map path): inputs are
    halo-extended local row blocks whose row 0 is global row
    ``row_offset``; the residual/CFL reductions only count local rows
    in ``own_rows`` = (lo, hi). ``col_offset``/``own_cols`` (2-D
    rows x cols tier): inputs are additionally halo-extended column
    blocks -- u covering global faces starting at ``col_offset`` --
    and the reductions count local columns in ``own_cols`` only.
    """
    nx = grid.nx
    ny = u_star.shape[0]   # local rows (== grid.ny on a single chip)
    gny = grid.ny
    if row_offset is None:
        assert ny == gny
        row_offset = 0
    if col_offset is None:
        col_offset = 0
        width_u = nx + 1
    else:
        width_u = u_star.shape[1]  # local column block (2-D tier)
        assert v_star.shape[1] == width_u - 1
    own_lo, own_hi = own_rows if own_rows is not None else (0, ny)
    nxp = _round_up(width_u, 128)
    oc_lo, oc_hi = own_cols if own_cols is not None else (0, nxp)
    bs, halo, vmem_limit = _tile_rows(ny, nxp, 4, 5, 8, block_rows)
    w = bs + 2 * halo
    aligned = (width_u - 1) % 128 == 0
    pad_u = ((0, 0), (0, nxp - width_u))
    pad_p = ((0, 0), (0, nxp - (width_u - 1)))
    if pad_io:
        usp = jnp.pad(u_star, pad_u)
        uep = jnp.pad(u_entry, pad_u)
    else:
        assert aligned and u_star.shape[1] == nxp
        usp, uep = u_star, u_entry
    if aligned:
        wp = width_u - 1
        vsp, pa, ppa, vep = v_star, p, p_prime, v_entry
    else:
        wp = nxp
        vsp = jnp.pad(v_star, pad_p)
        pa = jnp.pad(p, pad_p)
        ppa = jnp.pad(p_prime, pad_p)
        vep = jnp.pad(v_entry, pad_p)
    scal = jnp.stack([jnp.asarray(dt_sub, jnp.float32),
                      jnp.asarray(inlet, jnp.float32),
                      jnp.asarray(row_offset, jnp.float32),
                      jnp.asarray(col_offset, jnp.float32)])
    nblocks = ny // bs
    kern = functools.partial(
        _kernel_post, grid=grid, profile=profile, flow_case=flow_case,
        semantics=semantics, ny_arr=ny, gny=gny, nx=nx, nxp=nxp, wp=wp,
        bs=bs, halo=halo, own_lo=own_lo, own_hi=own_hi,
        oc_lo=oc_lo, oc_hi=oc_hi)
    u, v, p_new, red = pl.pallas_call(
        kern,
        grid=(nblocks,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((bs, wp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bs, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bs, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nblocks, 3), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), u_star.dtype),
                   jax.ShapeDtypeStruct((ny, wp), u_star.dtype),
                   jax.ShapeDtypeStruct((ny, wp), u_star.dtype),
                   jax.ShapeDtypeStruct((nblocks, 3), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((w, nxp), u_star.dtype)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(scal, usp, vsp, pa, ppa, uep, vep)
    if not return_padded_u:
        u = u[:, :width_u]
    if not aligned:
        v = v[:, :width_u - 1]
        p_new = p_new[:, :width_u - 1]
    return (u, v, p_new,
            jnp.max(red[:, 0]), jnp.max(red[:, 1]), jnp.max(red[:, 2]))

# ---------------------------------------------------------------------------
# Kernel C: corrector + next-round divergence (Rust outer corrector rounds)
# ---------------------------------------------------------------------------

def _kernel_round(scal_ref, us_hbm, vs_hbm, p_hbm, pp_hbm,
                  u_out, v_out, p_out, rhs_out,
                  us_win, vs_win, p_win, pp_win, sem,
                  *, grid, nx, nxp, wp, ny_arr, bs, halo):
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    start, out_lo = _window_start(row0, halo, ny_arr, w)

    cps = [pltpu.make_async_copy(h.at[pl.ds(start, w), :],
                                 win.at[:, :ww], sem.at[k])
           for k, (h, win, ww) in enumerate((
               (us_hbm, us_win, nxp), (vs_hbm, vs_win, wp),
               (p_hbm, p_win, wp), (pp_hbm, pp_win, wp)))]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    dt_sub = scal_ref[0]
    off = scal_ref[1].astype(jnp.int32)
    ctx = RollCtx(off + start, w, nxp)
    u, v, p_new = correct(us_win[:], vs_win[:], p_win[:], pp_win[:],
                          dt_sub, grid.dx, grid.dy, ctx=ctx, nx=nx)
    # The divergence the NEXT outer round would recompute from these
    # corrected fields (model.rs:700-701 re-runs recompute_divergence
    # at the top of each round): corrected u/v are valid through the
    # window halo (the corrector stencil spans 1 row/lane, the
    # divergence another 1 -- _HALO=8 covers both), and the zero-fill
    # at the true top edge IS the implicit v top row.
    rhs = divergence_rhs(u, v, dt_sub, grid.dx, grid.dy,
                         ctx=ctx, out_shape=(w, nxp))
    us_win[:] = u
    vs_win[:] = v
    p_win[:] = p_new
    pp_win[:] = rhs
    for win, out, ww in ((us_win, u_out, nxp), (vs_win, v_out, wp),
                         (p_win, p_out, wp), (pp_win, rhs_out, wp)):
        cp = pltpu.make_async_copy(win.at[pl.ds(out_lo, bs), :ww],
                                   out.at[:, :ww], sem.at[0])
        cp.start()
        cp.wait()


def correct_div_pallas(u_star: jnp.ndarray, v_star: jnp.ndarray,
                       p: jnp.ndarray, p_prime: jnp.ndarray,
                       dt_sub, grid: Grid, block_rows: int = 256,
                       interpret: bool = False, pad_io: bool = True,
                       row_offset=None):
    """Fused corrector + next-round divergence: ONE launch per Rust
    outer corrector round (model.rs:696-724) instead of the corrector
    and recompute_divergence XLA passes between Jacobi launch chains.

    Returns (u, v, p_new, rhs_next) where rhs_next is the divergence
    RHS the next round's pressure solve consumes (computed one round
    early -- the fields do not change in between; the final round's
    rhs_next is simply discarded).

    ``pad_io=False`` (solver fast path, nx % 128 == 0): ``u_star``
    arrives lane-padded to (ny, nxp) and u is returned padded, so the
    outer-rounds while_loop carries the padded u with zero pad/slice
    passes per round.
    """
    nx = grid.nx
    ny = u_star.shape[0]
    if row_offset is None:
        assert ny == grid.ny
        row_offset = 0
    nxp = _round_up(nx + 1, 128)
    bs, halo, vmem_limit = _tile_rows(ny, nxp, 4, 4, 8, block_rows)
    w = bs + 2 * halo
    aligned = nx % 128 == 0
    if pad_io:
        usp = jnp.pad(u_star, ((0, 0), (0, nxp - (nx + 1))))
    else:
        assert aligned and u_star.shape[1] == nxp
        usp = u_star
    if aligned:
        wp = nx
        vsp, pa, ppa = v_star, p, p_prime
    else:
        wp = nxp
        pad_p = ((0, 0), (0, nxp - nx))
        vsp = jnp.pad(v_star, pad_p)
        pa = jnp.pad(p, pad_p)
        ppa = jnp.pad(p_prime, pad_p)
    scal = jnp.stack([jnp.asarray(dt_sub, jnp.float32),
                      jnp.asarray(row_offset, jnp.float32)])
    kern = functools.partial(_kernel_round, grid=grid, nx=nx, nxp=nxp,
                             wp=wp, ny_arr=ny, bs=bs, halo=halo)
    u, v, p_new, rhs = pl.pallas_call(
        kern,
        grid=(ny // bs,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((bs, wp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), u_star.dtype)]
        + [jax.ShapeDtypeStruct((ny, wp), u_star.dtype)] * 3,
        scratch_shapes=[pltpu.VMEM((w, nxp), u_star.dtype)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(scal, usp, vsp, pa, ppa)
    if pad_io:
        u = u[:, :nx + 1]
    if not aligned:
        v = v[:, :nx]
        p_new = p_new[:, :nx]
        rhs = rhs[:, :nx]
    return u, v, p_new, rhs
