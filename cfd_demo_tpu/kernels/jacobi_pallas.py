"""Fused multi-iteration Jacobi sweep as a Pallas TPU kernel.

The pressure solve is the hottest loop in the framework (SURVEY.md
section 3.1: 50 Jacobi iterations x up to 21 corrector rounds per
substep = ~1000 grid sweeps). The jnp formulation reads and writes p'
from HBM once *per iteration*; this kernel runs K iterations per
launch entirely in VMEM, cutting HBM traffic by ~K.

Design (wide-halo redundant compute):
  * 1-D grid over row blocks of BS rows; each program manually DMAs a
    (BS + 2K)-row window of p' and rhs from HBM into VMEM (overlapping
    windows are not expressible as BlockSpecs, hence ANY memory space +
    make_async_copy with a clamped dynamic start row).
  * K damped-Jacobi iterations run on the window; the valid region
    shrinks by one row per iteration from window edges that are not
    true domain edges, and the window is sized so the BS output rows
    remain valid after K iterations.
  * Neighbor access is pltpu.roll on the window; wrap-around garbage
    only ever lands in rows/cols that are invalid halo (masked) or are
    overwritten by the boundary-condition selects.
  * The reference's per-iteration p' BCs (model.rs:807-815) are global
    row/col selects on broadcast iota of *global* indices, so every
    block applies exactly the rows/columns it owns.
  * Per-block max |delta| of the *last* iteration is reduced to SMEM;
    the caller maxes over blocks, preserving the reference's
    convergence metric at K-iteration granularity.

The exact-semantics path (early exit at single-iteration granularity)
remains the jnp implementation in ops/poisson.py; this kernel is the
throughput path, checking the tolerance every K iterations.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo8(k: int) -> int:
    """Halo width rounded up to the sublane tiling so every DMA start
    row stays a provable multiple of 8."""
    return -(-k // 8) * 8


def _kernel(pp_hbm, rhs_hbm, out_ref, err_ref, pp_win, rhs_win, sem,
            *, ny, nx, nxp, bs, halo, k, dx2, dy2, omega, cavity):
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    # Window start: k halo rows below row0, rounded down to a multiple
    # of 8 and clamped to the array; ny, bs, w are all multiples of 8,
    # so start (and hence out_lo) stay 8-aligned.
    start = pl.multiple_of(jnp.clip(((row0 - k) // 8) * 8, 0, ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(pp_hbm.at[pl.ds(start, w), :], pp_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # 1-D masks only (see _kernel2d): (w, 1) row predicates and
    # (1, nxp) column predicates broadcast at use, instead of
    # window-sized iota/bool buffers that each count against Mosaic's
    # scoped-VMEM limit.
    gr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    gc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    # The convergence metric must only count rows this block *owns*:
    # halo rows are stale by the last fused iteration.
    owned_r = ((gr >= jnp.maximum(1, row0))
               & (gr <= jnp.minimum(ny - 2, row0 + bs - 1)))
    owned_c = (gc >= 1) & (gc <= nx - 2)
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    # Fold every division into compile-time multipliers (VPU divides
    # are an order of magnitude slower than fmas).
    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    # Scale rhs in place: new = ax*(E+W) + ay*(N+S) + ac*C - rhs_win
    # (a separate scaled copy would stay live across the sweep loop).
    rhs_win[:] = ar * rhs_win[:]

    # pltpu.roll requires non-negative shifts; roll by size-1 is the
    # negative-direction shift.
    def north(a):
        return pltpu.roll(a, w - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def east(a):
        return pltpu.roll(a, nxp - 1, 1)

    def west(a):
        return pltpu.roll(a, 1, 1)

    # Boundary-read folding: interior cells adjacent to a Neumann
    # boundary read their own value there (the per-iteration BC would
    # have copied it), and the Dirichlet outlet reads 0 -- so boundary
    # cells are never READ during the sweeps and their refresh runs
    # once per launch instead of once per iteration (saves ~4 lane/
    # sublane rolls per iteration; bitwise-identical for BC-consistent
    # p' input, which the solver always supplies -- p' is either zero
    # or the previous solve's post-BC output).
    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2

    def iterate(want_err, fold_rows=True):
        pp = pp_win[:]
        E = east(pp)
        W = west(pp)
        N = north(pp)
        S = south(pp)
        if fold_rows:
            S = jnp.where(adj_bot, pp, S)
            N = jnp.where(adj_top, pp, N)
        W = jnp.where(adj_left, pp, W)
        E = (jnp.where(adj_right, pp, E) if cavity
             else jnp.where(adj_right, 0.0, E))
        new = ax * (E + W) + ay * (N + S) + ac * pp - rhs_win[:]
        # Only the final iteration's max |delta| is reported
        # (model.rs:821-823 reports the error of the exiting sweep);
        # it counts interior cells only, so the garbage the unmasked
        # store leaves in (never-read) boundary cells is inert.
        err = (jnp.max(jnp.where(owned_r & owned_c,
                                 jnp.abs(new - pp), 0.0))
               if want_err else jnp.float32(0.0))
        pp_win[:] = new
        return err

    # Row-interior window specialization: when no window row is
    # adjacent to the bottom/top domain boundary, the two row-fold
    # selects are provably no-ops and the sweep loop drops them
    # (~7% off the 50-iteration solve at 2048^2, docs/PERF.md). The
    # final (error-reporting) iteration keeps the full form; its cost
    # is amortized 1/k. Two iterations per loop trip (round 4): the
    # halved loop-carried control overhead measured +4.5% on the
    # 8192^2 solve (tools/probe_fastmode_r4.py), flat at 16384^2;
    # op count and value sequence are unchanged (bitwise-identical
    # fields).
    inner_rows = jnp.logical_and(start >= 2, start + w <= ny - 2)
    trips, rem = (k - 1) // 2, (k - 1) % 2

    @pl.when(inner_rows)
    def _():
        lax.fori_loop(0, trips,
                      lambda _, c: (iterate(False, fold_rows=False),
                                    iterate(False, fold_rows=False), c)[2],
                      0)
        for _i in range(rem):
            iterate(False, fold_rows=False)

    @pl.when(jnp.logical_not(inner_rows))
    def _():
        lax.fori_loop(0, trips,
                      lambda _, c: (iterate(False), iterate(False), c)[2],
                      0)
        for _i in range(rem):
            iterate(False)

    err = iterate(True)
    # p' BCs once per launch, rows then columns (corner order matters).
    # Channel: Neumann bottom/top/left + Dirichlet-0 outlet; cavity:
    # all-Neumann with the (0,0) gauge cell pinned
    # (ops.poisson._apply_pprime_bcs / _apply_pprime_bcs_cavity).
    pp = pp_win[:]
    pp = jnp.where(is_bot, north(pp), pp)
    pp = jnp.where(is_top, south(pp), pp)
    pp = jnp.where(is_left, east(pp), pp)
    if cavity:
        pp = jnp.where(is_right, west(pp), pp)
        pp = jnp.where(is_bot & is_left, 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    pp_win[:] = pp
    # Dynamic-start vector loads from VMEM are not lowerable; a local
    # DMA handles the dynamic sublane offset.
    out_cp = pltpu.make_async_copy(pp_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()
    err_ref[i, 0] = err


def _kernel_res(pp_hbm, rhs_hbm, out_ref, *refs, ny, nx, nxp, bs, halo,
                k, dx2, dy2, omega, cavity, emit_res,
                emit_restrict=False):
    """_kernel variant for the aligned MGP cycle (ops.poisson
    _mgp_vcycle_aligned): k damped BC-folded sweeps PLUS the residual
    r = rhs - A p of the final iterate, emitted in the same launch --
    removing the separate full-array residual pass the cycle otherwise
    pays twice (once for the coarse correction, once for the exit
    check). The residual is computed with the folded neighbor reads,
    which equal ops.poisson._mg_residual's true ring reads on
    BC-consistent p (the founding equivalence of these kernels), and
    is written INTO rhs_win (rhs is dead after the last sweep) so no
    extra VMEM window is needed. err_ref reports max|r| over owned
    interior rows -- the MGP exit metric -- instead of _kernel's
    last-sweep delta. emit_res=False (the cycle's POST-smooth
    position, which consumes only the exit metric) skips the full-
    array residual output entirely -- one less HBM write of the whole
    fine level per cycle.

    emit_restrict (round 4, VERDICT r3 item 1): instead of the full
    residual, emit the CELL-CENTERED-RESTRICTED residual at half rows
    -- m[t, c] = 0.5*(fx[2t+1] + fx[2t+2]) with fx = 0.5*(r + east(r))
    -- so the XLA side of the aligned cycle keeps only ONE strided
    lane slice (m[:ncy, 1::2], which Mosaic cannot lower but XLA can)
    instead of interior-slice + restrict_x + restrict_y passes over
    the full fine level, and the kernel's residual write halves. The
    expression order matches ops.poisson._cc_restrict exactly (0.5
    pair averages per axis). The half-row compaction is the sublane
    deinterleave reshape((w//2, 2, nxp))[:, 1] -- the one strided form
    this Mosaic lowers (tools/probe_mosaic_r4.py)."""
    if emit_restrict:
        res_ref, err_ref, pp_win, rhs_win, m_win, sem = refs
    elif emit_res:
        res_ref, err_ref, pp_win, rhs_win, sem = refs
    else:
        err_ref, pp_win, rhs_win, sem = refs
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    # Margin k+1, not k: the fused residual (and the err metric) of an
    # owned edge row reads one ring PAST the k-sweep contamination
    # depth from a wrapped window edge; window edges that coincide with
    # the global boundary are fold-protected instead. emit_restrict
    # uses 16-granular starts so out_lo//2 (the half-row output DMA
    # start) stays a provable multiple of 8; its halo covers the extra
    # +1 row the y-pairing reads past the owned range.
    g = 16 if emit_restrict else 8
    start = pl.multiple_of(
        jnp.clip(((row0 - (k + 1)) // g) * g, 0, ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, g)

    cp1 = pltpu.make_async_copy(pp_hbm.at[pl.ds(start, w), :], pp_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # 1-D masks (see _kernel2d): row predicates (w, 1), column
    # predicates (1, nxp), broadcast at use -- full-window iota/bool
    # buffers would each count against Mosaic's scoped-VMEM limit.
    gr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    gc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    interior_r = (gr >= 1) & (gr <= ny - 2)
    interior_c = (gc >= 1) & (gc <= nx - 2)
    owned_r = interior_r & (gr >= row0) & (gr < row0 + bs)
    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    bx = jnp.float32(1.0 / dx2)
    by = jnp.float32(1.0 / dy2)
    rhs_s = ar * rhs_win[:]  # pre-scaled for the sweeps; raw kept

    def north(a):
        return pltpu.roll(a, w - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def east(a):
        return pltpu.roll(a, nxp - 1, 1)

    def west(a):
        return pltpu.roll(a, 1, 1)

    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2

    def folded(pp):
        E = east(pp)
        W = west(pp)
        N = north(pp)
        S = south(pp)
        S = jnp.where(adj_bot, pp, S)
        N = jnp.where(adj_top, pp, N)
        W = jnp.where(adj_left, pp, W)
        E = (jnp.where(adj_right, pp, E) if cavity
             else jnp.where(adj_right, 0.0, E))
        return E, W, N, S

    def iterate(_, c):
        pp = pp_win[:]
        E, W, N, S = folded(pp)
        pp_win[:] = ax * (E + W) + ay * (N + S) + ac * pp - rhs_s
        return c

    lax.fori_loop(0, k, iterate, 0)
    # Residual of the final iterate (folded reads == post-BC ring
    # reads), interior-masked like ops.poisson._mg_residual.
    pp = pp_win[:]
    E, W, N, S = folded(pp)
    r = rhs_win[:] - (bx * (E + W) + by * (N + S) - denom * pp)
    r = jnp.where(interior_r & interior_c, r, 0.0)
    err = jnp.max(jnp.where(owned_r, jnp.abs(r), 0.0))
    if emit_restrict:
        # x pair average (== _cc_restrict_x on even interior width:
        # fx[c] = 0.5*(r[c] + r[c+1]), consumed at odd c), then the y
        # pair average at local-odd rows (start is even, so local-odd
        # == global-odd == the interior-even pairing of _cc_restrict_y)
        # compacted to half rows by the sublane deinterleave reshape.
        fx = 0.5 * (r + east(r))
        pair = 0.5 * (fx + north(fx))        # pair[l] = .5(fx[l]+fx[l+1])
        m_win[:] = pair.reshape(w // 2, 2, nxp)[:, 1, :]
    elif emit_res:
        rhs_win[:] = r
    # p' BCs once per launch (rows then columns, corner order).
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    pp = jnp.where(is_bot, north(pp), pp)
    pp = jnp.where(is_top, south(pp), pp)
    pp = jnp.where(is_left, east(pp), pp)
    if cavity:
        pp = jnp.where(is_right, west(pp), pp)
        pp = jnp.where(is_bot & is_left, 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    pp_win[:] = pp
    out_cp = pltpu.make_async_copy(pp_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    if emit_restrict:
        half_lo = pl.multiple_of(out_lo // 2, 8)
        res_cp = pltpu.make_async_copy(
            m_win.at[pl.ds(half_lo, bs // 2), :], res_ref, sem.at[1])
        res_cp.start()
        res_cp.wait()
    elif emit_res:
        res_cp = pltpu.make_async_copy(rhs_win.at[pl.ds(out_lo, bs), :],
                                       res_ref, sem.at[1])
        res_cp.start()
        res_cp.wait()
    out_cp.wait()
    err_ref[i, 0] = err


def jacobi_fused_k_res(pp: jnp.ndarray, rhs: jnp.ndarray, dx: float,
                       dy: float, omega: float, k: int,
                       interpret: bool = False, cavity: bool = False,
                       emit_res: bool = True):
    """K fused damped sweeps + the final residual in ONE launch.
    Returns (p', r, max|r|); with emit_res=False, (p', None, max|r|)
    -- the full-array residual write is skipped for callers that only
    consume the exit metric (the aligned cycle's post-smooth). 1-D row
    tiling only; raises ValueError when no feasible block exists (the
    caller falls back to the XLA smooth + residual pair)."""
    ny, nx = pp.shape
    if ny % 8 != 0:
        raise ValueError(f"ny={ny} must be a multiple of 8")
    nxp = -(-nx // 128) * 128
    halo = _halo8(k + 1)  # k sweeps + 1 residual ring (see _kernel_res)
    n_out = 2 if emit_res else 1

    def vmem_model(bs):
        # two halo windows + the output block(s)
        return (2 * (bs + 2 * halo) * nxp + n_out * bs * nxp) * 4

    vmem_limit = None
    budget = 6_815_744
    bs = 256
    while bs >= 8 and (ny % bs != 0 or ny < bs + 2 * halo
                       or vmem_model(bs) > budget):
        bs //= 2
    if not interpret and nxp >= 4096:
        # Large-window mode (see _LARGE_VMEM_LIMIT): the conservative
        # budget forces tiny blocks on wide grids (bs=32 at 8192 lanes
        # = 2x window redundancy for this kernel's 2 outputs); the
        # raised scoped limit admits bs=256 (73 MB under the
        # calibrated model, +1 output block vs the plain sweep).
        for cand in (256, 128, 64):
            if (cand > bs and ny % cand == 0 and ny >= cand + 2 * halo
                    and ((6 + n_out - 1) * (cand + 2 * halo) + n_out * cand)
                    * nxp * 4 <= _LARGE_SCOPED_BUDGET):
                bs = cand
                vmem_limit = _LARGE_VMEM_LIMIT
                break
    if bs < 8:
        raise ValueError(f"no valid block size for ny={ny}, k={k}")
    nblocks = ny // bs
    w = bs + 2 * halo
    if nxp != nx:
        pad = ((0, 0), (0, nxp - nx))
        pp = jnp.pad(pp, pad)
        rhs = jnp.pad(rhs, pad)
    kern = functools.partial(
        _kernel_res, ny=ny, nx=nx, nxp=nxp, bs=bs, halo=halo, k=k,
        dx2=dx * dx, dy2=dy * dy, omega=omega, cavity=cavity,
        emit_res=emit_res)
    field_spec = pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    field_shape = jax.ShapeDtypeStruct((ny, nxp), pp.dtype)
    outs = pl.pallas_call(
        kern,
        grid=(nblocks,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[field_spec] * n_out + [
            pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)],
        out_shape=[field_shape] * n_out + [
            jax.ShapeDtypeStruct((nblocks, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((w, nxp), pp.dtype),
            pltpu.VMEM((w, nxp), rhs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pp, rhs)
    out, res, err = ((*outs,) if emit_res else (outs[0], None, outs[1]))
    if nxp != nx:
        out = out[:, :nx]
        if emit_res:
            res = res[:, :nx]
    return out, res, jnp.max(err)


def jacobi_fused_k_restrict(pp: jnp.ndarray, rhs: jnp.ndarray, dx: float,
                            dy: float, omega: float, k: int,
                            interpret: bool = False,
                            cavity: bool = False):
    """K fused damped sweeps + the CELL-CENTERED-RESTRICTED residual in
    ONE launch (round 4, VERDICT r3 item 1): returns (p', m, max|r|)
    with m of shape (ny//2, nx-ish) holding the x-paired y-paired
    residual -- the aligned cycle's first coarse level is then just the
    strided slice m[:(ny-2)//2, 1::2][:, :(nx-2)//2] (one XLA pass)
    instead of interior-slice + _cc_restrict_x + _cc_restrict_y over
    the full fine array, and the kernel writes ny/2 rows instead of ny.
    Requires even interior dims (ny, nx even) and ny % 16 == 0; raises
    ValueError when no feasible block exists (callers fall back to the
    XLA pair)."""
    ny, nx = pp.shape
    if ny % 16 != 0 or nx % 2 != 0:
        raise ValueError(f"emit_restrict needs ny%16==0, nx even; "
                         f"got {ny}x{nx}")
    if k > 14:
        # 16-granular starts pin out_lo to 16: the bottom margin must
        # cover the k-sweep + residual + pairing reach (k + 2 <= 16).
        raise ValueError(f"emit_restrict supports k <= 14, got {k}")
    nxp = -(-nx // 128) * 128
    halo = -(-(k + 2) // 16) * 16  # 16-granular starts (see _kernel_res)

    def vmem_model(bs):
        # two halo windows + the half m window + out + m blocks
        w_ = bs + 2 * halo
        return (2 * w_ + w_ // 2 + bs + bs // 2) * nxp * 4

    vmem_limit = None
    budget = 6_815_744
    bs = 256
    while bs >= 16 and (ny % bs != 0 or ny < bs + 2 * halo
                        or vmem_model(bs) > budget):
        bs //= 2
    if not interpret and nxp >= 4096:
        # Large-window mode: same calibrated scoped model as
        # jacobi_fused_k_res (6 live windows + outputs), with the m
        # window/block at half size.
        for cand in (256, 128, 64):
            if (cand > bs and ny % cand == 0 and ny >= cand + 2 * halo
                    and (6.5 * (cand + 2 * halo) + 1.5 * cand)
                    * nxp * 4 <= _LARGE_SCOPED_BUDGET):
                bs = cand
                vmem_limit = _LARGE_VMEM_LIMIT
                break
    if bs < 16:
        raise ValueError(f"no valid block size for ny={ny}, k={k}")
    nblocks = ny // bs
    w = bs + 2 * halo
    if nxp != nx:
        pad = ((0, 0), (0, nxp - nx))
        pp = jnp.pad(pp, pad)
        rhs = jnp.pad(rhs, pad)
    kern = functools.partial(
        _kernel_res, ny=ny, nx=nx, nxp=nxp, bs=bs, halo=halo, k=k,
        dx2=dx * dx, dy2=dy * dy, omega=omega, cavity=cavity,
        emit_res=False, emit_restrict=True)
    outs = pl.pallas_call(
        kern,
        grid=(nblocks,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs // 2, nxp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), pp.dtype),
                   jax.ShapeDtypeStruct((ny // 2, nxp), pp.dtype),
                   jax.ShapeDtypeStruct((nblocks, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((w, nxp), pp.dtype),
            pltpu.VMEM((w, nxp), rhs.dtype),
            pltpu.VMEM((w // 2, nxp), pp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pp, rhs)
    out, m, err = outs
    if nxp != nx:
        out = out[:, :nx]
    return out, m, jnp.max(err)


def _kernel_corr(pp_hbm, rhs_hbm, rowx_hbm, out_ref, err_ref, pmax_ref,
                 pp_win, rhs_win, rw_win, d_win, corr_win, sem, *, ny,
                 nx, nxp, bs, halo, k, dx2, dy2, omega, cavity, ncy,
                 hr):
    """Round-4 post-smooth fusion (VERDICT r3 item 1): add the
    coarse-grid correction -- supplied as the HALF-HEIGHT x-prolonged
    intermediate `rowx` (ops.poisson._cc_prolong_x output, zero-padded
    one column left so fine col c reads rowx[:, c]) -- then run the k
    damped BC-folded sweeps and emit p' + the exit metric max|r|.
    Replaces the XLA y-prolong + pad + add + bc full-fine-level passes
    of the aligned cycle's correction step.

    The y pass IS _cc_prolong's even case: fine rows (2T+1, 2T+2) =
    (0.75 row[T] + 0.25 row[T-1 clamp], 0.75 row[T] + 0.25 row[T+1
    clamp]), built with the sublane interleave (the one Mosaic
    lowers), shifted one row by a roll so the window extraction DMA
    start stays 8-aligned, and masked to the interior (the ring ring
    rows/cols of pad(e_int, 1) are zero). BC-consistency of the input
    is NOT required after the add: the folded sweeps never read the
    ring, and the final BC refresh reproduces bc(p + e) exactly
    (the founding fold equivalence)."""
    i = pl.program_id(0)
    w = bs + 2 * halo
    wr = w // 2 + 16
    row0 = i * bs
    start = pl.multiple_of(
        jnp.clip(((row0 - (k + 1)) // 8) * 8, 0, ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)
    # Coarse-row window: covers T in [start/2 - 1, start/2 + w/2 - 1]
    # with 8-aligned slack on both sides.
    rx = pl.multiple_of(
        jnp.clip(((start // 2 - 8) // 8) * 8, 0, hr - wr), 8)

    cp1 = pltpu.make_async_copy(pp_hbm.at[pl.ds(start, w), :], pp_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp3 = pltpu.make_async_copy(rowx_hbm.at[pl.ds(rx, wr), :], rw_win,
                                sem.at[2])
    cp1.start()
    cp2.start()
    cp3.start()
    cp1.wait()
    cp2.wait()
    cp3.wait()

    gr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    gc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    interior_r = (gr >= 1) & (gr <= ny - 2)
    interior_c = (gc >= 1) & (gc <= nx - 2)
    owned_r = interior_r & (gr >= row0) & (gr < row0 + bs)

    # y-prolong of the correction: evr/odr at coarse rows, interleaved
    # to fine rows, rolled down one row so D2[d] <-> fine row
    # 2*rx + d, then the (start - 2*rx)-offset window extracted by a
    # local DMA (8-aligned by construction).
    gT = rx + lax.broadcasted_iota(jnp.int32, (wr, 1), 0)
    rw = rw_win[:]
    dnv = jnp.where(gT == 0, rw, pltpu.roll(rw, 1, 0))
    upv = jnp.where(gT == ncy - 1, rw, pltpu.roll(rw, wr - 1, 0))
    evr = 0.75 * rw + 0.25 * dnv
    odr = 0.75 * rw + 0.25 * upv
    D = jnp.stack([evr, odr], axis=1).reshape(2 * wr, nxp)
    d_win[:] = pltpu.roll(D, 1, 0)
    off_d = pl.multiple_of(start - 2 * rx, 8)
    ext_cp = pltpu.make_async_copy(d_win.at[pl.ds(off_d, w), :],
                                   corr_win, sem.at[2])
    ext_cp.start()
    ext_cp.wait()
    corr = jnp.where(interior_r & interior_c, corr_win[:], 0.0)
    pp_win[:] = pp_win[:] + corr

    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    bx = jnp.float32(1.0 / dx2)
    by = jnp.float32(1.0 / dy2)
    rhs_s = ar * rhs_win[:]

    def north(a):
        return pltpu.roll(a, w - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def east(a):
        return pltpu.roll(a, nxp - 1, 1)

    def west(a):
        return pltpu.roll(a, 1, 1)

    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2

    def folded(pp):
        E = east(pp)
        W = west(pp)
        N = north(pp)
        S = south(pp)
        S = jnp.where(adj_bot, pp, S)
        N = jnp.where(adj_top, pp, N)
        W = jnp.where(adj_left, pp, W)
        E = (jnp.where(adj_right, pp, E) if cavity
             else jnp.where(adj_right, 0.0, E))
        return E, W, N, S

    def iterate(_, c):
        pp = pp_win[:]
        E, W, N, S = folded(pp)
        pp_win[:] = ax * (E + W) + ay * (N + S) + ac * pp - rhs_s
        return c

    lax.fori_loop(0, k, iterate, 0)
    pp = pp_win[:]
    E, W, N, S = folded(pp)
    r = rhs_win[:] - (bx * (E + W) + by * (N + S) - denom * pp)
    err = jnp.max(jnp.where(owned_r & interior_c, jnp.abs(r), 0.0))
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    pp = jnp.where(is_bot, north(pp), pp)
    pp = jnp.where(is_top, south(pp), pp)
    pp = jnp.where(is_left, east(pp), pp)
    if cavity:
        pp = jnp.where(is_right, west(pp), pp)
        pp = jnp.where(is_bot & is_left, 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    pp_win[:] = pp
    # max|p'| over owned rows (post-BC, real lanes only): feeds the
    # f32-noise-floor exit (ops.poisson._mgp_noise_floor) for free --
    # max is an exact reduction, so the per-cycle full-array XLA max
    # pass this replaces computed the identical value.
    owned_rows = (gr >= row0) & (gr < row0 + bs)
    pmax_ref[i, 0] = jnp.max(
        jnp.where(owned_rows & (gc <= nx - 1), jnp.abs(pp), 0.0))
    out_cp = pltpu.make_async_copy(pp_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()
    err_ref[i, 0] = err


def jacobi_fused_k_corr(pp: jnp.ndarray, rhs: jnp.ndarray,
                        rowx: jnp.ndarray, dx: float, dy: float,
                        omega: float, k: int, interpret: bool = False,
                        cavity: bool = False):
    """Correction add (y pass in-window from the half-height
    x-prolonged `rowx`) + K fused damped sweeps + exit metric in ONE
    launch -- the round-4 post-smooth position of the aligned MGP
    cycle. ``rowx`` must be (ny//2, >= nx) with _cc_prolong_x's output
    at columns 1..nx-2 (one zero column left, zero rows beyond the
    (ny-2)//2 coarse rows). Returns (p', max|r|). Raises ValueError
    when no feasible block exists (callers fall back to the XLA
    prolong + add + bc + smooth chain)."""
    ny, nx = pp.shape
    if ny % 16 != 0 or nx % 2 != 0:
        raise ValueError(f"fused corr needs ny%16==0, nx even; "
                         f"got {ny}x{nx}")
    nxp = -(-nx // 128) * 128
    if rowx.shape[0] != ny // 2 or rowx.shape[1] < nx - 1:
        raise ValueError(f"rowx must be ({ny // 2}, >= {nx - 1}), "
                         f"got {rowx.shape}")
    ncy = (ny - 2) // 2
    hr = ny // 2
    halo = _halo8(k + 1)

    def vmem_model(bs):
        w_ = bs + 2 * halo
        wr_ = w_ // 2 + 16
        return (2 * w_ + wr_ + 2 * wr_ + w_ + bs) * nxp * 4

    vmem_limit = None
    budget = 6_815_744
    bs = 256
    while bs >= 16 and (ny % bs != 0 or ny < bs + 2 * halo + 32
                        or vmem_model(bs) > budget):
        bs //= 2
    if not interpret and nxp >= 4096:
        for cand in (256, 128, 64):
            w_ = cand + 2 * halo
            # calibrated scoped model: 6 live full windows + the
            # half-height prolong buffers (rw + D + corr ~ 2.5 w)
            if (cand > bs and ny % cand == 0 and ny >= w_ + 32
                    and (8.5 * w_ + cand) * nxp * 4
                    <= _LARGE_SCOPED_BUDGET):
                bs = cand
                vmem_limit = _LARGE_VMEM_LIMIT
                break
    if bs < 16:
        raise ValueError(f"no valid block size for ny={ny}, k={k}")
    nblocks = ny // bs
    w = bs + 2 * halo
    wr = w // 2 + 16
    if hr < wr:
        raise ValueError(f"rowx height {hr} < window {wr}")
    if nxp != nx:
        pad = ((0, 0), (0, nxp - nx))
        pp = jnp.pad(pp, pad)
        rhs = jnp.pad(rhs, pad)
    if rowx.shape[1] != nxp:
        if rowx.shape[1] > nxp:
            raise ValueError("rowx wider than the padded lane width")
        rowx = jnp.pad(rowx, ((0, 0), (0, nxp - rowx.shape[1])))
    kern = functools.partial(
        _kernel_corr, ny=ny, nx=nx, nxp=nxp, bs=bs, halo=halo, k=k,
        dx2=dx * dx, dy2=dy * dy, omega=omega, cavity=cavity,
        ncy=ncy, hr=hr)
    outs = pl.pallas_call(
        kern,
        grid=(nblocks,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[
            pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), pp.dtype),
                   jax.ShapeDtypeStruct((nblocks, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nblocks, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((w, nxp), pp.dtype),
            pltpu.VMEM((w, nxp), rhs.dtype),
            pltpu.VMEM((wr, nxp), pp.dtype),
            pltpu.VMEM((2 * wr, nxp), pp.dtype),
            pltpu.VMEM((w, nxp), pp.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(pp, rhs, rowx)
    out, err, pmax = outs
    if nxp != nx:
        out = out[:, :nx]
    return out, jnp.max(err), jnp.max(pmax)


COL_HALO = 128  # lane-tile-aligned column halo for the 2-D tiling


def _kernel2d(pp_hbm, rhs_hbm, out_ref, err_ref, pp_win, rhs_win, sem,
              *, ny, nx, nxp, bs, bsx, halo, k, ncb, dx2, dy2, omega,
              cavity):
    """2-D (row x column) tile variant for wide grids where full-width
    row blocks would not fit VMEM. Same numerics as _kernel; column
    windows carry a fixed 128-lane halo (>= K, so validity shrinkage
    never reaches the owned tile)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = bs + 2 * halo
    cw = bsx + 2 * COL_HALO
    row0 = i * bs
    col0 = j * bsx
    start = pl.multiple_of(jnp.clip(((row0 - k) // 8) * 8, 0, ny - w), 8)
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

    # 1-D masks only: every row predicate is a (w, 1) vector and every
    # column predicate a (1, cw) vector, broadcast at the use site.
    # The earlier (w, cw) iotas + booleans each counted as a full
    # window-sized buffer in Mosaic's scoped-VMEM accounting (~12
    # window-equivalents), which is what pinned the window budget far
    # below the 16 MB limit and forced small, redundancy-heavy tiles.
    gr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    gc = cstart + lax.broadcasted_iota(jnp.int32, (1, cw), 1)
    owned_r = ((gr >= jnp.maximum(1, row0))
               & (gr <= jnp.minimum(ny - 2, row0 + bs - 1)))
    owned_c = ((gc >= jnp.maximum(1, col0))
               & (gc <= jnp.minimum(nx - 2, col0 + bsx - 1)))
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    # Scale rhs in place: a separate scaled copy would stay live across
    # the whole sweep loop (one more window against the scoped budget).
    rhs_win[:] = ar * rhs_win[:]

    # Boundary-read folding: interior cells adjacent to a Neumann
    # boundary read their own value there (the per-iteration BC would
    # have copied it), and the Dirichlet outlet reads 0 -- so boundary
    # cells are never READ during the sweeps and their refresh runs
    # once per launch instead of once per iteration (saves ~4 lane/
    # sublane rolls per iteration; bitwise-identical for BC-consistent
    # p' input, which the solver always supplies -- p' is either zero
    # or the previous solve's post-BC output).
    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2

    def iterate(want_err, fold_rows=True, fold_cols=True):
        pp = pp_win[:]
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
        new = ax * (E + W) + ay * (N + S) + ac * pp - rhs_win[:]
        err = (jnp.max(jnp.where(owned_r & owned_c,
                                 jnp.abs(new - pp), 0.0))
               if want_err else jnp.float32(0.0))
        pp_win[:] = new
        return err

    # Interior-window specialization (see _kernel): drop the row
    # and/or column boundary-fold selects when the window provably
    # contains no boundary-adjacent rows/columns. 2x2 pl.when variants;
    # the final error-reporting iteration keeps the full form.
    inner_rows = jnp.logical_and(start >= 2, start + w <= ny - 2)
    inner_cols = jnp.logical_and(cstart >= 2, cstart + cw <= nx - 2)
    for fr in (False, True):
        for fc in (False, True):
            sel = jnp.logical_and(
                inner_rows if not fr else jnp.logical_not(inner_rows),
                inner_cols if not fc else jnp.logical_not(inner_cols))

            @pl.when(sel)
            def _(fr=fr, fc=fc):
                lax.fori_loop(
                    0, k - 1,
                    lambda _, c, fr=fr, fc=fc:
                        (iterate(False, fold_rows=fr, fold_cols=fc), c)[1],
                    0)

    err = iterate(True)
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
    err_ref[i * ncb + j, 0] = err


def _compiler_params(vmem_limit):
    if vmem_limit is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(vmem_limit))


# Round-3 large-window mode (docs/PERF.md): raising Mosaic's scoped-VMEM
# limit via CompilerParams admits FULL-WIDTH 1-D row blocks on wide
# grids, eliminating the 2-D tiling's column-halo redundancy (1.41-1.69x
# window re-reads -> 1.06-1.25x). The scoped-cost model calibrated on
# v5e is (6w + bs) * nxp * 4 bytes -- two windows + the output block +
# ~4 window-sized live temporaries of the sweep body: bs=256 at 8192
# lanes (65 MB) compiles and runs 24.7 ms/50-iter solve vs the 2-D
# tiling's 32.7; bs=512 (124 MB) is rejected by the toolchain.
_LARGE_VMEM_LIMIT = 100 * 1024 * 1024
_LARGE_SCOPED_BUDGET = 96 * 1024 * 1024


def _large_window_bs(ny: int, nxp: int, halo: int):
    """Largest full-width row-block size the calibrated scoped model
    admits (None if none fits)."""
    for bs in (512, 256, 128, 64):
        if (ny % bs == 0 and ny >= bs + 2 * halo
                and (6 * (bs + 2 * halo) + bs) * nxp * 4
                <= _LARGE_SCOPED_BUDGET):
            return bs
    return None


def _fused_k_2d(pp, rhs, dx, dy, omega, k, bs, bsx, nx, interpret,
                cavity=False, vmem_limit=None):
    """Launch the 2-D tile kernel (pp/rhs already width-padded; nx is
    the logical width for the BC/interior masks)."""
    ny, nxp = pp.shape
    halo = _halo8(k)
    nrb, ncb = ny // bs, nxp // bsx
    w = bs + 2 * halo
    cw = bsx + 2 * COL_HALO
    kern = functools.partial(
        _kernel2d, ny=ny, nx=nx, nxp=nxp, bs=bs, bsx=bsx,
        halo=halo, k=k, ncb=ncb, dx2=dx * dx, dy2=dy * dy, omega=omega,
        cavity=cavity)
    nblocks = nrb * ncb
    return pl.pallas_call(
        kern,
        grid=(nrb, ncb),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((bs, bsx), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nblocks, 1), lambda i, j: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ny, nxp), pp.dtype),
                   jax.ShapeDtypeStruct((nblocks, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((w, cw), pp.dtype),
            pltpu.VMEM((w, cw), rhs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pp, rhs)


def jacobi_fused_k(pp: jnp.ndarray, rhs: jnp.ndarray, dx: float, dy: float,
                   omega: float, k: int, block_rows: int = 256,
                   interpret: bool = False, cavity: bool = False,
                   deep: bool = True, window_budget: int = None,
                   vmem_limit: int = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K fused Jacobi iterations. Returns (p', last-iteration max error).

    Requires ny % block_rows == 0 and ny >= block_rows + 2k (the caller
    falls back to the jnp path otherwise).

    ``deep``: the launch sits under outer-corrector-round control flow
    (scan -> substep while -> rounds while). Mosaic's 16M scoped-vmem
    accounting stacks across nested regions, so the deepest context
    affords a smaller window budget (docs/PERF.md item 7b); False
    (rounds == 0 -- the fast-mode shape) allows the larger 1-D window
    that measures ~15% faster at 4096^2.
    """
    ny, nx = pp.shape
    if ny % 8 != 0:
        raise ValueError(f"ny={ny} must be a multiple of 8")
    # HBM slices along lanes must be 128-aligned; pad the width (the
    # logical interior/BC masks still use nx, so padded columns are
    # inert junk that valid cells never read).
    nxp = -(-nx // 128) * 128
    use_2d = False
    # Single-block criterion models the ~6 live window temporaries of
    # the iterate body too: Mosaic's scoped-VMEM limit counts them, and
    # 2 buffers alone under-estimates (1024^2 compiled to >16M scoped).
    if 8 * ny * nxp * 4 <= 14 * 1024 * 1024:
        # Whole array fits comfortably in VMEM: single block, no halo,
        # no redundant compute.
        bs, halo, nblocks = ny, 0, 1
    elif (window_budget is None and vmem_limit is None and not deep
          and not interpret and nxp >= 4096
          and _large_window_bs(ny, nxp, _halo8(k)) is not None):
        # Large-window mode (see _LARGE_VMEM_LIMIT above): full-width
        # row blocks under the raised scoped limit. Gated to shallow
        # (fast-mode) compile contexts, where the model is calibrated;
        # deep contexts keep the conservative tiling. Measured v5e
        # 50-iter solve: 4096^2 6.6 -> 5.8 ms, 8192^2 32.7 -> 24.7,
        # 16384^2 129.9 -> 109.9 (tools/probe_jacobi_r3*.py).
        halo = _halo8(k)
        bs = _large_window_bs(ny, nxp, halo)
        nblocks = ny // bs
        vmem_limit = _LARGE_VMEM_LIMIT
        # At >= 16384 lanes even the large 1-D window caps at bs=128
        # (1.25x row redundancy); a 256 x nxp/2 large-window 2-D tile
        # fits the scoped model at 1.16x total redundancy and measured
        # 100.8 vs 107.4 ms for the 16384^2 50-iteration solve.
        bsx = nxp // 2
        if (bs < 256 and ny % 256 == 0 and ny >= 256 + 2 * halo
                and bsx % 128 == 0 and k <= COL_HALO
                and (6 * (256 + 2 * halo) * (bsx + 2 * COL_HALO)
                     + 256 * bsx) * 4 <= _LARGE_SCOPED_BUDGET):
            bs = 256
            use_2d = True
    else:
        halo = _halo8(k)
        # Window budget calibrated for the *in-program* compile context
        # (scans/while loops -- the production shape; a bare standalone
        # pallas_call of the largest configs can exceed the stricter
        # standalone scoped limit, see docs/PERF.md). Deep contexts
        # (under outer-round while loops) use the largest window
        # measured to fit Mosaic's 16M scoped-vmem limit at that depth:
        # 6,815,744 B (2048^2, bs=256) compiles there, while 7,340,032 B
        # (4096^2, bs=128) OOMs at 17.14M scoped -- scoped accounting
        # stacks across nested regions. Shallow (rounds == 0) contexts
        # keep the 7 MiB budget, where 7,340,032 B is measured good.
        # ``window_budget``/``vmem_limit``: the tuned large-window mode
        # (docs/PERF.md round 3) -- raising Mosaic's scoped-VMEM limit
        # via CompilerParams lets taller blocks cut the halo redundancy.
        if window_budget is not None:
            budget = window_budget
        else:
            budget = 6_815_744 if deep else 7 * 1024 * 1024

        def vmem_model(bs, bsx, ch):
            return (2 * (bs + 2 * halo) * (bsx + 2 * ch)
                    + bs * bsx) * 4

        bs = block_rows
        while bs >= 8 and (ny % bs != 0 or ny < bs + 2 * halo
                           or vmem_model(bs, nxp, 0) > budget):
            bs //= 2
        found_1d = bs >= 8
        # Wide grids force tiny row blocks (heavy redundant halo
        # compute) -- or, at 16384+ lanes, NO feasible full-width block
        # at all; split columns instead, keeping 128-row blocks
        # (see _kernel2d). Column tiles must evenly divide nxp AND be
        # 128-aligned (the DMA column starts assert multiple-of-128),
        # and the fixed 128-lane column halo must cover k iterations
        # of validity shrinkage.
        if ((not found_1d or bs < 128) and nxp >= 4096 and ny % 128 == 0
                and ny >= 128 + 2 * halo and k <= COL_HALO):
            bsx = nxp // 2
            while (bsx >= 256 and
                   (bsx % 128 != 0 or nxp % bsx != 0
                    or vmem_model(128, bsx, COL_HALO) > budget)):
                bsx //= 2
            if bsx >= 256 and bsx % 128 == 0 and nxp % bsx == 0:
                bs = 128
                use_2d = True
        if not use_2d and not found_1d:
            raise ValueError(f"no valid block size for ny={ny}, k={k}")
        nblocks = ny // bs
    w = bs + 2 * halo
    if nxp != nx:
        pad = ((0, 0), (0, nxp - nx))
        pp = jnp.pad(pp, pad)
        rhs = jnp.pad(rhs, pad)
    if use_2d:
        out, err = _fused_k_2d(pp, rhs, dx, dy, omega, k, bs, bsx, nx,
                               interpret, cavity=cavity,
                               vmem_limit=vmem_limit)
        if nxp != nx:
            out = out[:, :nx]
        return out, jnp.max(err)
    kern = functools.partial(
        _kernel, ny=ny, nx=nx, nxp=nxp, bs=bs, halo=halo, k=k,
        dx2=dx * dx, dy2=dy * dy, omega=omega, cavity=cavity)
    out, err = pl.pallas_call(
        kern,
        grid=(nblocks,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   # one whole-array SMEM block revisited by every
                   # program; each writes its own row
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


def jacobi_pallas(pp0: jnp.ndarray, rhs: jnp.ndarray, dx: float, dy: float,
                  omega: float, tol: float, iters: int, k: int = 10,
                  block_rows: int = 256, early_exit: bool = True,
                  interpret: bool = False, cavity: bool = False,
                  deep: bool = True):
    """Drop-in replacement for ops.poisson.jacobi on the throughput path.

    Runs iters//k fused launches plus one iters%k remainder launch, so
    exactly ``iters`` iterations execute; when ``early_exit``, the
    reference's convergence criterion is checked between launches (i.e.
    at K-iteration granularity -- documented fast-mode semantics; the
    remainder launch runs unconditionally last).
    Returns (p', last max error, iterations run).
    """
    n_full = iters // k
    rem = iters % k
    step = functools.partial(jacobi_fused_k, rhs=rhs, dx=dx, dy=dy,
                             omega=omega, k=k, block_rows=block_rows,
                             interpret=interpret, cavity=cavity, deep=deep)

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
        pp, err = jacobi_fused_k(pp, rhs, dx, dy, omega, rem,
                                 block_rows=block_rows, interpret=interpret,
                                 cavity=cavity, deep=deep)
        n_run = n_run + rem
    return pp, err, n_run


# ---------------------------------------------------------------------------
# Multigrid smoother variant: K *undamped* interior Jacobi sweeps with
# NO per-iteration BCs (ops.poisson._mg_smooth, index.html:1347-1369).
# Boundary cells are read by their interior neighbors and must keep
# their original values, so there is no boundary-read folding here --
# the interior select preserves them and the halo shrinks one ring per
# iteration exactly like the damped kernel.
# ---------------------------------------------------------------------------

def _kernel_mg(p_hbm, rhs_hbm, out_ref, p_win, rhs_win, sem,
               *, ny, nx, nxp, bs, halo, k, dx2, dy2):
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    start = pl.multiple_of(jnp.clip(((row0 - k) // 8) * 8, 0, ny - w), 8)
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
    gc = lax.broadcasted_iota(jnp.int32, (w, nxp), 1)
    interior = ((gr >= 1) & (gr <= ny - 2) & (gc >= 1) & (gc <= nx - 2))
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / (dx2 * denom))
    by = jnp.float32(1.0 / (dy2 * denom))
    br = jnp.float32(1.0 / denom)
    rhs = br * rhs_win[:]

    def body(_, c):
        p = p_win[:]
        update = (bx * (pltpu.roll(p, nxp - 1, 1) + pltpu.roll(p, 1, 1))
                  + by * (pltpu.roll(p, w - 1, 0) + pltpu.roll(p, 1, 0))
                  - rhs)
        p_win[:] = jnp.where(interior, update, p)
        return c

    lax.fori_loop(0, k, body, 0)
    out_cp = pltpu.make_async_copy(p_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    out_cp.wait()


def mg_smooth_pallas(p: jnp.ndarray, rhs: jnp.ndarray, dx: float,
                     dy: float, iterations: int, block_rows: int = 256,
                     interpret: bool = False):
    """Fused multigrid smoothing (drop-in for ops.poisson._mg_smooth on
    the fine levels). Returns the smoothed field."""
    ny, nx = p.shape
    nxp = -(-nx // 128) * 128
    bs, halo = _tile_mg(ny, nxp, iterations, block_rows)
    w = bs + 2 * halo
    if nxp != nx:
        pad = ((0, 0), (0, nxp - nx))
        p = jnp.pad(p, pad)
        rhs = jnp.pad(rhs, pad)
    kern = functools.partial(_kernel_mg, ny=ny, nx=nx, nxp=nxp, bs=bs,
                             halo=halo, k=iterations, dx2=dx * dx,
                             dy2=dy * dy)
    out = pl.pallas_call(
        kern,
        grid=(ny // bs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, nxp), p.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, nxp), p.dtype),
            pltpu.VMEM((w, nxp), rhs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p, rhs)
    return out[:, :nx] if nxp != nx else out


def _tile_mg(ny: int, nxp: int, k: int, block_rows: int):
    n_temps = 6
    limit = 14 * 1024 * 1024

    def fits(bs, halo):
        return ((2 + n_temps) * (bs + 2 * halo) + bs) * nxp * 4 <= limit

    if ny % 8 == 0 and fits(ny, 0):
        return ny, 0
    halo = _halo8(k)
    bs = block_rows
    while bs >= 8:
        if ny % bs == 0 and ny >= bs + 2 * halo and fits(bs, halo):
            return bs, halo
        bs //= 2
    raise ValueError(f"no mg-smooth tiling for ny={ny}, k={k}")


def mg_smooth_pallas_ok(ny: int, nx: int, k: int,
                        block_rows: int = 256) -> bool:
    if ny % 8 != 0 or k < 1:
        return False
    nxp = -(-nx // 128) * 128
    try:
        _tile_mg(ny, nxp, k, block_rows)
        return True
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# Sharded (multi-chip) variant: the same fused kernel operating on a
# halo-extended local block, with a traced global-row offset so the
# domain BC masks land on the right global rows. Used by
# shard.jacobi_shmap.jacobi_pallas_shmap inside shard_map; the ppermute
# halo exchange happens outside, between launches.
# ---------------------------------------------------------------------------

def _kernel_shard(off_ref, pp_hbm, rhs_hbm, out_ref, err_ref,
                  pp_win, rhs_win, sem,
                  *, gny, gnx, nx, nxp, ext_ny, bs, halo, k,
                  own_lo, own_hi, own_clo, own_chi,
                  dx2, dy2, omega, cavity):
    """Like _kernel, but rows (and, on the 2-D rows x cols tier,
    columns) are a window of the *global* array: global row =
    off_ref[0] + local row, global column = off_ref[1] + local column.
    ``own_lo:own_hi`` / ``own_clo:own_chi`` are the local rows/columns
    the shard actually owns (its exchanged halos are stale by the last
    fused iteration and are discarded by the caller). ``nx`` is the
    local array width, ``gnx`` the global one."""
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    start = pl.multiple_of(
        jnp.clip(((row0 - k) // 8) * 8, 0, ext_ny - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(pp_hbm.at[pl.ds(start, w), :], pp_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # 1-D masks (see _kernel2d): (w, 1) row / (1, nxp) col predicates.
    lr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)  # local row
    gr = off_ref[0] + lr                                     # global row
    lc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    gc = off_ref[1] + lc                                     # global col
    owned_r = ((gr >= 1) & (gr <= gny - 2) & (lr >= row0)
               & (lr < row0 + bs) & (lr >= own_lo) & (lr < own_hi))
    owned_c = ((gc >= 1) & (gc <= gnx - 2)
               & (lc >= own_clo) & (lc < own_chi))
    is_bot = gr == 0
    is_top = gr == gny - 1
    is_left = gc == 0
    is_right = gc == gnx - 1
    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    rhs_win[:] = ar * rhs_win[:]

    # Boundary-read folding: interior cells adjacent to a Neumann
    # boundary read their own value there (the per-iteration BC would
    # have copied it), and the Dirichlet outlet reads 0 -- so boundary
    # cells are never READ during the sweeps and their refresh runs
    # once per launch instead of once per iteration (saves ~4 lane/
    # sublane rolls per iteration; bitwise-identical for BC-consistent
    # p' input, which the solver always supplies -- p' is either zero
    # or the previous solve's post-BC output).
    adj_bot = gr == 1
    adj_top = gr == gny - 2
    adj_left = gc == 1
    adj_right = gc == gnx - 2

    def iterate(want_err, fold_rows=True):
        pp = pp_win[:]
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
        new = ax * (E + W) + ay * (N + S) + ac * pp - rhs_win[:]
        err = (jnp.max(jnp.where(owned_r & owned_c,
                                 jnp.abs(new - pp), 0.0))
               if want_err else jnp.float32(0.0))
        pp_win[:] = new
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


def jacobi_fused_k_shard(pp_ext: jnp.ndarray, rhs_ext: jnp.ndarray,
                         row_offset: jnp.ndarray, gny: int,
                         dx: float, dy: float, omega: float, k: int,
                         own_lo: int, own_hi: int,
                         block_rows: int = 256, interpret: bool = False,
                         cavity: bool = False, col_offset=None,
                         gnx: int = None, own_cols=None):
    """K fused iterations on a halo-extended (ext_ny, nx) local block
    whose row 0 is global row ``row_offset`` (traced scalar). Returns
    (updated ext block, max |delta| over owned rows).

    ``col_offset``/``gnx``/``own_cols`` (2-D rows x cols tier): the
    block is additionally a column block whose column 0 is global
    column ``col_offset`` of a ``gnx``-wide array; the error metric
    counts local columns in ``own_cols`` only."""
    ext_ny, nx = pp_ext.shape
    if gnx is None:
        gnx = nx
    if col_offset is None:
        col_offset = 0
    own_clo, own_chi = own_cols if own_cols is not None else (0, nx)
    if ext_ny % 8 != 0:
        raise ValueError(f"ext_ny={ext_ny} must be a multiple of 8")
    nxp = -(-nx // 128) * 128
    if 8 * ext_ny * nxp * 4 <= 14 * 1024 * 1024:
        bs, halo = ext_ny, 0
    else:
        halo = _halo8(k)
        budget = 7 * 1024 * 1024
        bs = block_rows
        while (ext_ny % bs != 0 or ext_ny < bs + 2 * halo
               or (2 * (bs + 2 * halo) + bs) * nxp * 4 > budget):
            bs //= 2
            if bs < 8:
                raise ValueError(f"no tile for ext_ny={ext_ny}, k={k}")
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


# ---------------------------------------------------------------------------
# Batched (vmap ensemble) variant: one program per SCENE, running the
# ENTIRE masked-convergence Jacobi solve in VMEM in a single launch.
#
# The 64-scene ensemble (SURVEY.md section 2.7; BASELINE config 5) runs
# the step under jax.vmap, where the XLA jnp path pays one full-batch
# HBM pass per iteration -- and mid-size working sets stream at the
# ~0.29 ms/pass elementwise floor (docs/PERF.md), so a 50-iteration
# solve costs ~15 ms regardless of arithmetic. Here each scene fits
# whole in VMEM (the gate requires it), so program b loads scene b
# once, runs all ``iters`` sweeps register-resident, and writes the
# result back: the entire batched pressure solve is ONE kernel launch.
#
# Semantics: exactly ops.poisson._masked_while at single-iteration
# granularity -- each scene freezes (stops updating, keeps its error)
# the iteration its own max interior |delta| drops below tol, matching
# an unbatched early-exit run per element (tests/test_sharding.py
# pins batched == unbatched). Converged scenes burn masked VPU sweeps
# until the loop bound, but those are HBM-free and the solve is
# launch-bound, not FLOP-bound, at ensemble scales.
#
# Boundary handling reuses the fused kernel's boundary-read folding
# (see _kernel): interior sweeps never read boundary cells, and the
# per-iteration p' BCs collapse to one application after the loop --
# bitwise-identical for BC-consistent p' input, which the solver
# always supplies.
# ---------------------------------------------------------------------------

def _kernel_batch(pp_ref, rhs_ref, out_ref, err_ref, n_ref, work,
                  *, ny, nx, nxp, iters, tol, omega, dx2, dy2, cavity):
    b = pl.program_id(0)
    work[:] = pp_ref[0]
    gr = lax.broadcasted_iota(jnp.int32, (ny, nxp), 0)
    gc = lax.broadcasted_iota(jnp.int32, (ny, nxp), 1)
    interior = ((gr >= 1) & (gr <= ny - 2) & (gc >= 1) & (gc <= nx - 2))
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    adj_bot = gr == 1
    adj_top = gr == ny - 2
    adj_left = gc == 1
    adj_right = gc == nx - 2
    denom = 2.0 / dx2 + 2.0 / dy2
    ax = jnp.float32(omega / (dx2 * denom))
    ay = jnp.float32(omega / (dy2 * denom))
    ar = jnp.float32(omega / denom)
    ac = jnp.float32(1.0 - omega)
    rhs = ar * rhs_ref[0]

    def north(a):
        return pltpu.roll(a, ny - 1, 0)

    def south(a):
        return pltpu.roll(a, 1, 0)

    def east(a):
        return pltpu.roll(a, nxp - 1, 1)

    def west(a):
        return pltpu.roll(a, 1, 1)

    def body(it, carry):
        err, done, n = carry
        pp = work[:]
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
        err2 = jnp.max(jnp.where(interior, jnp.abs(new - pp), 0.0))
        active = jnp.logical_not(done)
        work[:] = jnp.where(jnp.logical_and(interior, active), new, pp)
        err = jnp.where(done, err, err2)
        n = n + jnp.where(done, 0, 1).astype(jnp.int32)
        done = jnp.logical_or(done, err < tol)
        return err, done, n

    err, _, n = lax.fori_loop(
        0, iters, body,
        (jnp.float32(jnp.inf), jnp.asarray(False), jnp.int32(0)))
    # p' BCs once, rows then columns (corner order; model.rs:807-815).
    pp = work[:]
    pp = jnp.where(is_bot, north(pp), pp)
    pp = jnp.where(is_top, south(pp), pp)
    pp = jnp.where(is_left, east(pp), pp)
    if cavity:
        pp = jnp.where(is_right, west(pp), pp)
        pp = jnp.where(jnp.logical_and(is_bot, is_left), 0.0, pp)
    else:
        pp = jnp.where(is_right, 0.0, pp)
    out_ref[0] = pp
    err_ref[b, 0] = err
    n_ref[b, 0] = n


def jacobi_batch_ok(ny: int, nx: int) -> bool:
    """Gate: whole-scene-in-VMEM (2x-pipelined ins + out + work +
    ~5 live sweep temps against the 14 MB scoped window)."""
    if ny % 8 != 0 or ny < 3 or nx < 3:
        return False
    nxp = -(-nx // 128) * 128
    return 12 * ny * nxp * 4 <= 14 * 1024 * 1024


def jacobi_pallas_batch(pp0: jnp.ndarray, rhs: jnp.ndarray, dx: float,
                        dy: float, omega: float, tol: float, iters: int,
                        cavity: bool = False, interpret: bool = False):
    """Batched masked-convergence Jacobi solve: (B, ny, nx) fields,
    one launch. Returns (p' (B,ny,nx), err (B,), iterations (B,))."""
    B, ny, nx = pp0.shape
    nxp = -(-nx // 128) * 128
    if nxp != nx:
        pad = ((0, 0), (0, 0), (0, nxp - nx))
        pp0 = jnp.pad(pp0, pad)
        rhs = jnp.pad(rhs, pad)
    kern = functools.partial(_kernel_batch, ny=ny, nx=nx, nxp=nxp,
                             iters=iters, tol=tol, omega=omega,
                             dx2=dx * dx, dy2=dy * dy, cavity=cavity)
    out, err, n = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, ny, nxp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ny, nxp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, ny, nxp), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   # whole-array SMEM blocks revisited by every
                   # program; each writes its own row
                   pl.BlockSpec((B, 1), lambda b: (0, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((B, 1), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, ny, nxp), pp0.dtype),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((ny, nxp), pp0.dtype)],
        interpret=interpret,
    )(pp0, rhs)
    if nxp != nx:
        out = out[:, :, :nx]
    return out, err[:, 0], n[:, 0]


# ---------------------------------------------------------------------------
# Cell-centered coarse-level variant (MGP aligned hierarchy, round 3).
#
# The aligned V-cycle's coarse levels (ops.poisson._cc_sweeps /
# _cc_residual) ran as XLA passes; at 8192^2 the correction chain was
# ~20 ms of the ~28 ms cycle (tools/probe_mgp_phase_r3.py). This kernel
# runs k damped sweeps (+ optionally the residual) on the
# interior-unknown arrays in one launch: every cell is an unknown (no
# boundary ring), Neumann edges mirror (ghost = self), the east edge
# reads the 0-valued Dirichlet ghost, and the outlet diagonal carries
# the distance-aware fold (1 + dx/d)/dx^2 when the wall sits at
# d != dx from the last center (ops.poisson._cc_diag).
# ---------------------------------------------------------------------------

def _kernel_cc(pp_hbm, rhs_hbm, out_ref, *refs, ny, nx, nyp, nxp, bs,
               halo, k, dx2, dy2, omega, east_dirichlet, extra, emit_res):
    if emit_res:
        res_ref, pp_win, rhs_win, sem = refs
    else:
        pp_win, rhs_win, sem = refs
    i = pl.program_id(0)
    w = bs + 2 * halo
    row0 = i * bs
    # margin k (+1 when the fused residual reads one ring past the
    # k-sweep contamination depth; see _kernel_res)
    m = k + 1 if emit_res else k
    start = pl.multiple_of(
        jnp.clip(((row0 - m) // 8) * 8, 0, nyp - w), 8)
    out_lo = pl.multiple_of(row0 - start, 8)

    cp1 = pltpu.make_async_copy(pp_hbm.at[pl.ds(start, w), :], pp_win,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, w), :], rhs_win,
                                sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    gr = start + lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    gc = lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    is_bot = gr == 0
    is_top = gr == ny - 1
    is_left = gc == 0
    is_right = gc == nx - 1
    denom = 2.0 / dx2 + 2.0 / dy2
    bx = jnp.float32(1.0 / dx2)
    by = jnp.float32(1.0 / dy2)
    om = jnp.float32(omega)
    if extra:
        dg = jnp.where(is_right, jnp.float32(denom + extra),
                       jnp.float32(denom))
        inv_dg = 1.0 / dg
    else:
        dg = jnp.float32(denom)
        inv_dg = jnp.float32(1.0 / denom)

    def folded(pp):
        E = pltpu.roll(pp, nxp - 1, 1)
        W = pltpu.roll(pp, 1, 1)
        N = pltpu.roll(pp, w - 1, 0)
        S = pltpu.roll(pp, 1, 0)
        S = jnp.where(is_bot, pp, S)
        N = jnp.where(is_top, pp, N)
        W = jnp.where(is_left, pp, W)
        E = (jnp.where(is_right, 0.0, E) if east_dirichlet
             else jnp.where(is_right, pp, E))
        return E, W, N, S

    def iterate(fold_rows=True):
        pp = pp_win[:]
        E = pltpu.roll(pp, nxp - 1, 1)
        W = pltpu.roll(pp, 1, 1)
        N = pltpu.roll(pp, w - 1, 0)
        S = pltpu.roll(pp, 1, 0)
        if fold_rows:
            S = jnp.where(is_bot, pp, S)
            N = jnp.where(is_top, pp, N)
        W = jnp.where(is_left, pp, W)
        E = (jnp.where(is_right, 0.0, E) if east_dirichlet
             else jnp.where(is_right, pp, E))
        upd = (bx * (E + W) + by * (N + S) - rhs_win[:]) * inv_dg
        pp_win[:] = (1.0 - om) * pp + om * upd

    inner_rows = jnp.logical_and(start >= 1, start + w <= ny - 1)

    @pl.when(inner_rows)
    def _():
        lax.fori_loop(0, k, lambda _, c: (iterate(False), c)[1], 0)

    @pl.when(jnp.logical_not(inner_rows))
    def _():
        lax.fori_loop(0, k, lambda _, c: (iterate(True), c)[1], 0)

    if emit_res:
        pp = pp_win[:]
        E, W, N, S = folded(pp)
        rhs_win[:] = rhs_win[:] - (bx * (E + W) + by * (N + S) - dg * pp)
    out_cp = pltpu.make_async_copy(pp_win.at[pl.ds(out_lo, bs), :],
                                   out_ref, sem.at[0])
    out_cp.start()
    if emit_res:
        res_cp = pltpu.make_async_copy(rhs_win.at[pl.ds(out_lo, bs), :],
                                       res_ref, sem.at[1])
        res_cp.start()
        res_cp.wait()
    out_cp.wait()


def cc_sweeps_pallas(p: jnp.ndarray, rhs: jnp.ndarray, dx: float,
                     dy: float, omega: float, k: int,
                     east_dirichlet: bool, d_wall: float,
                     emit_res: bool = False, interpret: bool = False):
    """k damped sweeps on the cell-centered folded operator
    (ops.poisson._cc_sweeps semantics, reciprocal-multiplier
    arithmetic), optionally + the residual (ops.poisson._cc_residual)
    in the same launch. Returns (p', r | None). Odd sizes row-pad to a
    multiple of 8 (the mirror folds key on the LOGICAL edges, so pad
    rows are inert garbage the valid region never reads).
    Raises ValueError when no feasible block exists."""
    ny, nx = p.shape
    nyp = -(-ny // 8) * 8
    nxp = -(-nx // 128) * 128
    halo = _halo8(k + 1 if emit_res else k)
    n_out = 2 if emit_res else 1
    extra = 0.0
    if east_dirichlet and d_wall != dx:
        extra = (dx / d_wall - 1.0) / (dx * dx)

    def vmem_model(bs):
        return (2 * (bs + 2 * halo) * nxp + n_out * bs * nxp) * 4

    vmem_limit = None
    budget = 6_815_744
    bs = 256
    while bs >= 8 and (nyp % bs != 0 or nyp < bs + 2 * halo
                       or vmem_model(bs) > budget):
        bs //= 2
    if not interpret and nxp >= 4096:
        for cand in (256, 128, 64):
            if (cand > bs and nyp % cand == 0 and nyp >= cand + 2 * halo
                    and ((6 + n_out - 1) * (cand + 2 * halo)
                         + n_out * cand) * nxp * 4 <= _LARGE_SCOPED_BUDGET):
                bs = cand
                vmem_limit = _LARGE_VMEM_LIMIT
                break
    if bs < 8:
        raise ValueError(f"no valid cc block for ny={ny}, k={k}")
    nblocks = nyp // bs
    w = bs + 2 * halo
    if (nyp, nxp) != (ny, nx):
        pad = ((0, nyp - ny), (0, nxp - nx))
        p = jnp.pad(p, pad)
        rhs = jnp.pad(rhs, pad)
    kern = functools.partial(
        _kernel_cc, ny=ny, nx=nx, nyp=nyp, nxp=nxp, bs=bs, halo=halo,
        k=k, dx2=dx * dx, dy2=dy * dy, omega=omega,
        east_dirichlet=east_dirichlet, extra=extra, emit_res=emit_res)
    field_spec = pl.BlockSpec((bs, nxp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    field_shape = jax.ShapeDtypeStruct((nyp, nxp), p.dtype)
    outs = pl.pallas_call(
        kern,
        grid=(nblocks,),
        compiler_params=_compiler_params(vmem_limit),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[field_spec] * n_out,
        out_shape=[field_shape] * n_out,
        scratch_shapes=[
            pltpu.VMEM((w, nxp), p.dtype),
            pltpu.VMEM((w, nxp), rhs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p, rhs)
    if emit_res:
        out, res = outs
        return out[:ny, :nx], res[:ny, :nx]
    return outs[0][:ny, :nx], None
