#!/usr/bin/env python
"""Round-5 probes (VERDICT r4 item 2): close the 16384^2 MGP/SOR 2-3%
gaps. Marginal in-scan protocol (L_SHORT vs L_LONG solve scans) like
tools/probe_sor_rb2.py; run detached, ONE AT A TIME on the chip:

    setsid python -u tools/probe_r5.py sor > /tmp/probe_r5_sor.log 2>&1 &
    echo $! > /tmp/probe_r5.pid

Sections:
  sor  -- 16384^2 fixed-50-iteration rb2 launch schedules: the k=12
          remainder launch (50 = 4*12 + 2) costs one extra full pass
          of window traffic; fold it into the last launches instead.
          Also attempts bs=256 (needs the scoped budget raised past
          the 96 MB large-window tier -- monkeypatched here; only
          productized if Mosaic accepts it AND it wins).
  mgp  -- 16384^2 MG_PRODUCTION phase attribution on the ROUND-4
          fused-restrict/corr cycle (probe_mgp_phase_r3.py predates
          it): vcycle, restrict launch, corr launch, coarse chain.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

N = int(os.environ.get("PROBE_N", "16384"))
L_SHORT = int(os.environ.get("PROBE_LS", "2"))
L_LONG = int(os.environ.get("PROBE_LL", "8"))


def timed(tag, fn, pp, rhs, reps=2):
    """Marginal ms per application of fn, in-scan (amortizes the axon
    per-call cost and isolates steady-state device work)."""
    import jax
    from jax import lax
    out = {"tag": tag}
    try:
        fns = {L: jax.jit(functools.partial(
            lambda p, r, L: lax.scan(lambda c, _: (fn(c, r), None),
                                     p, None, length=L)[0], L=L))
            for L in (L_SHORT, L_LONG)}
        ts = {}
        chk = None
        for L in (L_SHORT, L_LONG):
            o = fns[L](pp, rhs)
            if chk is None:
                import jax.numpy as jnp
                chk = float(jnp.sum(o[:64, :64]))
            else:
                float(o[5, 5])
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                o = fns[L](pp, rhs)
                float(o[5, 5])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            ts[L] = best
        ms = (ts[L_LONG] - ts[L_SHORT]) / (L_LONG - L_SHORT) * 1e3
        out.update(ok=True, ms=round(ms, 2), checksum=chk)
    except Exception as e:  # noqa: BLE001
        out.update(ok=False, error=f"{type(e).__name__}: {str(e)[:300]}")
    print(json.dumps(out), flush=True)
    return out


def sor_section():
    import jax
    import jax.numpy as jnp
    from cfd_demo_tpu.kernels import jacobi_pallas as jp
    from cfd_demo_tpu.kernels.sor_pallas import (sor_compress,
                                                 sor_decompress,
                                                 sor_fused_k_rb2,
                                                 sor_pallas_rb2)

    print("backend:", jax.default_backend(), "N:", N, flush=True)
    dx = 30.0 / N
    rng = np.random.default_rng(0)
    pp = jnp.asarray(rng.standard_normal((N, N)) * 0.1, jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)

    def sched(ks):
        def f(p, r):
            pr, pb = sor_compress(p)
            rr, rb = sor_compress(r)
            for k in ks:
                pr, pb, _ = sor_fused_k_rb2(pr, pb, rr, rb, N, dx, dx,
                                            1.5, k)
            return sor_decompress(pr, pb)
        return f

    def auto_k12(p, r):
        return sor_pallas_rb2(p, r, dx, dx, 1.5, 0.0, 50, k=12,
                              early_exit=False)[0]

    results = {}
    results["baseline_k12_rem2"] = timed("baseline k=12 (4x12+2)",
                                         auto_k12, pp, rhs)
    results["fold_last_14"] = timed("[12,12,12,14]",
                                    sched([12, 12, 12, 14]), pp, rhs)
    results["spread_13"] = timed("[13,13,12,12]",
                                 sched([13, 13, 12, 12]), pp, rhs)
    # bs=256 attempt: raise the large-window scoped budget so
    # _tile_rb2's bs loop accepts 256 (scoped model 116 MB at k=12).
    old_b, old_v = jp._LARGE_SCOPED_BUDGET, jp._LARGE_VMEM_LIMIT
    jp._LARGE_SCOPED_BUDGET = 120 * 1024 * 1024
    jp._LARGE_VMEM_LIMIT = 127 * 1024 * 1024
    try:
        results["bs256_fold_14"] = timed("bs=256 [12,12,12,14]",
                                         sched([12, 12, 12, 14]),
                                         pp, rhs)
        results["bs256_spread_13"] = timed("bs=256 [13,13,12,12]",
                                           sched([13, 13, 12, 12]),
                                           pp, rhs)
    finally:
        jp._LARGE_SCOPED_BUDGET, jp._LARGE_VMEM_LIMIT = old_b, old_v
    with open("/tmp/probe_r5_sor.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


def mgp_section():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from cfd_demo_tpu import Semantics, solver_options_for
    from cfd_demo_tpu.ops import poisson as P

    print("backend:", jax.default_backend(), "N:", N, flush=True)
    opts = solver_options_for(Semantics.RUST, outer_corrector_rounds=0)
    dx = dy = 30.0 / N
    rng = np.random.default_rng(0)
    pp = P._apply_pprime_bcs(
        jnp.asarray(rng.standard_normal((N, N)) * 0.1, jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
    bc = P._apply_pprime_bcs
    nu, omega = opts.mgp_smooth, opts.jacobi_omega
    print(f"mgp_smooth={nu} omega={omega}", flush=True)
    results = {}

    results["vcycle"] = timed(
        "aligned vcycle (fused r4 path)",
        lambda p, r: P._mgp_vcycle_aligned(p, r, dx, dy, opts, bc)[0],
        pp, rhs)

    from cfd_demo_tpu.kernels.jacobi_pallas import (jacobi_fused_k_corr,
                                                    jacobi_fused_k_restrict)
    results["restrict_launch"] = timed(
        "jacobi_fused_k_restrict",
        lambda p, r: jacobi_fused_k_restrict(p, r, dx, dy, omega, nu)[0],
        pp, rhs)

    ny = nx = N
    ncy, ncx = (ny - 2) // 2, (nx - 2) // 2
    e_c = jnp.asarray(rng.standard_normal((ncy, ncx)) * 0.01, jnp.float32)

    def corr_only(p, r):
        row = P._cc_prolong_x(e_c, nx - 2, True)
        rowp = jnp.pad(row, ((0, ny // 2 - ncy), (1, 0)))
        return jacobi_fused_k_corr(p, r, rowp, dx, dy, omega, nu)[0]

    results["corr_launch_with_prolongx"] = timed(
        "prolong_x + pad + jacobi_fused_k_corr", corr_only, pp, rhs)

    r_c = jnp.asarray(rng.standard_normal((ncy, ncx)), jnp.float32)

    def coarse_chain(p, r):
        e = P._cc_vcycle(r_c + p[0, 0], 2 * dx, 2 * dy, opts, True,
                         1.5 * dx)
        return p + e[0, 0]  # one full-array pass (~2.6 ms) of overhead

    results["coarse_cc_vcycle"] = timed(
        "_cc_vcycle at half size (incl. dummy dep)", coarse_chain,
        pp, rhs)
    with open("/tmp/probe_r5_mgp.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


def mgp2_section():
    """Coarse-chain attribution at N=16384 fine (first coarse level
    8191^2): the r5 first pass measured vcycle 88.45 = restrict 19.96
    + corr 33.18 + ~35.3 coarse+glue BY SUBTRACTION (the direct coarse
    probe hit HTTP 413: closure arrays bake into the HLO). This
    section passes everything as scan carries instead."""
    import jax
    import jax.numpy as jnp
    from cfd_demo_tpu import Semantics, solver_options_for
    from cfd_demo_tpu.ops import poisson as P

    print("backend:", jax.default_backend(), "N:", N, flush=True)
    opts = solver_options_for(Semantics.RUST, outer_corrector_rounds=0)
    dx = dy = 30.0 / N
    ncy = ncx = (N - 2) // 2
    rng = np.random.default_rng(0)
    rc = jnp.asarray(rng.standard_normal((ncy, ncx)), jnp.float32)
    dxc, dwc = 2 * dx, 1.5 * dx
    omega, nu = opts.jacobi_omega, opts.mgp_smooth
    results = {}

    results["cc_vcycle_full"] = timed(
        "_cc_vcycle @ 8191^2 (whole chain)",
        lambda c, r: P._cc_vcycle(c, dxc, dxc, opts, True, dwc), rc, rc)
    results["cc_sweeps_pre"] = timed(
        "_cc_sweeps_res_auto pre (nu sweeps + residual, incl. pads)",
        lambda c, r: P._cc_sweeps_res_auto(
            jnp.zeros_like(c), c, dxc, dxc, omega, nu, True, dwc, opts,
            need_res=True)[1], rc, rc)
    results["cc_sweeps_post"] = timed(
        "_cc_sweeps_res_auto post (no residual)",
        lambda c, r: P._cc_sweeps_res_auto(
            c, r, dxc, dxc, omega, nu, True, dwc, opts,
            need_res=False)[0], rc, rc)
    # XLA transfers at this level (restrict consumes the residual;
    # prolong produces the correction) -- each keeps the carry shape
    # with one extra full-level pass (add), noted in interpretation.
    results["cc_restrict"] = timed(
        "_cc_restrict + carry add",
        lambda c, r: c + P._cc_restrict(c)[0, 0], rc, rc)
    e_small = rc[:P._cc_coarse_size(ncy), :P._cc_coarse_size(ncx)]

    def prol(c, r):
        e = P._cc_prolong(c[:e_small.shape[0], :e_small.shape[1]],
                          ncy, ncx, True)
        return c + e
    results["cc_prolong"] = timed("_cc_prolong + carry add", prol,
                                  rc, rc)
    with open("/tmp/probe_r5_mgp2.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


def mgp3_section():
    """The fine-level coarsening slice at 16384^2: vcycle(88.45) minus
    measured parts (restrict 19.96 + corr-side 33.18 + cc_vcycle
    22.47) leaves ~12.8 ms for ONE strided lane slice
    r_c = lax.slice(m, (0,1), (ncy, 2ncx), strides=(1,2)) on the
    (8192, 16384) restricted residual -- ~10x its HBM floor. Probe
    alternative extraction forms (all share a +1 full-pass carry
    overhead)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend(), "N:", N, flush=True)
    hr, nxp = N // 2, N
    ncy = ncx = (N - 2) // 2
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.standard_normal((hr, nxp)) * 0.1, jnp.float32)

    def via(tag, f):
        return timed(tag, lambda c, r: c + f(c)[0, 0], m, m)

    results = {}
    results["strided_slice"] = via(
        "lax.slice strides (1,2) [current]",
        lambda c: lax.slice(c, (0, 1), (ncy, 2 * ncx), strides=(1, 2)))
    results["reshape_index"] = via(
        "reshape (hr, nxp//2, 2)[..., 1] + row/col slice",
        lambda c: c.reshape(hr, nxp // 2, 2)[:ncy, :ncx, 1])
    results["gather_1_2"] = via(
        "x[:, 1::2] numpy-style",
        lambda c: c[:ncy, 1::2][:, :ncx])
    results["dynslice_pair"] = via(
        "shift-add mask form (roll + even-lane reshape)",
        lambda c: (c + 0.0).reshape(hr, nxp // 2, 2)[:, :, 1][:ncy, :ncx])
    with open("/tmp/probe_r5_mgp3.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    sec = sys.argv[1] if len(sys.argv) > 1 else "sor"
    {"sor": sor_section, "mgp": mgp_section, "mgp2": mgp2_section, "mgp3": mgp3_section}[sec]()
