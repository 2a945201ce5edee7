#!/usr/bin/env python
"""Automated hardware evidence: prove the kernel suite + benches are
green at HEAD on the real chip, without manual steps.

Runs (on the TPU, detached-friendly):
  1. the hardware-only kernel equivalence suite (tests/test_pallas_tpu.py)
  2. the headline bench at 512^2 / 2048^2 fast mode and 2048^2
     reference mode (full Rust semantics)
  3. the bf16 lane-roll toolchain probe (docs/PERF.md item 7: Mosaic
     historically cannot lower dynamic_rotate on bf16 vectors; this
     re-checks automatically so the blocked optimization is retried
     every round)

and writes HARDWARE_EVIDENCE.json at the repo root with the date, HEAD
commit, and every result. Launch detached (NEVER under a short timeout
that could kill a remote compile):

    setsid python -u tools/hardware_evidence.py > /tmp/hw_evidence.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)


def run_pallas_suite() -> dict:
    env = dict(os.environ, CFD_TEST_PLATFORM="tpu")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_pallas_tpu.py",
         "-q", "--no-header"],
        cwd=ROOT, env=env, capture_output=True, text=True)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    return {"rc": proc.returncode, "summary": tail,
            "seconds": round(time.time() - t0, 1)}


def run_bench(n: int, mode: str, steps: int) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py", "--n", str(n), "--mode", mode,
         "--steps", str(steps)],
        cwd=ROOT, capture_output=True, text=True)
    out = {"rc": proc.returncode, "seconds": round(time.time() - t0, 1)}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            out.update(json.loads(line))
            break
        except json.JSONDecodeError:
            continue
    if proc.returncode != 0:
        out["stderr_tail"] = proc.stderr.strip().splitlines()[-3:]
    return out


def probe_bf16_roll() -> dict:
    """One-line toolchain probe: can Mosaic lower a bf16 lane roll
    (the heart of every fused sweep kernel)? docs/PERF.md item 7."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 1, 1)

    x = jnp.ones((8, 256), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16))(x)
        val = float(out.astype(jnp.float32)[0, 0])  # force completion
        return {"bf16_lane_roll": "UNBLOCKED", "value": val,
                "note": "revisit kernel-side bf16 (docs/PERF.md item 7)"}
    except Exception as e:  # noqa: BLE001 - record, don't crash evidence
        return {"bf16_lane_roll": "blocked",
                "error": f"{type(e).__name__}: {str(e)[:200]}"}


def probe_strided_lane() -> dict:
    """Toolchain probe (round 4, hardened round 5): can Mosaic lower a
    strided LANE read (x[:, 1::2])? It gates in-kernel x-restrict/
    x-prolong and the in-kernel SOR color compression (docs/PERF.md
    items 20-21); re-checked every round like the bf16 roll.

    Round 5 (VERDICT r4 item 4): the kernel body is first validated
    under ``interpret=True`` (probe bugs must not masquerade as
    toolchain limits), and a failure only classifies as "blocked" when
    the traceback originates in the Mosaic lowering/compile path.
    Probed formulations and their round-5 verdicts (tools/ probe run,
    2026-08-21): gather form x[:, 1::2] -> ValueError in
    _gather_lowering_rule (lowering.py); lax.slice strides=(1,2) ->
    VerificationError; lane reshape (8,128,2)[:, :, 1] -> MosaicError
    (remote compile 500). All three are lowering-path rejections."""
    import traceback

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, 1::2]

    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    spec = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    try:  # self-check: the body itself must be shape-consistent
        ref = pl.pallas_call(k, out_shape=spec, interpret=True)(x)
        import numpy as np
        assert np.array_equal(np.asarray(ref), np.asarray(x)[:, 1::2])
    except Exception as e:  # noqa: BLE001 - the PROBE is broken
        return {"strided_lane_read": "probe_bug",
                "error": f"interpret-mode failure: "
                         f"{type(e).__name__}: {str(e)[:200]}"}
    try:
        out = pl.pallas_call(k, out_shape=spec)(x)
        if float(out[0, 0]) != 1.0:
            return {"strided_lane_read": "probe_bug",
                    "error": f"wrong value {float(out[0, 0])} != 1.0"}
        return {"strided_lane_read": "UNBLOCKED",
                "value": float(out[0, 0]),
                "note": "revisit in-kernel x-restrict/x-prolong and "
                        "in-kernel SOR color compression"}
    except Exception as e:  # noqa: BLE001
        tb = "".join(traceback.format_exception(e))
        lowering = ("pallas/mosaic" in tb or "Mosaic" in type(e).__name__
                    or "mosaic" in str(e).lower())
        verdict = "blocked" if lowering else "probe_bug"
        return {"strided_lane_read": verdict,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
                "lowering_path": lowering}


def check_regressions(benches: dict, prev: dict) -> list:
    """Perf-regression tripwire (VERDICT r3 item 5): diff every bench
    metric against the PREVIOUS evidence file and flag >5% drops.
    docs/PERF.md pins ~5% as the day-to-day variance band (the 2048^2
    headline slid 2.176 -> 2.089e9 across two rounds with nothing
    watching); a flagged metric fails ``ok`` so a real routing
    regression cannot close a round silently. Set
    CFD_EVIDENCE_BASELINE=skip to bypass after an investigated,
    documented variance call."""
    if os.environ.get("CFD_EVIDENCE_BASELINE") == "skip":
        return []
    out = []
    # ADVICE r4: compare against the last CLEAN pass's numbers
    # (baseline_bench), not the last pass's -- a flagged drop must be
    # investigated (or explicitly skipped) before it becomes the
    # comparison point, and repeated <5%-per-round drift accumulates
    # against the clean baseline instead of resetting every round.
    prev_bench = ((prev or {}).get("baseline_bench")
                  or (prev or {}).get("bench", {}))
    for key, cur in benches.items():
        old = prev_bench.get(key, {})
        ov, nv = old.get("value"), cur.get("value")
        if not ov or not nv:
            continue
        if nv < 0.95 * ov:
            out.append({"bench": key, "prev": ov, "now": nv,
                        "ratio": round(nv / ov, 4),
                        "prev_head": prev.get("head", "?")})
    return out


def main():
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True).stdout.strip()
    # VERDICT r4 item 1: the evidence gate is only meaningful when the
    # recorded head IS the tree being measured. Refuse to run on a
    # dirty repo (HARDWARE_EVIDENCE.json itself excepted -- this tool
    # overwrites it) unless explicitly overridden for local debugging.
    dirty = [ln for ln in subprocess.run(
        ["git", "status", "--porcelain"], cwd=ROOT,
        capture_output=True, text=True).stdout.splitlines()
        if ln.strip() and not ln.endswith("HARDWARE_EVIDENCE.json")]
    if dirty and os.environ.get("CFD_EVIDENCE_ALLOW_DIRTY") != "1":
        print("hardware_evidence: repo dirty at launch -- commit first "
              "so the evidence head matches the measured tree "
              "(CFD_EVIDENCE_ALLOW_DIRTY=1 to override):", flush=True)
        for ln in dirty[:20]:
            print(" ", ln, flush=True)
        return 2
    import jax
    prev = {}
    path = os.path.join(ROOT, "HARDWARE_EVIDENCE.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
        except (OSError, json.JSONDecodeError):
            prev = {}
    evidence = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        "head": head,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    print("bf16 probe...", flush=True)
    evidence["bf16_probe"] = probe_bf16_roll()
    print(evidence["bf16_probe"], flush=True)
    print("strided-lane probe...", flush=True)
    evidence["strided_lane_probe"] = probe_strided_lane()
    print(evidence["strided_lane_probe"], flush=True)
    print("pallas hardware suite...", flush=True)
    evidence["test_pallas_tpu"] = run_pallas_suite()
    print(evidence["test_pallas_tpu"], flush=True)
    benches = {}
    # steps=0: bench.py auto-scales so device work dominates the fixed
    # ~20-30 ms axon call cost (at 512^2, 200 steps were still ~40%
    # tunnel overhead and the metric under-reported the chip by ~2x).
    # 8192^2 rows (round 4): the scale-out size all three solver
    # families now clear or approach 1e9 at; auto-steps = 100 -> one
    # ~4-6 s scan dispatch, far under the axon device-time wall.
    # 16384^2 production/sor rows (round 5, VERDICT r4 item 2): the
    # largest-size closings are tripwired like the 8192^2 ones; auto
    # steps = 100 -> ~27 s scan dispatches, far under the device-time
    # wall.
    for n, mode, steps in ((512, "fast", 0), (2048, "fast", 0),
                           (2048, "reference", 30),
                           (2048, "production", 200),
                           (8192, "fast", 0),
                           (8192, "production", 0),
                           (8192, "sor", 0),
                           (16384, "production", 0),
                           (16384, "sor", 0)):
        key = f"{n}_{mode}"
        print(f"bench {key}...", flush=True)
        benches[key] = run_bench(n, mode, steps)
        print(benches[key], flush=True)
    evidence["bench"] = benches
    regressions = check_regressions(benches, prev)
    evidence["regressions"] = regressions
    if regressions:
        print(f"PERF REGRESSION vs previous evidence: {regressions}",
              flush=True)
    # ADVICE r4: the stored comparison baseline only refreshes on a
    # CLEAN pass (or an explicit CFD_EVIDENCE_BASELINE=skip override);
    # a flagged regression keeps the last clean numbers as the bar.
    prev_baseline = (prev.get("baseline_bench") or prev.get("bench")
                     or {})
    evidence["baseline_bench"] = (
        {k: {"value": v["value"]} for k, v in benches.items()
         if v.get("value")} if not regressions else prev_baseline)
    # Drift watch (informational): per-metric all-time best; a >10%
    # shortfall vs best is printed but does not fail ok (day-to-day
    # variance vs an all-time-best day is wider than the 5% band).
    best = dict(prev.get("best_bench") or {})
    for k, v in benches.items():
        if v.get("value"):
            best[k] = max(best.get(k, 0.0), v["value"])
    evidence["best_bench"] = best
    for k, v in benches.items():
        if v.get("value") and best.get(k) and v["value"] < 0.9 * best[k]:
            print(f"DRIFT WATCH: {k} {v['value']:.3g} is >10% below "
                  f"all-time best {best[k]:.3g}", flush=True)
    ok = (evidence["test_pallas_tpu"]["rc"] == 0
          and all(b.get("rc") == 0 for b in benches.values())
          and not regressions)
    evidence["ok"] = ok
    with open(path, "w") as f:
        json.dump(evidence, f, indent=2)
        f.write("\n")
    print(f"wrote {path} ok={ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
