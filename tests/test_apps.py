"""Smoke tests for the demo apps and web UI (tiny configs, CPU)."""
import json
import os
import tempfile
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest


def test_demo_cylinder_app():
    from cfd_demo_tpu.apps import demo_cylinder
    with tempfile.TemporaryDirectory() as d:
        ck = os.path.join(d, "ck.npz")
        assert demo_cylinder.main([
            "--nx", "48", "--ny", "24", "--steps", "4", "--chunk", "2",
            "--out", d, "--tracers", "--checkpoint", ck]) == 0
        assert os.path.exists(os.path.join(d, "cylinder_velocity.png"))
        assert os.path.exists(os.path.join(d, "frame_tracers.png"))
        assert os.path.exists(ck)
        # resume path
        assert demo_cylinder.main([
            "--nx", "48", "--ny", "24", "--steps", "2", "--chunk", "2",
            "--out", d, "--resume", ck]) == 0


def test_cavity_app():
    from cfd_demo_tpu.apps import cavity
    with tempfile.TemporaryDirectory() as d:
        assert cavity.main(["--n", "16", "--steps", "4", "--chunk", "2",
                            "--out", d]) == 0


def test_re_sweep_app():
    from cfd_demo_tpu.apps import re_sweep
    assert re_sweep.main(["--re", "100", "--steps", "4", "--chunk", "2",
                          "--nx", "32", "--ny", "16"]) == 0


def test_optimize_app():
    """Tiny inverse problem end-to-end: the Adam loop over the
    differentiable rollout must cut the loss (full recovery needs the
    default budget; this pins gradient flow + descent)."""
    import io
    from contextlib import redirect_stdout
    from cfd_demo_tpu.apps import optimize
    buf = io.StringIO()
    with redirect_stdout(buf):
        optimize.main(["--nx", "32", "--ny", "16", "--steps", "4",
                       "--iters", "8", "--jacobi-iters", "10",
                       "--lr", "0.2"])
    out = buf.getvalue()
    losses = [float(line.split("loss ")[1].split()[0])
              for line in out.splitlines() if line.startswith("iter")]
    assert len(losses) >= 2 and losses[-1] < losses[0]


def test_square_obstacle_app():
    from cfd_demo_tpu.apps import square_obstacle
    with tempfile.TemporaryDirectory() as d:
        assert square_obstacle.main(["--nx", "48", "--ny", "24",
                                     "--steps", "8", "--out", d]) == 0


def test_ensemble_app():
    from cfd_demo_tpu.apps import ensemble
    assert ensemble.main(["--batch", "2", "--nx", "32", "--ny", "16",
                          "--steps", "4", "--chunk", "2"]) == 0


def test_cd_curve_app():
    from cfd_demo_tpu.apps import cd_curve
    assert cd_curve.main(["--res", "20,100", "--nx", "48", "--ny", "24",
                          "--settle", "4", "--measure", "4",
                          "--chunk", "2"]) == 0


def test_web_server_endpoints():
    from http.server import ThreadingHTTPServer
    from cfd_demo_tpu.apps.web import server as websrv

    websrv.APP.nx, websrv.APP.ny = 48, 24
    srv = ThreadingHTTPServer(("127.0.0.1", 0), websrv.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def get(p):
        with urllib.request.urlopen(base + p, timeout=120) as r:
            return r.read()

    def post(p, body):
        req = urllib.request.Request(base + p,
                                     data=json.dumps(body).encode(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.read()

    try:
        assert b"cfd-demo-tpu" in get("/")
        post("/api/control", {"action": "start"})
        deadline = time.time() + 120
        while time.time() < deadline:
            st = json.loads(get("/api/state"))
            if st["running"] and st["history"]["step"]:
                break
            time.sleep(0.25)
        assert st["running"] and st["history"]["step"]
        # Live force diagnostics (driver forces=True in the web app).
        assert st["forces"] is not None and "cd" in st["forces"]
        frame = get("/api/frame?mode=velocity&tracers=1")
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"
        post("/api/params", {"dt": 0.003})
        # The frontend always sends flow_case; with the case UNCHANGED
        # the update must hot-swap through the driver, never restart
        # the run (regression: keying on key presence restarted -- and
        # fully recompiled -- on every Update click).
        h0 = websrv.APP.handle
        post("/api/params", {"dt": 0.004, "viscosity": 2e-6,
                             "inlet": 1.0, "scheme": "first",
                             "profile": "uniform", "solver": "jacobi",
                             "flow_case": "channel"})
        assert websrv.APP.handle is h0
        post("/api/params", {"flow_case": "cavity"})
        assert websrv.APP.handle is not h0  # grid family changed
        mesh = get("/api/mesh?feature=0.4&max_cell=2.0")
        assert mesh[:8] == b"\x89PNG\r\n\x1a\n"
        # Custom sketch tesselation (POST): L-shape with a square hole.
        custom = post("/api/mesh", {
            "feature": 0.3, "max_cell": 2.0,
            "outer": [[0, 0], [12, 0], [12, 4], [6, 4], [6, 10], [0, 10]],
            "holes": [[[2, 2], [4, 2], [4, 3.5], [2, 3.5]]]})
        assert custom[:8] == b"\x89PNG\r\n\x1a\n"
        # Invalid (self-intersecting bowtie) -> 400 with a message.
        try:
            post("/api/mesh", {"outer": [[0, 0], [4, 4], [4, 0], [0, 4]]})
            raise AssertionError("bowtie accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "intersect" in json.loads(e.read())["error"]
        # Uncapped hole rings would be a request-level DoS (O(N^2)
        # host-side self-intersection validation): must 400, not hang.
        try:
            import math as _m
            big = [[7 + _m.cos(2 * _m.pi * i / 65),
                    5 + _m.sin(2 * _m.pi * i / 65)] for i in range(65)]
            post("/api/mesh", {"outer": [[0, 0], [30, 0], [30, 10], [0, 10]],
                               "holes": [big]})
            raise AssertionError("oversized hole accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "hole vertices" in json.loads(e.read())["error"]
        post("/api/control", {"action": "pause"})
        post("/api/control", {"action": "reset"})
    finally:
        websrv.APP.stop()
        srv.shutdown()


def test_orbax_checkpoint_roundtrip():
    from cfd_demo_tpu import (Grid, Semantics, SimulationParams, make_scene,
                              make_step, solver_options_for)
    from cfd_demo_tpu.runtime import checkpoint
    scene = make_scene(Grid(nx=32, ny=16, lx=2, ly=1),
                       SimulationParams(dt=0.002, viscosity=1e-4),
                       solver_options_for(Semantics.RUST, ramp_up_steps=4))
    step = make_step(scene, donate=False)
    st = scene.init_state()
    for _ in range(3):
        st, _ = step(st)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck")
        checkpoint.save_orbax(p, st)
        st2 = checkpoint.load_orbax(p, scene.init_state())
    np.testing.assert_array_equal(np.asarray(st.u), np.asarray(st2.u))
    assert int(st2.step) == int(st.step)


def test_driver_nan_guard():
    """Failure detection: a blow-up must auto-pause, not spin on NaNs.

    (The CFL controller rescues even absurd dt/nu configs, so the NaN
    is injected directly into the running state.)"""
    import dataclasses
    import jax.numpy as jnp
    from cfd_demo_tpu import (Grid, Semantics, SimulationParams, make_scene,
                              solver_options_for)
    from cfd_demo_tpu.runtime.driver import run
    scene = make_scene(Grid(nx=32, ny=16, lx=1.0, ly=0.5),
                       SimulationParams(dt=0.002, viscosity=1e-4),
                       solver_options_for(Semantics.RUST, ramp_up_steps=2))
    h = run(scene)
    time.sleep(0.3)
    h.pause()
    # Wait until the worker OBSERVABLY pauses before injecting: under
    # full-suite load the in-flight step (fresh jit compile) can take
    # seconds, and its write-back would overwrite the injection. A
    # snapshot stamped paused=True proves the command drain ran after
    # the pause took effect and no step is in flight.
    deadline = time.time() + 120
    while time.time() < deadline:
        h.request_snapshot()
        time.sleep(0.1)
        snap = h.get_last_available_snapshot()
        if snap is not None and snap.paused:
            break
    else:
        raise AssertionError("worker never paused")
    h._state = dataclasses.replace(
        h._state, u=h._state.u.at[5, 5].set(jnp.nan))
    h.resume()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not h.diverged:
            time.sleep(0.1)
        assert h.diverged
        step_at_pause = None
        h.request_snapshot()
        time.sleep(0.5)
        snap = h.get_last_available_snapshot()
        assert snap is not None
        step_at_pause = snap.step
        time.sleep(0.5)
        h.request_snapshot()
        time.sleep(0.5)
        snap2 = h.get_last_available_snapshot()
        assert snap2.step == step_at_pause  # paused, not spinning
    finally:
        h.stop()


def test_web_frame_stream():
    """The /api/stream endpoint pushes multipart PNG frames at
    interactive rate (>= several parts while the sim steps), and each
    part is a well-formed PNG."""
    from http.server import ThreadingHTTPServer
    from cfd_demo_tpu.apps.web import server as websrv

    websrv.APP.nx, websrv.APP.ny = 48, 24
    srv = ThreadingHTTPServer(("127.0.0.1", 0), websrv.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(p, body):
        req = urllib.request.Request(base + p,
                                     data=json.dumps(body).encode(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.read()

    try:
        post("/api/control", {"action": "start"})
        # Wait for the first steps so snapshots exist.
        deadline = time.time() + 120
        while time.time() < deadline:
            with urllib.request.urlopen(base + "/api/state",
                                        timeout=120) as r:
                st = json.loads(r.read())
            if st["running"] and st["history"]["step"]:
                break
            time.sleep(0.25)
        with urllib.request.urlopen(
                base + "/api/stream?mode=velocity", timeout=120) as r:
            ctype = r.headers.get("Content-Type", "")
            assert "multipart/x-mixed-replace" in ctype
            buf = b""
            t0 = time.time()
            while buf.count(b"\x89PNG\r\n\x1a\n") < 3 and time.time() - t0 < 30:
                buf += r.read1(65536)
        n_frames = buf.count(b"\x89PNG\r\n\x1a\n")
        assert n_frames >= 3, f"only {n_frames} stream frames in 30s"
        assert b"--frame" in buf and b"Content-Type: image/png" in buf
    finally:
        # Clear module-level APP history so later tests' wait loops
        # don't see this run's records.
        try:
            post("/api/control", {"action": "reset"})
        except Exception:
            pass
        websrv.APP.stop()
        srv.shutdown()


def test_bench_pod_smoke():
    """The pod-scaling bench tool must stay runnable (it can only be
    perf-meaningful on real multi-chip hardware; --smoke validates the
    plumbing on the virtual CPU mesh)."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "tools/bench_pod.py", "--smoke",
         "--tier", "gspmd", "--mode", "strong"],
        capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-800:]
    rows = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    measured = [r for r in rows if "cell_updates_per_s" in r]
    assert len(measured) >= 2, rows
    assert any(r["devices"] == 8 for r in measured), rows


def test_web_server_autosave_resume(tmp_path):
    """--autosave/--resume: the server writes periodic checkpoints and
    a second server process resumes the run from the exact last step;
    resume applies only to the FIRST start (a UI reset must not reload
    the checkpoint it just discarded)."""
    from cfd_demo_tpu.apps.web import server as websrv
    from cfd_demo_tpu.runtime import checkpoint

    auto = str(tmp_path / "auto.npz")
    app = websrv.AppState(nx=48, ny=24)
    app.autosave_path = auto
    app.autosave_every = 2
    app.resume = True  # no file yet: must start fresh, not error
    app.start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline and app.handle.autosave_count < 1:
            time.sleep(0.05)
        assert app.handle.autosave_count >= 1
    finally:
        app.stop()  # final stop-save captures the exact last step
    saved = checkpoint.load(auto)
    saved_step = int(saved.step)
    assert saved_step > 0
    assert np.isfinite(np.asarray(saved.u)).all()

    # "process restart": a fresh AppState resumes from the autosave
    app2 = websrv.AppState(nx=48, ny=24)
    app2.autosave_path = auto
    app2.autosave_every = 2
    app2.resume = True
    app2.start()
    try:
        # initial_step is fixed at construction -- asserting on
        # _last_step here would race the already-running sim thread
        # (flaky on warm jit caches).
        assert app2.handle.initial_step == saved_step
        assert app2.handle._last_step >= saved_step
        assert app2.resume is False  # consumed by the first start
        # a user reset starts FRESH (does not reload the checkpoint)
        app2.start()
        assert app2.handle.initial_step == 0
    finally:
        app2.stop()


def test_rollout_autosave(tmp_path):
    """apps.common.rollout --autosave-every: atomic cadence saves,
    skipped on non-finite residuals (the last checkpoint on disk is
    always a good state)."""
    import dataclasses

    import jax.numpy as jnp

    from cfd_demo_tpu import (Cylinder, Grid, Semantics, SimulationParams,
                              make_scene, solver_options_for)
    from cfd_demo_tpu.apps.common import rollout
    from cfd_demo_tpu.runtime import checkpoint

    sc = make_scene(
        Grid(nx=48, ny=24, lx=4.0, ly=1.5,
             obstacles=(Cylinder(1.0, 0.75, 0.25),)),
        SimulationParams(dt=0.002, viscosity=1e-4),
        solver_options_for(Semantics.RUST, ramp_up_steps=5))
    ck = str(tmp_path / "ck.npz")
    state, rec = rollout(sc, sc.init_state(), steps=6, chunk=2,
                         autosave_path=ck, autosave_every=2)
    assert os.path.exists(ck)
    assert not os.path.exists(ck + ".tmp.npz")
    st = checkpoint.load(ck, template=sc.init_state())
    assert 2 <= int(st.step) <= 6
    assert np.isfinite(np.asarray(st.u)).all()

    # non-finite residuals: the cadence save must be skipped
    ck2 = str(tmp_path / "ck2.npz")
    bad = dataclasses.replace(sc.init_state(),
                              u=jnp.full((24, 49), jnp.nan, jnp.float32))
    rollout(sc, bad, steps=2, chunk=2,
            autosave_path=ck2, autosave_every=1)
    assert not os.path.exists(ck2)


def test_web_semantics_switch_live():
    """Round 3 (VERDICT r2 missing item 1): the JS-twin runtime
    semantics are reachable from the serving surface. Switching
    semantics on a LIVE run keeps the same handle (background
    compile-and-swap, no restart), the state reports the new mode, and
    the JS adaptive substep count becomes visible."""
    import urllib.request
    from http.server import ThreadingHTTPServer
    from cfd_demo_tpu import Semantics as _Sem, SimulationParams as _SP
    from cfd_demo_tpu.apps.web import server as websrv

    websrv.APP.nx, websrv.APP.ny = 48, 24
    # the module-global APP carries state across tests (an earlier test
    # may have left flow_case=cavity, which would force a restart here)
    websrv.APP.params = _SP(dt=0.005, viscosity=1e-6,
                            target_inlet_velocity=1.0)
    websrv.APP.semantics = _Sem.RUST
    websrv.APP.residual_dt_scaling = False
    srv = ThreadingHTTPServer(("127.0.0.1", 0), websrv.Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def get(p):
        with urllib.request.urlopen(base + p, timeout=120) as r:
            return r.read()

    def post(p, body):
        req = urllib.request.Request(base + p,
                                     data=json.dumps(body).encode(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.read()

    try:
        post("/api/control", {"action": "start"})
        deadline = time.time() + 120
        while time.time() < deadline:
            st = json.loads(get("/api/state"))
            if st["running"] and st["history"]["step"]:
                break
            time.sleep(0.25)
        assert st["params"]["semantics"] == "rust"
        h0 = websrv.APP.handle
        post("/api/params", {"flow_case": "channel", "semantics": "js",
                             "residual_dt_scaling": True})
        assert websrv.APP.handle is h0  # no restart: live swap
        from cfd_demo_tpu import Semantics
        deadline = time.time() + 120
        ok = False
        while time.time() < deadline:
            st = json.loads(get("/api/state"))
            if (st["params"]["semantics"] == "js"
                    and h0._scene.opts.semantics == Semantics.JS
                    and st.get("substeps")):
                ok = True
                break
            time.sleep(0.25)
        assert ok, st
        assert h0.error is None
        assert st["params"]["residual_dt_scaling"] is True
        # the JS log line shows the adapting substep count
        assert any("substeps=" in line for line in st["log"])
        # switching back restarts nothing either
        post("/api/params", {"flow_case": "channel", "semantics": "rust"})
        assert websrv.APP.handle is h0
    finally:
        srv.shutdown()
        websrv.APP.stop()
