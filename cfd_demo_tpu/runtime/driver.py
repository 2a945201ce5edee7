"""Host driver: background simulation with the reference's control API.

Rebuild of the reference's control/runtime layer (SURVEY.md section
2.2): `Model::run()` spawns a thread wired with three mpsc channels
(model.rs:1282-1332); the UI-side `SimulationControlHandle` offers
stop/pause/resume/set_params/request_snapshot/latest-snapshot-drain/
residual-drain (model.rs:65-117).

TPU-native shape: the worker thread keeps dispatching the jit-compiled
step (device computation runs ahead asynchronously); a snapshot is a
device_get of (u, v, p) -- or, cheaper, an on-device rendered uint8
frame; commands are queue messages processed between steps. Changing
runtime scalars hot-swaps state fields (no recompile); changing
enums (scheme/solver/profile) rebuilds the compiled step once.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from ..core.config import SimulationParams
from ..core.state import State, set_params
from ..solver.piso import Scene, make_scene, make_step
from .log import ResidualHistory, Residuals


@dataclasses.dataclass
class SimSnapshot:
    """Deep-copied field snapshot (model.rs:36-42)."""

    u: np.ndarray
    v: np.ndarray
    p: np.ndarray
    dt: float
    step: int
    t: float
    paused: bool


class _Command:
    STOP = "stop"
    PAUSE = "pause"
    RESUME = "resume"
    SNAPSHOT = "snapshot"
    SET_PARAMS = "set_params"


class SimulationHandle:
    """Control endpoint (model.rs:65-117). Create via ``run()``."""

    def __init__(self, scene: Scene, state: Optional[State] = None,
                 tracers: bool = False, forces: bool = False):
        self._scene = scene
        self._state = state if state is not None else scene.init_state()
        self._forces_enabled = forces and bool(scene.grid.obstacles)
        if self._forces_enabled:
            from ..ops.forces import default_control_volume
            try:
                default_control_volume(scene.grid)
            except (ValueError, TypeError):
                # Tiny / wall-clipped / out-of-domain obstacles (or an
                # obstacle type the CV builder doesn't know) leave no
                # valid control volume; degrade to forces-off like the
                # obstacle-free case instead of dying at construction.
                self._forces_enabled = False
        self._step = self._build_step(scene)
        self._commands: "queue.Queue" = queue.Queue()
        self._snapshots: "queue.Queue" = queue.Queue()
        self._residuals: "queue.Queue" = queue.Queue()
        self.history = ResidualHistory()
        self._thread: Optional[threading.Thread] = None
        self._stopped = threading.Event()
        self.diverged = False
        self._tracers_enabled = tracers
        self._tracer_state = None
        self._tracer_step = None
        if tracers:
            self._init_tracers()

    def _build_step(self, scene: Scene):
        """jit step returning (state, diag, fx, fy); with forces
        enabled, the control-volume drag/lift is FUSED into the same
        dispatch (a second jit call per step would double the ~20 ms
        axon dispatch cost). fx/fy are None when disabled."""
        if not self._forces_enabled:
            base = make_step(scene, donate=False)

            def step_plain(state):
                s2, diag = base(state)
                return s2, diag, None, None

            return step_plain
        import jax
        from ..ops.forces import (control_volume_force,
                                  default_control_volume,
                                  physical_pressure)
        from ..solver.piso import step_fn
        cv = default_control_volume(scene.grid)

        def step(state):
            p_prev, u_prev, v_prev = state.p, state.u, state.v
            s2, diag = step_fn(scene, state)
            P = physical_pressure(p_prev, s2.p)
            fx, fy = control_volume_force(s2.u, s2.v, P, s2.nu,
                                          scene.grid, cv, u_prev=u_prev,
                                          v_prev=v_prev, dt=diag.dt)
            # The stored p is an unbounded accumulator (it grows
            # linearly at steady state and never feeds back into the
            # dynamics -- docs/SPEC.md); rebase it each step so the
            # float32 difference above keeps its mantissa bits over
            # arbitrarily long interactive runs. Semantics-neutral for
            # the flow; the UI's min-max colormap is shift-invariant.
            import dataclasses as _dc
            s2 = _dc.replace(s2, p=s2.p - jnp.mean(s2.p))
            return s2, diag, fx, fy

        jitted = jax.jit(step)

        def step_forces(state):
            s2, diag, fx, fy = jitted(state)
            return s2, diag, float(fx), float(fy)

        return step_forces

    def _init_tracers(self):
        import jax
        from ..ops import tracers as trc
        grid = self._scene.grid
        self._tracer_state = trc.init_tracers(grid)
        self._tracer_step = jax.jit(
            lambda ts, u, v, dt, k: trc.step_tracers(ts, u, v, grid, dt, k))

    def set_tracers(self, enabled: bool):
        """Enable/disable tracer particles (index.html tracer checkbox)."""
        self._tracers_enabled = enabled
        if enabled and self._tracer_state is None:
            self._init_tracers()
        if not enabled:
            self._tracer_state = None
            self._tracer_step = None

    @property
    def tracer_state(self):
        return self._tracer_state

    # --- lifecycle (model.rs:1282-1332) ---

    def start(self) -> "SimulationHandle":
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="cfd-sim")
        self._thread.start()
        return self

    def _loop(self):
        paused = False
        while not self._stopped.is_set():
            snapshot_sent = False
            # Drain all pending commands (model.rs:1291-1315); duplicate
            # snapshot requests are coalesced.
            while True:
                try:
                    cmd, arg = self._commands.get_nowait()
                except queue.Empty:
                    break
                if cmd == _Command.STOP:
                    self._stopped.set()
                elif cmd == _Command.PAUSE:
                    paused = True
                elif cmd == _Command.RESUME:
                    paused = False
                elif cmd == _Command.SET_PARAMS:
                    self._apply_params(arg)
                elif cmd == _Command.SNAPSHOT and not snapshot_sent:
                    self._snapshots.put(self._snapshot(paused))
                    snapshot_sent = True
            if self._stopped.is_set():
                break
            if paused:
                time.sleep(0.016)  # model.rs:1322
                continue
            t0 = time.perf_counter()
            self._state, diag, fx, fy = self._step(self._state)
            if self._tracers_enabled and self._tracer_state is not None:
                s = self._state
                self._tracer_state = self._tracer_step(
                    self._tracer_state, s.u, s.v, s.dt, s.step)
            # Failure detection (SURVEY.md section 5): the reference can
            # and does diverge numerically with nothing noticing; a
            # non-finite residual here auto-pauses instead of burning
            # the device on NaNs.
            import math as _math
            if not (_math.isfinite(float(diag.res_u))
                    and _math.isfinite(float(diag.res_p))):
                self.diverged = True
                paused = True
                print("cfd-demo-tpu: non-finite residual at step "
                      f"{int(diag.step)}; simulation auto-paused "
                      "(reduce dt or viscosity gradient)")
            rec = Residuals(
                simulation_step=int(diag.step),
                simulation_time=float(diag.t),
                dt=float(diag.dt),
                p=float(diag.res_p),
                u=float(diag.res_u),
                v=float(diag.res_v),
                step_time=time.perf_counter() - t0,
                piso_substeps=int(diag.substeps),
                fx=fx, fy=fy)
            self.history.push(rec)
            self._residuals.put(rec)

    def _apply_params(self, params: SimulationParams):
        """model.rs:1250-1257; enum changes rebuild the jit step."""
        enums_changed = (
            params.velocity_scheme != self._scene.params.velocity_scheme
            or params.pressure_solver != self._scene.params.pressure_solver
            or params.inlet_profile != self._scene.params.inlet_profile
            or params.flow_case != self._scene.params.flow_case)
        self._state = set_params(self._state, params)
        if enums_changed:
            self._scene = make_scene(self._scene.grid, params,
                                     self._scene.opts)
            self._step = self._build_step(self._scene)

    def _snapshot(self, paused: bool) -> SimSnapshot:
        s = self._state
        return SimSnapshot(
            u=np.asarray(s.u), v=np.asarray(s.v_full), p=np.asarray(s.p),
            dt=float(s.dt), step=int(s.step), t=float(s.t), paused=paused)

    # --- public control API (model.rs:65-117) ---

    def stop(self):
        self._commands.put((_Command.STOP, None))
        if self._thread is not None:
            self._thread.join(timeout=30)

    def pause(self):
        self._commands.put((_Command.PAUSE, None))

    def resume(self):
        self._commands.put((_Command.RESUME, None))

    def set_params(self, params: SimulationParams):
        self._commands.put((_Command.SET_PARAMS, params))

    def request_snapshot(self):
        self._commands.put((_Command.SNAPSHOT, None))

    def get_last_available_snapshot(self) -> Optional[SimSnapshot]:
        """Drain the snapshot queue, keep the latest (model.rs:76-86)."""
        last = None
        while True:
            try:
                last = self._snapshots.get_nowait()
            except queue.Empty:
                return last

    def get_new_log_messages(self) -> List[Residuals]:
        """Drain the residual queue (model.rs:88-98)."""
        out: List[Residuals] = []
        while True:
            try:
                out.append(self._residuals.get_nowait())
            except queue.Empty:
                return out


def run(scene: Scene, state: Optional[State] = None,
        tracers: bool = False, forces: bool = False) -> SimulationHandle:
    """Model::run equivalent: start stepping on a background thread and
    return the control handle."""
    return SimulationHandle(scene, state, tracers=tracers,
                            forces=forces).start()
