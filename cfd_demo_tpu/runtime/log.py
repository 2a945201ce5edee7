"""Residual records and history (observability).

Mirrors the reference's Residuals struct (model.rs:23-32: step, time,
dt, p/u/v residuals, wall step time, substep count) plus derived
throughput metrics, and the JS residual-graph history
(index.html:1111-1196) as plain arrays a front-end can plot.
"""
from __future__ import annotations

import dataclasses
import json
import math
from typing import List, Optional


@dataclasses.dataclass
class Residuals:
    simulation_step: int
    simulation_time: float
    dt: float
    p: float
    u: float
    v: float
    step_time: float            # seconds of wall clock
    piso_substeps: int
    # Optional force diagnostics (ops/forces.py; driver forces=True):
    # control-volume Fx/Fy on the scene's obstacles, None when off.
    fx: Optional[float] = None
    fy: Optional[float] = None

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.step_time if self.step_time > 0 else float("inf")

    def format_line(self) -> str:
        """UI log line (src/app.rs:438-448 formatting intent)."""
        line = (f"step {self.simulation_step:6d}  t={self.simulation_time:9.4f}  "
                f"dt={self.dt:.3e}  u={self.u:.3e}  v={self.v:.3e}  "
                f"p={self.p:.3e}  substeps={self.piso_substeps}  "
                f"wall={self.step_time * 1e3:.2f}ms")
        if self.fx is not None and self.fy is not None:
            line += f"  Fx={self.fx:+.3f} Fy={self.fy:+.3f}"
        return line

    def to_json(self) -> str:
        # json.dumps emits bare NaN/Infinity (invalid JSON) for
        # non-finite floats -- exactly what a diverged run produces;
        # map them to null like the web server's _finite does.
        def clean(x):
            if isinstance(x, float) and not math.isfinite(x):
                return None
            return x
        return json.dumps({k: clean(v)
                           for k, v in dataclasses.asdict(self).items()})


class ResidualHistory:
    """Bounded history for plotting (index.html residualHistory*)."""

    def __init__(self, max_len: int = 100_000):
        self.records: List[Residuals] = []
        self.max_len = max_len

    def push(self, r: Residuals) -> None:
        self.records.append(r)
        if len(self.records) > self.max_len:
            del self.records[: len(self.records) - self.max_len]

    def series(self, field: str):
        """(steps, values) for 'u' | 'v' | 'p' | 'dt'."""
        steps = [r.simulation_step for r in self.records]
        vals = [getattr(r, field) for r in self.records]
        return steps, vals

    def last(self) -> Optional[Residuals]:
        return self.records[-1] if self.records else None
