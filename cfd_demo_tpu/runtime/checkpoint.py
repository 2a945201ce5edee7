"""Checkpoint / resume.

The reference has no persistence (SURVEY.md section 5: closest
mechanisms are the visualization snapshot and pause/resume). This is a
deliberate superset: the full State pytree round-trips through a
single .npz (u, v, p, p_prime, scalars, counters), so long-horizon
runs (BASELINE config 3, Re sweep) can resume across processes.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.state import State

_FIELDS = ["u", "v", "p", "p_prime", "u_prev", "v_prev",
           "dt", "dt_user", "nu", "target_inlet",
           "t", "step", "substeps", "res_u", "res_v", "res_p"]


def save(path: str, state: State) -> None:
    arrays = {}
    for name in _FIELDS:
        val = getattr(state, name)
        if val is not None:
            arrays[name] = np.asarray(val)
    np.savez_compressed(path, **arrays)


def save_orbax(path: str, state: State) -> None:
    """Async-capable checkpoint via orbax (sharded-array aware: on a
    multi-chip mesh each host writes its shards). For production runs;
    the .npz path stays dependency-light."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, dataclasses_to_dict(state), force=True)
        ckptr.wait_until_finished()


def load_orbax(path: str, template: State) -> State:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, dataclasses_to_dict(template))
    return State(**{f: restored.get(f) for f in _FIELDS})


def dataclasses_to_dict(state: State):
    return {name: getattr(state, name) for name in _FIELDS
            if getattr(state, name) is not None}


def load(path: str, template: Optional[State] = None) -> State:
    """Restore a State. When ``template`` is given, dtypes/optional
    fields follow it (e.g. u_prev present only in JS semantics)."""
    with np.load(path) as data:
        kwargs = {}
        for name in _FIELDS:
            if name in data.files:
                kwargs[name] = jnp.asarray(data[name])
            else:
                kwargs[name] = None
        if template is not None:
            if template.u_prev is None:
                kwargs["u_prev"] = None
                kwargs["v_prev"] = None
            for name in _FIELDS:
                tval = getattr(template, name)
                if tval is not None and kwargs[name] is not None:
                    kwargs[name] = jnp.asarray(kwargs[name],
                                               getattr(tval, "dtype", None))
    return State(**kwargs)
