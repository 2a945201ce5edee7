"""Checkpoint / resume (incl. elastic resharding).

The reference has no persistence (SURVEY.md section 5: closest
mechanisms are the visualization snapshot and pause/resume). This is a
deliberate superset: the full State pytree round-trips through a
single .npz (u, v, p, p_prime, scalars, counters), so long-horizon
runs (BASELINE config 3, Re sweep) can resume across processes.

Elastic resume: both loaders accept a target ``mesh`` so a checkpoint
written under one device layout restores onto any other (different
device count, 1-D rows or 2-D rows x cols) -- the npz path reshards
via ``shard.mesh.shard_state``; the orbax path restores each shard
DIRECTLY into the target NamedSharding with no host-side gather, which
is the form that scales to multi-host pods.
"""
from __future__ import annotations

from typing import Optional

import jax
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


def load_orbax(path: str, template: State,
               mesh=None, axis: str = "y") -> State:
    """Restore a State; with ``mesh``, restore every field directly
    into its target NamedSharding (elastic resume across layouts --
    no host-side gather; each host reads only its shards)."""
    import orbax.checkpoint as ocp
    target = dataclasses_to_dict(template)
    if mesh is not None:
        from ..shard.mesh import _match, state_shardings
        sh = _match(state_shardings(mesh, axis), template)
        target = {
            name: jax.ShapeDtypeStruct(
                jnp.shape(val), jnp.asarray(val).dtype,
                sharding=getattr(sh, name))
            for name, val in target.items()}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    return State(**{f: restored.get(f) for f in _FIELDS})


def dataclasses_to_dict(state: State):
    return {name: getattr(state, name) for name in _FIELDS
            if getattr(state, name) is not None}


def load(path: str, template: Optional[State] = None,
         mesh=None, axis: str = "y") -> State:
    """Restore a State. When ``template`` is given, dtypes/optional
    fields follow it (e.g. u_prev present only in JS semantics).
    With ``mesh``, the restored state is sharded over that layout
    (elastic resume: the checkpoint's original layout is irrelevant --
    .npz stores plain host arrays)."""
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
    state = State(**kwargs)
    if mesh is not None:
        from ..shard.mesh import shard_state
        state = shard_state(state, mesh, axis)
    return state
