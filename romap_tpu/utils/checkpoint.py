"""Checkpoint/resume for the batched NeRF state (orbax).

The reference has NO checkpointing — NeRF params live in GPU memory and die
with the process (SURVEY.md §5); only meshes/renders are persisted. Here the
whole TrainState (params, EMA, optimizer moments, RNG keys, step counters)
plus the object table round-trips through orbax, so offline runs resume and
online mapping sessions can be snapshotted.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the base image
    _HAVE_ORBAX = False


def save_checkpoint(path: str, state, objects=None, extra: dict | None = None) -> None:
    """Write state (+ optional ObjectsState) to `path`; metadata (non-array)
    goes to a JSON sidecar (tensorstore only takes arrays)."""
    import json

    payload: dict[str, Any] = {"state": state}
    if objects is not None:
        payload["objects"] = objects._asdict()
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, jax.tree.map(np.asarray, payload), force=True)
    else:
        flat, treedef = jax.tree.flatten(jax.tree.map(np.asarray, payload))
        np.savez(path + ".npz", treedef=str(treedef), *flat)
    if extra:
        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)


def load_checkpoint(path: str) -> dict[str, Any]:
    """Read back the raw pytree (numpy leaves); caller re-wraps into
    TrainState/ObjectsState as needed. Sidecar metadata under key 'extra'."""
    import json

    path = os.path.abspath(path)
    if not (_HAVE_ORBAX and os.path.isdir(path)):
        raise FileNotFoundError(path)
    ckpt = ocp.PyTreeCheckpointer()
    out = dict(ckpt.restore(path))
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            out["extra"] = json.load(f)
    return out


def restore_train_state(raw_state: dict, template):
    """Rebuild a models.nerf.TrainState from a restored checkpoint dict.

    orbax restores as plain dicts/lists, so the structure (NamedTuples,
    optax states) is recovered by unflattening into `template`'s treedef —
    pass a freshly-initialized TrainState of the same config/capacity.
    """
    fields = {}
    for name in template._fields:  # per-field: dict key order != field order
        sub_t = getattr(template, name)
        fields[name] = jax.tree.unflatten(
            jax.tree.structure(sub_t), jax.tree.leaves(raw_state[name])
        )
    return type(template)(**fields)


def restore_objects(raw_objects: dict):
    from romap_tpu.models.nerf import ObjectsState

    import jax.numpy as jnp

    return ObjectsState(**{k: jnp.asarray(raw_objects[k]) for k in ObjectsState._fields})
