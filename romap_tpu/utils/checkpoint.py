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

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state, objects=None, extra: dict | None = None) -> None:
    """Write state (+ optional ObjectsState) to `path`; metadata (non-array)
    goes to a JSON sidecar (tensorstore only takes arrays)."""
    import json

    payload: dict[str, Any] = {"state": state}
    if objects is not None:
        payload["objects"] = objects._asdict()
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, jax.tree.map(np.asarray, payload), force=True)
    if extra:
        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)


def load_checkpoint(path: str) -> dict[str, Any]:
    """Read back the raw pytree (numpy leaves); caller re-wraps into
    TrainState/ObjectsState as needed. Sidecar metadata under key 'extra'."""
    import json

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    ckpt = ocp.PyTreeCheckpointer()
    out = dict(ckpt.restore(path))
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            out["extra"] = json.load(f)
    return out


def _conform(raw, t):
    """Rebuild orbax's plain dicts/lists into the structure of template node
    `t`, matching by NAME (dict key / NamedTuple field) rather than leaf
    order — orbax restores dicts key-sorted, which need not match the
    template treedef's flatten order."""
    if raw is None and not jax.tree.leaves(t):
        return t  # orbax stores empty containers (e.g. optax EmptyState) as None
    if isinstance(t, dict):
        return {k: _conform(raw[k], v) for k, v in t.items()}
    if hasattr(t, "_fields"):  # NamedTuple (TrainState, optax states)
        if isinstance(raw, dict):
            vals = [raw[f] for f in t._fields]
        else:
            vals = list(raw)
        return type(t)(*(_conform(rv, tv) for rv, tv in zip(vals, t)))
    if isinstance(t, (list, tuple)):
        if isinstance(raw, dict):  # orbax may key sequences by stringed index
            seq = [raw[str(i)] for i in range(len(t))]
        else:
            seq = list(raw)
        items = [_conform(rv, tv) for rv, tv in zip(seq, t)]
        return type(t)(items) if isinstance(t, list) else tuple(items)
    return raw  # leaf


def restore_train_state(raw_state: dict, template):
    """Rebuild a models.nerf.TrainState from a restored checkpoint dict.

    Pass a freshly-initialized TrainState of the same config/capacity as
    `template`; values are matched structurally by key/field name.
    """
    return _conform(raw_state, template)


def restore_objects(raw_objects: dict):
    from romap_tpu.models.nerf import ObjectsState

    import jax.numpy as jnp

    return ObjectsState(**{k: jnp.asarray(raw_objects[k]) for k in ObjectsState._fields})
