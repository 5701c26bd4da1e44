"""Checkpoint round-trip: training resumes bit-identically."""

import numpy as np

import jax

from romap_tpu.data.world import build_synthetic_world
from romap_tpu.models import nerf
from romap_tpu.utils import checkpoint
from tests.test_train_step import tiny_cfg


def test_checkpoint_roundtrip_resume(tmp_path):
    cfg = tiny_cfg()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_synthetic_world(1, 6, 48, capacity=2)
    frames = store.arrays()
    state = nerf.init_train_state(jax.random.PRNGKey(0), 2, cfg, spec)
    state = nerf.train_objects(state, objs, frames, cfg, spec, 5)

    path = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(path, state, objs, extra={"note": "test"})
    raw = checkpoint.load_checkpoint(path)
    template = nerf.init_train_state(jax.random.PRNGKey(9), 2, cfg, spec)
    state2 = checkpoint.restore_train_state(raw["state"], template)
    objs2 = checkpoint.restore_objects(raw["objects"])
    assert raw["extra"]["note"] == "test"

    # every leaf identical after round-trip
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming training from the restored state is bit-identical
    s_cont = nerf.train_objects(state, objs, frames, cfg, spec, 3)
    s_rest = nerf.train_objects(state2, objs2, frames, cfg, spec, 3)
    for a, b in zip(jax.tree.leaves(s_cont.params), jax.tree.leaves(s_rest.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
