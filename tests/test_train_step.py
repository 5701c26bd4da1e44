"""Batched multi-object train step: convergence, slot masking, determinism.

Runs on CPU with a shrunken config (few rays/samples, small encoding) — the
pipeline is identical to the TPU flagship, only sizes differ.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
from romap_tpu.data.frame_store import FrameStore
from romap_tpu.data.synthetic import Camera, make_scene, make_sequence
from romap_tpu.models import nerf


def tiny_cfg(**train_kw):
    return NerfConfig(
        encoding=EncodingConfig(kind="mxgrid", mx_levels=3, mx_max_resolution=64,
                                mx_features=16),
        train=TrainConfig(rays_per_batch=512, samples_per_ray=16, **train_kw),
    )


def build_tiny_world(n_objects=2, res=48, n_frames=6, use_depth=False):
    cam = Camera(fx=res * 0.9, fy=res * 0.9, cx=res / 2, cy=res / 2, h=res, w=res)
    objects = make_scene(n_objects)
    frames = make_sequence(cam, objects, n_frames,
                           radius=2.2 if n_objects == 1 else 5.5)
    store = FrameStore(n_frames, cam.h, cam.w, cam.intrinsics, use_depth=use_depth)
    for i, f in enumerate(frames):
        store.add_frame(i, f["stamp"], f["rgb"], f["instance"], f["twc"],
                        depth=f["depth"] if use_depth else None)
    capacity = n_objects + 1  # one extra INACTIVE slot
    objs_np = dict(
        aabb_min=np.zeros((capacity, 3), np.float32),
        aabb_max=np.ones((capacity, 3), np.float32),
        tow=np.tile(np.eye(4, dtype=np.float32), (capacity, 1, 1)),
        instance_id=np.zeros(capacity, np.int32),
        bboxes=np.zeros((capacity, n_frames, 5), np.int32),
        n_bbox=np.zeros(capacity, np.int32),
        active=np.zeros(capacity, bool),
    )
    for oi, obj in enumerate(objects):
        half = obj.aabb_half_extents() * 1.1
        objs_np["aabb_min"][oi], objs_np["aabb_max"][oi] = -half, half
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = -obj.center
        objs_np["tow"][oi] = t
        objs_np["instance_id"][oi] = obj.instance_id
        nb = 0
        for fi, f in enumerate(frames):
            bb = f["bboxes"][obj.instance_id]
            if bb is not None:
                objs_np["bboxes"][oi, nb] = (fi, *bb)
                nb += 1
        objs_np["n_bbox"][oi] = nb
        objs_np["active"][oi] = nb > 0
    objs = nerf.ObjectsState(**{k: jnp.asarray(v) for k, v in objs_np.items()})
    return cam, objects, frames, store, objs


def test_training_decreases_loss_and_masks_inactive_slots():
    cfg = tiny_cfg()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_tiny_world()
    state = nerf.init_train_state(jax.random.PRNGKey(0), objs.capacity, cfg, spec)
    p0 = jax.tree.map(np.asarray, state.params)
    arrays = store.arrays()

    state = nerf.train_objects(state, objs, arrays, cfg, spec, 5)
    loss_early = np.asarray(state.loss)
    state = nerf.train_objects(state, objs, arrays, cfg, spec, 60)
    loss_late = np.asarray(state.loss)

    active = np.asarray(objs.active)
    assert (loss_late[active] < loss_early[active]).all(), (loss_early, loss_late)
    assert np.isfinite(loss_late[active]).all()
    # the inactive slot must be bit-identical to its init
    p1 = jax.tree.map(np.asarray, state.params)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a[~active], b[~active])
        assert (a[active] != b[active]).any()
    assert (np.asarray(state.step)[~active] == 0).all()
    assert (np.asarray(state.step)[active] == 65).all()


def test_train_step_deterministic():
    cfg = tiny_cfg()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_tiny_world(n_objects=1)
    arrays = store.arrays()
    s1 = nerf.init_train_state(jax.random.PRNGKey(3), objs.capacity, cfg, spec)
    s2 = nerf.init_train_state(jax.random.PRNGKey(3), objs.capacity, cfg, spec)
    s1 = nerf.train_objects(s1, objs, arrays, cfg, spec, 3)
    s2 = nerf.train_objects(s2, objs, arrays, cfg, spec, 3)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_depth_supervision_path():
    cfg = tiny_cfg()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_tiny_world(n_objects=1, use_depth=True)
    state = nerf.init_train_state(jax.random.PRNGKey(1), objs.capacity, cfg, spec)
    state = nerf.train_objects(state, objs, store.arrays(), cfg, spec, 20,
                               use_depth=True)
    assert np.isfinite(np.asarray(state.loss)[0])


def test_ema_tracks_params():
    cfg = tiny_cfg()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_tiny_world(n_objects=1)
    state = nerf.init_train_state(jax.random.PRNGKey(2), objs.capacity, cfg, spec)
    state = nerf.train_objects(state, objs, store.arrays(), cfg, spec, 10)
    # EMA should lag params but not equal them, and not equal init
    p = np.asarray(jax.tree.leaves(state.params)[0][0])
    e = np.asarray(jax.tree.leaves(state.ema)[0][0])
    assert not np.array_equal(p, e)
    assert np.abs(p - e).mean() < np.abs(p).mean()  # EMA is closer to the path
