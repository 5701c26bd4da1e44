"""Photometric held-out pose refinement: a perturbed view pose must move
back toward ground truth when optimized against the trained frozen field
(SURVEY §3.4 eval contract; capability beyond the reference)."""

import numpy as np

import jax

from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
from romap_tpu.data.world import build_synthetic_world
from romap_tpu.data.synthetic import instance_bbox
from romap_tpu.models import nerf
from romap_tpu.runtime.pose_refine import refine_view_poses_host


def _pose_err(twc_a, twc_b):
    dt = float(np.linalg.norm(twc_a[:3, 3] - twc_b[:3, 3]))
    dr = np.clip((np.trace(twc_a[:3, :3].T @ twc_b[:3, :3]) - 1) / 2, -1, 1)
    return dt, float(np.degrees(np.arccos(dr)))


def test_refine_recovers_perturbed_pose():
    cfg = NerfConfig(
        encoding=EncodingConfig(kind="mxgrid", mx_levels=3,
                                mx_max_resolution=64, mx_features=16,
                                mx_plane_res=32, mx_plane_features=8),
        train=TrainConfig(rays_per_batch=1024, samples_per_ray=16),
    )
    spec = nerf.make_field_spec(cfg)
    cam, objects, seq, store, objs = build_synthetic_world(
        n_objects=1, n_frames=24, res=96
    )
    frames = store.arrays()
    state = nerf.init_train_state(jax.random.PRNGKey(0), 1, cfg, spec)
    state = nerf.train_objects(state, objs, frames, cfg, spec, 400, False)
    assert float(state.loss[0]) < 0.3  # field converged enough to align to

    params = jax.tree.map(lambda a: a[0], state.ema)
    obj = objects[0]
    # perturb two views' poses (rotation + translation, ~ the magnitude of
    # online tracking error) and refine them back
    rng = np.random.default_rng(0)
    views, boxes, crops, twcs_true, twcs_pert = [], [], [], [], []
    for fi in (5, 15):
        f = seq[fi]
        bb = f["bboxes"][obj.instance_id]
        assert bb is not None
        x, y, h, w = bb
        cmask = (f["instance"][y : y + h, x : x + w] == obj.instance_id)
        crops.append((f["rgb"][y : y + h, x : x + w], cmask.astype(np.uint8) * 255))
        boxes.append((x, y, h, w))
        twc = np.asarray(f["twc"], np.float32)
        pert = np.eye(4, dtype=np.float32)
        ang = 0.02
        c, s = np.cos(ang), np.sin(ang)
        pert[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        pert[:3, 3] = rng.normal(0, 0.02, 3)
        twcs_true.append(twc)
        twcs_pert.append(twc @ pert)

    tow = np.asarray(objs.tow[0])
    refined, stats = refine_view_poses_host(
        params, store._intrinsics, twcs_pert, tow,
        np.asarray(objs.aabb_min[0]), np.asarray(objs.aabb_max[0]),
        boxes, crops, cfg, spec, n_steps=120,
    )
    assert stats["refined"] >= 1
    assert stats["mean_loss_after"] < stats["mean_loss_before"]
    improved = 0
    for twc_t, twc_p, twc_r in zip(twcs_true, twcs_pert, refined):
        dt0, dr0 = _pose_err(twc_t, twc_p)
        dt1, dr1 = _pose_err(twc_t, twc_r)
        if dt1 < dt0 and dr1 < dr0:
            improved += 1
    assert improved >= 1  # at least one view strictly closer in R and t


def test_refine_noop_without_object_pixels():
    cfg = NerfConfig(
        encoding=EncodingConfig(kind="mxgrid", mx_levels=2,
                                mx_max_resolution=32, mx_features=8,
                                mx_plane_res=16, mx_plane_features=4),
        train=TrainConfig(rays_per_batch=64, samples_per_ray=4),
    )
    spec = nerf.make_field_spec(cfg)
    cam, objects, seq, store, objs = build_synthetic_world(
        n_objects=1, n_frames=3, res=32
    )
    state = nerf.init_train_state(jax.random.PRNGKey(0), 1, cfg, spec)
    params = jax.tree.map(lambda a: a[0], state.ema)
    twc = np.asarray(seq[0]["twc"], np.float32)
    refined, stats = refine_view_poses_host(
        params, store._intrinsics, [twc], np.asarray(objs.tow[0]),
        np.asarray(objs.aabb_min[0]), np.asarray(objs.aabb_max[0]),
        [(0, 0, 8, 8)],
        [(np.zeros((8, 8, 3), np.uint8), np.zeros((8, 8), np.uint8))],
        cfg, spec,
    )
    assert stats["refined"] == 0
    np.testing.assert_array_equal(refined[0], twc)
