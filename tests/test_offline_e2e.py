"""End-to-end offline path: export a synthetic dataset in the reference's
on-disk format, run the OfflineNeRF-equivalent runner, verify convergence,
meshes, and the full evaluation-artifact tree (SURVEY.md §3.4 contract)."""

import dataclasses
import os

import numpy as np
import pytest

from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
from romap_tpu.data.formats import (
    load_dataset_meta,
    load_object_file,
    write_dataset,
)
from romap_tpu.data.synthetic import Camera, make_scene, make_sequence


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("romap_ds"))
    res = 64
    cam = Camera(fx=res * 0.9, fy=res * 0.9, cx=res / 2, cy=res / 2, h=res, w=res)
    objects = make_scene(2)
    frames = make_sequence(cam, objects, 8, radius=5.5)
    write_dataset(root, cam, frames, objects=objects, use_depth=True)
    return root


def test_dataset_roundtrip(dataset_dir):
    meta = load_dataset_meta(dataset_dir, use_depth=True)
    assert meta.h == meta.w == 64
    assert len(meta.stamps) == 8
    assert len(meta.poses) == 8
    # orthonormal poses
    r = meta.poses[3][:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)

    obj = load_object_file(os.path.join(dataset_dir, "obj_offline", "0.txt"))
    assert obj.cls == 1
    assert obj.bboxes.shape[1] == 4
    assert len(obj.stamps) > 0
    # Tow @ Two == I
    np.testing.assert_allclose(obj.tow @ obj.two, np.eye(4), atol=1e-5)


def test_depth_png_roundtrip(dataset_dir):
    import cv2

    meta = load_dataset_meta(dataset_dir, use_depth=True)
    from romap_tpu.data.formats import load_frame_images

    rgb, depth, inst = load_frame_images(meta, 0, use_depth=True)
    assert rgb.dtype == np.uint8 and rgb.shape == (64, 64, 3)
    assert inst.dtype == np.uint8
    # depth in meters where the object is
    obj_px = inst > 0
    assert obj_px.any()
    d = depth[obj_px]
    assert (d > 0.5).all() and (d < 20).all()


def test_offline_runner_end_to_end(dataset_dir, tmp_path):
    from romap_tpu.runtime.offline import OfflineRunner

    cfg = NerfConfig(
        encoding=EncodingConfig(kind="mxgrid", mx_levels=3, mx_max_resolution=64,
                                mx_features=16, mx_plane_res=32,
                                mx_plane_features=8),
        train=TrainConfig(rays_per_batch=512, samples_per_ray=16,
                          mc_resolution=33),
    )
    runner = OfflineRunner(dataset_dir, cfg, use_depth=True)
    n = runner.create_nerfs_from_dir()
    assert n == 2

    out = str(tmp_path / "out")
    runner.train(waves=2, steps_per_wave=30, out_dir=out)
    losses = np.asarray(runner.state.loss)
    assert np.isfinite(losses[:n]).all()
    # meshes saved
    for oi in range(n):
        assert os.path.exists(os.path.join(out, f"{oi}.ply"))

    # full artifact tree
    art = str(tmp_path / "art")
    runner.render_test_artifacts(art, test_every=4, video=False)
    for oi in range(n):
        base = os.path.join(art, str(oi))
        assert os.path.exists(os.path.join(base, "test.txt"))
        assert os.path.exists(os.path.join(base, "train.txt"))
        assert os.path.exists(os.path.join(base, "obj.ply"))
        imgs = os.listdir(os.path.join(base, "test_img"))
        assert len(imgs) >= 1
        assert len(os.listdir(os.path.join(base, "test_depth"))) == len(imgs)
        assert len(os.listdir(os.path.join(base, "test_mask"))) == len(imgs)
        # manifest object-centric poses parse back
        lines = [l for l in open(os.path.join(base, "test.txt")) if not l.startswith("#")]
        assert len(lines) == len(imgs)
        vals = lines[0].split()
        assert len(vals) == 12


def test_offline_holdout_protocol(dataset_dir, tmp_path):
    """holdout=N: every Nth per-object view is excluded from training
    supervision and becomes exactly the eval view set (leakage-free ceiling
    protocol — VERDICT r4 weak #1: the default path trains on every view,
    so quoting its eval as a 'ceiling' vs the online pipeline, which never
    uploads its held-out frames, inflates the gap)."""
    from romap_tpu.data.formats import load_object_file
    from romap_tpu.runtime.offline import OfflineRunner

    cfg = NerfConfig(
        encoding=EncodingConfig(kind="mxgrid", mx_levels=2, mx_max_resolution=32,
                                mx_features=8, mx_plane_res=16,
                                mx_plane_features=4),
        train=TrainConfig(rays_per_batch=128, samples_per_ray=8,
                          mc_resolution=17),
    )
    runner = OfflineRunner(dataset_dir, cfg, use_depth=True, holdout=4)
    n = runner.create_nerfs_from_dir()
    runner.train(waves=1, steps_per_wave=5, out_dir=str(tmp_path / "out"))

    for oi in range(n):
        d = load_object_file(runner.objects[oi]["path"])
        n_views = sum(1 for s in d.stamps
                      if s in runner.meta.stamp_to_idx
                      or runner.meta.stamp_to_idx.get(s) is not None)
        n_held = len(runner.objects[oi]["holdout_views"])
        n_train = int(np.asarray(runner.objs_state.n_bbox)[oi])
        # partition: every view is either supervision or held out
        assert n_held >= 1
        assert n_train + n_held == len(d.stamps)
        # held-out stamps never appear among the training bbox frame ids
        held_fids = {runner.meta.stamp_to_idx[v["stamp"]]
                     for v in runner.objects[oi]["holdout_views"]}
        train_fids = set(
            np.asarray(runner.objs_state.bboxes)[oi, :n_train, 0].tolist())
        assert held_fids.isdisjoint(train_fids)

    # eval artifacts use exactly the held-out views
    art = str(tmp_path / "art")
    runner.render_test_artifacts(art, video=False)
    for oi in range(n):
        lines = [l for l in open(os.path.join(art, str(oi), "test.txt"))
                 if not l.startswith("#")]
        assert len(lines) == len(runner.objects[oi]["holdout_views"])
