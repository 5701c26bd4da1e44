"""Adversarial scene suite (VERDICT r4 next #2): non-sphere geometry,
detector noise, exposure drift — and the chamfer mesh metric that scores
non-sphere GT."""

import json
import os

import numpy as np

from romap_tpu.data.synthetic import (
    BoxObject, Camera, CompoundObject, Room, SphereObject, make_sequence,
    render_frame, look_at_pose,
)
from romap_tpu.data.world import (
    ADVERSARIAL_SCENES, degrade_frames, write_adversarial_dataset,
)
from romap_tpu.utils.eval_psnr import _chamfer_yaw, _mesh_metrics


def small_cam(res=64):
    return Camera(fx=res, fy=res, cx=res / 2, cy=res / 2, h=res, w=res)


def test_box_object_render_geometry():
    box = BoxObject(center=np.zeros(3), half=np.array([0.5, 0.4, 0.3]),
                    yaw=0.0, instance_id=1,
                    base_color=np.array([0.8, 0.5, 0.3]))
    cam = small_cam()
    twc = look_at_pose([2.0, 0, 0], [0, 0, 0])
    rgb, depth, inst = render_frame(cam, twc, [box])
    assert (inst == 1).sum() > 100
    # center pixel ray hits the +x face at x=0.5 -> z-depth 1.5
    assert abs(depth[32, 32] - 1.5) < 1e-3
    # AABB of a yawed box grows in x/y
    byaw = BoxObject(center=np.zeros(3), half=np.array([0.5, 0.4, 0.3]),
                     yaw=0.5, instance_id=1, base_color=np.ones(3))
    h = byaw.aabb_half_extents()
    assert h[0] > 0.5 and h[1] > 0.4 and abs(h[2] - 0.3) < 1e-6


def test_compound_concave_silhouette():
    """The L-shape must produce a concave instance mask: the bbox fill
    fraction is well below a convex shape's."""
    obj = CompoundObject([
        BoxObject(center=np.array([0.0, 0.0, -0.3]),
                  half=np.array([0.55, 0.25, 0.15]), yaw=0.0,
                  instance_id=1, base_color=np.ones(3) * 0.7),
        BoxObject(center=np.array([-0.35, 0.0, 0.25]),
                  half=np.array([0.2, 0.25, 0.4]), yaw=0.0,
                  instance_id=1, base_color=np.ones(3) * 0.5),
    ], instance_id=1)
    cam = small_cam(96)
    twc = look_at_pose([0, 2.4, 0.1], [0, 0, 0])
    _, _, inst = render_frame(cam, twc, [obj])
    ys, xs = np.nonzero(inst == 1)
    assert len(ys) > 200
    fill = len(ys) / ((ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1))
    assert fill < 0.75  # concave: an L fills ~55-65% of its bbox
    # union surface samples exclude buried points (inside the sibling box)
    pts = obj.surface_points(512, np.random.default_rng(0))
    assert len(pts) >= 256
    for p in obj.parts:
        d = p.surface_distance(pts + obj.center)
        assert (d > -1e-6).all()


def test_degrade_frames_axes():
    cam = small_cam()
    objs = [SphereObject(center=np.zeros(3), radius=0.6, instance_id=1,
                         base_color=np.array([0.9, 0.4, 0.4]))]
    frames = make_sequence(cam, objs, 12, radius=2.2)
    clean_rgb = [f["rgb"].copy() for f in frames]
    clean_area = [(f["instance"] == 1).sum() for f in frames]
    degrade_frames(frames, np.random.default_rng(0), mask_noise=2,
                   det_jitter=3, det_dropout=0.3, exposure=0.25)
    dropped = sum(all(v is None for v in f["bboxes"].values())
                  for f in frames)
    assert 1 <= dropped <= 8  # ~30% of 12
    # exposure changed pixels; masks eroded/dilated but object survives
    changed = sum(not np.array_equal(a, f["rgb"])
                  for a, f in zip(clean_rgb, frames))
    assert changed >= 10
    for f, a0 in zip(frames, clean_area):
        a1 = (f["instance"] == 1).sum()
        assert 0.5 * a0 < a1 < 2.0 * a0
        for bb in f["bboxes"].values():
            if bb is None:
                continue
            x, y, h, w = bb
            assert x >= 0 and y >= 0 and h >= 4 and w >= 4
            assert y + h <= cam.h and x + w <= cam.w


def test_write_adversarial_datasets(tmp_path):
    for scene in ADVERSARIAL_SCENES:
        root = str(tmp_path / scene)
        write_adversarial_dataset(root, scene, n_frames=4, res=48, seed=0)
        assert os.path.exists(os.path.join(root, "rgb", "000000.png"))
        assert os.path.exists(os.path.join(root, "bbox"))
        gt = json.load(open(os.path.join(root, "gt_objects.json")))
        e = next(iter(gt.values()))
        assert len(e["surface_points"]) > 500
        assert len(e["half_extents"]) == 3


def test_chamfer_yaw_identifies_shape():
    rng = np.random.default_rng(1)
    box = BoxObject(center=np.zeros(3), half=np.array([0.5, 0.3, 0.2]),
                    yaw=0.0, instance_id=1, base_color=np.ones(3))
    a = box.surface_points(600, rng).astype(np.float64)
    # same shape rotated 40 degrees: chamfer ~ sampling noise
    th = np.deg2rad(40)
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    b = box.surface_points(600, np.random.default_rng(2)) @ rot.T
    near = _chamfer_yaw(a, b, n_yaw=72)
    assert near < 0.06
    # a sphere of equal mean radius is far
    r = np.linalg.norm(a, axis=1).mean()
    v = rng.normal(size=(600, 3))
    sph = v / np.linalg.norm(v, axis=1, keepdims=True) * r
    far = _chamfer_yaw(sph, b, n_yaw=36)
    assert far > 2 * near


def test_mesh_metrics_chamfer_on_box(tmp_path):
    """A fake obj.ply sampled from the GT box scores chamfer ~0 and scale
    ~1; scaling the mesh 1.7x moves only the scale ratio."""
    from romap_tpu.ops.marching_cubes import Mesh
    from romap_tpu.utils.mesh_io import save_ply

    root = str(tmp_path / "ds")
    write_adversarial_dataset(root, "boxnoise", n_frames=3, res=48, seed=0)
    gt = json.load(open(os.path.join(root, "gt_objects.json")))
    pts = np.asarray(next(iter(gt.values()))["surface_points"], np.float32)

    def write_mesh(scale):
        od = tmp_path / f"obj_{scale}"
        od.mkdir(exist_ok=True)
        v = pts[:900] * scale
        faces = np.arange(len(v) // 3 * 3).reshape(-1, 3)
        save_ply(Mesh(verts=v, faces=faces.astype(np.int32),
                      normals=np.ones_like(v),
                      colors=np.full_like(v, 0.5)),
                 str(od / "obj.ply"))
        return str(od)

    m1 = _mesh_metrics(write_mesh(1.0), root)
    assert m1["mesh_chamfer_norm"] < 0.05
    assert abs(m1["mesh_scale_ratio"] - 1.0) < 0.05
    assert "mesh_radius_ratio" not in m1  # not a sphere
    m2 = _mesh_metrics(write_mesh(1.7), root)
    assert abs(m2["mesh_scale_ratio"] - 1.7) < 0.1
    assert m2["mesh_chamfer_norm"] < 0.05  # scale-free shape metric


def test_gt_cuboid_body_frame_not_world_aabb():
    """The sidecar's cuboid GT must be the minimal yaw-aligned cuboid: a
    PERFECT body-frame estimate of a yawed box scores ext_ratio 1.0 — the
    world AABB (|R|·half) would penalize it even when exactly right."""
    byaw = BoxObject(center=np.array([0.1, -0.2, 0.3]),
                     half=np.array([0.5, 0.36, 0.3]), yaw=0.5,
                     instance_id=1, base_color=np.ones(3))
    cc, ch, cy = byaw.gt_cuboid()
    assert np.allclose(ch, [0.5, 0.36, 0.3])
    assert np.allclose(cc, byaw.center) and cy == 0.5
    # the world AABB is strictly inflated in x/y for a yawed box
    assert (byaw.aabb_half_extents()[:2] > ch[:2]).all()

    # compound of two same-yaw boxes: the union in the shared yaw frame
    a = BoxObject(center=np.zeros(3), half=np.array([0.55, 0.26, 0.16]),
                  yaw=0.35, instance_id=1, base_color=np.ones(3))
    comp = CompoundObject([a], instance_id=1)
    cc, ch, cy = comp.gt_cuboid()
    assert np.allclose(ch, a.half) and cy == 0.35
    assert np.allclose(cc, a.center)


def test_cuboid_metrics_perfect_yawed_box(tmp_path):
    """End-to-end through the sidecar + _cuboid_metrics: writing the TRUE
    body-frame cuboid into objects.txt scores ext_err_max ~0 on the yawed
    boxnoise scene (was ~0.35 against the inflated world AABB)."""
    from romap_tpu.utils.eval_psnr import _cuboid_metrics

    root = str(tmp_path / "ds")
    write_adversarial_dataset(root, "boxnoise", n_frames=3, res=48, seed=0)
    gt = json.load(open(os.path.join(root, "gt_objects.json")))
    e = next(iter(gt.values()))
    assert "cuboid_half_extents" in e
    out = tmp_path / "run"
    out.mkdir()
    c = e["cuboid_center"]
    h = e["cuboid_half_extents"]
    with open(out / "objects.txt", "w") as f:
        f.write(f"0 1 {c[0]} {c[1]} {c[2]} 0 0 0 1 {h[0]} {h[1]} {h[2]}\n")
    m = _cuboid_metrics(str(out), root, None)
    assert m["objects"]["0"]["ext_err_max"] < 1e-6
    assert m["objects"]["0"]["center_err"] < 1e-6
