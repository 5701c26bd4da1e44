"""Eval-harness unit tests: the mesh-geometry metric recovers a known
sphere exactly and degrades predictably under scale error."""

import json
import os

import numpy as np

from romap_tpu.ops.marching_cubes import Mesh
from romap_tpu.utils.eval_psnr import _mesh_metrics
from romap_tpu.utils.mesh_io import save_ply


def _sphere_mesh(radius: float, center, n: int = 900) -> Mesh:
    # Fibonacci sphere: near-uniform vertex distribution
    i = np.arange(n, dtype=np.float64)
    phi = np.arccos(1 - 2 * (i + 0.5) / n)
    theta = np.pi * (1 + 5**0.5) * i
    v = np.stack([np.sin(phi) * np.cos(theta),
                  np.sin(phi) * np.sin(theta),
                  np.cos(phi)], -1) * radius + np.asarray(center)
    faces = np.zeros((1, 3), np.int32)
    return Mesh(v.astype(np.float32), faces,
                np.zeros_like(v, dtype=np.float32) + 1.0,
                np.zeros_like(v, dtype=np.float32))


def _setup(tmp_path, mesh_radius, gt_radius):
    dataset = tmp_path / "ds"
    out = tmp_path / "out" / "0"
    os.makedirs(out)
    os.makedirs(dataset)
    with open(dataset / "gt_objects.json", "w") as f:
        json.dump({"0": {"center": [0, 0, 0], "radius": gt_radius}}, f)
    save_ply(_sphere_mesh(mesh_radius, [0.3, -0.2, 5.0]), str(out / "obj.ply"))
    return str(out), str(dataset)


def test_mesh_metric_exact_sphere(tmp_path):
    out, ds = _setup(tmp_path, mesh_radius=0.6, gt_radius=0.6)
    m = _mesh_metrics(out, ds)
    assert abs(m["mesh_radius_ratio"] - 1.0) < 0.01
    assert m["mesh_shape_rms"] < 0.01
    assert m["mesh_verts"] == 900


def test_mesh_metric_scale_error(tmp_path):
    out, ds = _setup(tmp_path, mesh_radius=0.45, gt_radius=0.6)
    m = _mesh_metrics(out, ds)  # single GT entry is used regardless of dir name
    assert abs(m["mesh_radius_ratio"] - 0.75) < 0.01
    assert m["mesh_shape_rms"] < 0.01


def test_mesh_metric_missing_inputs(tmp_path):
    os.makedirs(tmp_path / "empty")
    assert _mesh_metrics(str(tmp_path / "empty"), str(tmp_path)) == {}


def _write_png(path, arr):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(str(path), arr)


def test_evaluate_object_multi_instance_crop(tmp_path):
    """A bbox crop containing TWO instances must be scored against the
    instance this object actually renders (inferred by mask agreement),
    not against every nonzero instance pixel."""
    from romap_tpu.utils.eval_psnr import evaluate_object

    ds = tmp_path / "ds"
    obj = tmp_path / "out" / "0"
    os.makedirs(obj)
    os.makedirs(ds)
    hgt, wid = 32, 32
    # GT image: instance 1 fills the left half (dark), instance 2 the right
    # half (bright)
    rgb = np.zeros((hgt, wid, 3), np.uint8)
    rgb[:, : wid // 2] = 60
    rgb[:, wid // 2 :] = 180
    inst = np.zeros((hgt, wid), np.uint8)
    inst[:, : wid // 2] = 1
    inst[:, wid // 2 :] = 2
    _write_png(ds / "rgb" / "0.png", rgb)
    _write_png(ds / "instance" / "0.png", inst)
    with open(ds / "img.txt", "w") as f:
        f.write("0.0 0.png\n")
    # the object's render reproduces instance 2 exactly and its mask covers
    # exactly instance 2's pixels
    ren = np.full((hgt, wid, 3), 180, np.uint8)
    msk = np.where(inst == 2, 255, 0).astype(np.uint8)
    _write_png(obj / "test_img" / "0.0.png", ren)
    _write_png(obj / "test_mask" / "0.0.png", msk)
    with open(obj / "test.txt", "w") as f:
        f.write(f"0.0 0 0 {hgt} {wid}\n")

    m = evaluate_object(str(obj), str(ds))
    assert m is not None
    # against inst==2 the render is pixel-exact; against inst>0 it would be
    # ~9 dB (half the pixels off by 120/255) with IoU 0.5
    assert m["psnr_db"] > 50, m
    assert m["mask_iou"] > 0.99, m


def test_cuboid_metrics(tmp_path):
    from romap_tpu.utils.eval_psnr import _cuboid_metrics

    ds = tmp_path / "ds"
    out = tmp_path / "out"
    os.makedirs(ds)
    os.makedirs(out)
    with open(ds / "gt_objects.json", "w") as f:
        json.dump({"0": {"center": [0, 0, 5], "radius": 0.5},
                   "1": {"center": [3, 0, 5], "radius": 0.4}}, f)
    with open(out / "objects.txt", "w") as f:
        # id cls tx ty tz qx qy qz qw a1 a2 a3 — row 7 sits near GT 1,
        # row 2 near GT 0 with a 20%-short z extent
        f.write("2 60 0.05 0.0 5.0 0 0 0 1 0.5 0.5 0.4\n")
        f.write("7 60 3.0 0.1 5.0 0 0 0 1 0.4 0.4 0.4\n")
    m = _cuboid_metrics(str(out), str(ds), None)
    assert m["objects"]["2"]["gt_id"] == "0"
    assert m["objects"]["7"]["gt_id"] == "1"
    assert abs(m["objects"]["2"]["center_err"] - 0.05) < 1e-3
    assert abs(m["objects"]["2"]["ext_err_max"] - 0.2) < 1e-3
    assert abs(m["objects"]["7"]["ext_err_max"]) < 1e-3
    assert abs(m["mean_ext_err_max"] - 0.1) < 1e-3


def test_rpe(tmp_path):
    from romap_tpu.utils.eval_psnr import _align_sim3, _rpe, _read_tum

    # circular GT trajectory; estimate = same motion in a Sim(3)-shifted
    # gauge (scale 3, yaw 0.5) -> RPE must vanish once scale-corrected
    def write(path, rows):
        with open(path, "w") as f:
            for st, t, q in rows:
                f.write(f"{st:.6f} {t[0]} {t[1]} {t[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}\n")

    def yaw_quat(a):  # qx qy qz qw about +z
        return (0.0, 0.0, np.sin(a / 2), np.cos(a / 2))

    gt_rows, est_rows = [], []
    s, phi = 3.0, 0.5
    rot_g = np.array([[np.cos(phi), -np.sin(phi), 0],
                      [np.sin(phi), np.cos(phi), 0], [0, 0, 1.0]])
    for i in range(30):
        a = 0.2 * i
        t = np.array([np.cos(a), np.sin(a), 0.1 * i])
        gt_rows.append((float(i), t, yaw_quat(a)))
        qe = yaw_quat(a + phi)
        est_rows.append((float(i), s * rot_g @ t, qe))
    ds = tmp_path / "ds"
    out = tmp_path / "out"
    os.makedirs(ds)
    os.makedirs(out)
    write(ds / "groundtruth.txt", gt_rows)
    write(out / "FrameTrajectory.txt", est_rows)
    align = _align_sim3(_read_tum(out / "FrameTrajectory.txt"),
                        _read_tum(ds / "groundtruth.txt"))
    assert abs(align[0] - 1.0 / s) < 1e-9  # est -> gt shrinks by 1/s
    tr, rd, n = _rpe(str(out), str(ds), align[0])
    assert n == 29
    assert tr < 1e-9 and rd < 1e-7

    # inject a 0.05 m hop at one frame: RPE localizes it (2 affected pairs)
    est_rows[10] = (10.0, est_rows[10][1] + s * np.array([0.05, 0, 0]),
                    est_rows[10][2])
    write(out / "FrameTrajectory.txt", est_rows)
    tr, rd, n = _rpe(str(out), str(ds), align[0])
    assert abs(tr - np.sqrt(2 * 0.05**2 / 29)) < 1e-6
    assert rd < 1e-7


def test_sim3_alignment_recovers_scale():
    from romap_tpu.utils.eval_psnr import _align_sim3

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(40, 3))
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0],
                    [0, 0, 1.0]])
    s_true, t_true = 7.5, np.array([1.0, -2.0, 0.5])
    src = {f"{i}.000000": p for i, p in enumerate(pts)}
    dst = {f"{i}.000000": s_true * rot @ p + t_true
           for i, p in enumerate(pts)}
    s, r, t, ate, n = _align_sim3(src, dst)
    assert n == 40
    assert abs(s - s_true) < 1e-6
    assert ate < 1e-9
    assert np.allclose(r, rot, atol=1e-9)
