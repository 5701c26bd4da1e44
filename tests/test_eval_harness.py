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
