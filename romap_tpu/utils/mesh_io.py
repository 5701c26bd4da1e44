"""Mesh export, byte-format compatible with the reference's writers.

PLY: ascii, verts + normals + uchar colors + reversed-winding faces, same
header and field order as the reference (ref save_mesh marching_cubes.cu:
512-650, which carries instant-ngp's comment line). OBJ: v/vn/f variant
without UV unwrap. nerf_scale/nerf_offset undo an optional scene transform
(the reference defaults mfScale=1, mOffset=0, ref nerf_model.h).
"""

from __future__ import annotations

import numpy as np

from romap_tpu.ops.marching_cubes import Mesh


def save_ply(mesh: Mesh, path: str, nerf_scale: float = 1.0, nerf_offset=(0, 0, 0)):
    v = (mesh.verts - np.asarray(nerf_offset, np.float32)) / nerf_scale
    n = mesh.normals if mesh.normals is not None else np.zeros_like(v)
    lens = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(lens, 1e-12)
    c = mesh.colors if mesh.colors is not None else np.ones_like(v)
    c8 = np.clip(c * 255.0, 0, 255).astype(np.uint8)
    f = mesh.faces
    with open(path, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\n"
            "comment romap_tpu marching cubes output\n"
            f"element vertex {len(v)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            f"element face {len(f)}\n"
            "property list uchar int vertex_index\nend_header\n"
        )
        for i in range(len(v)):
            fh.write(
                f"{v[i,0]:0.5f} {v[i,1]:0.5f} {v[i,2]:0.5f} "
                f"{n[i,0]:0.3f} {n[i,1]:0.3f} {n[i,2]:0.3f} "
                f"{c8[i,0]} {c8[i,1]} {c8[i,2]}\n"
            )
        for t in f:
            # reversed winding, matching the reference writer (ref :608)
            fh.write(f"3 {t[2]} {t[1]} {t[0]}\n")


def save_obj(mesh: Mesh, path: str, nerf_scale: float = 1.0, nerf_offset=(0, 0, 0)):
    v = (mesh.verts - np.asarray(nerf_offset, np.float32)) / nerf_scale
    n = mesh.normals if mesh.normals is not None else np.zeros_like(v)
    c = mesh.colors if mesh.colors is not None else np.ones_like(v)
    with open(path, "w") as fh:
        for i in range(len(v)):
            cc = np.clip(c[i], 0, 1)
            fh.write(
                f"v {v[i,0]:0.5f} {v[i,1]:0.5f} {v[i,2]:0.5f} "
                f"{cc[0]:0.3f} {cc[1]:0.3f} {cc[2]:0.3f}\n"
            )
        for i in range(len(n)):
            nn = n[i] / max(np.linalg.norm(n[i]), 1e-12)
            fh.write(f"vn {nn[0]:0.5f} {nn[1]:0.5f} {nn[2]:0.5f}\n")
        for t in mesh.faces:
            fh.write(
                f"f {t[2]+1}//{t[2]+1} {t[1]+1}//{t[1]+1} {t[0]+1}//{t[0]+1}\n"
            )


def load_ply(path: str) -> Mesh:
    """Read back an ascii PLY written by save_ply (for tests/tools)."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    n_v = n_f = 0
    i = 0
    for i, ln in enumerate(lines):
        if ln.startswith("element vertex"):
            n_v = int(ln.split()[-1])
        elif ln.startswith("element face"):
            n_f = int(ln.split()[-1])
        elif ln == "end_header":
            break
    body = lines[i + 1 :]
    vdata = np.array([[float(x) for x in ln.split()] for ln in body[:n_v]])
    fdata = np.array(
        [[int(x) for x in ln.split()[1:]] for ln in body[n_v : n_v + n_f]], np.int32
    )
    verts = vdata[:, 0:3].astype(np.float32)
    normals = vdata[:, 3:6].astype(np.float32)
    colors = (vdata[:, 6:9] / 255.0).astype(np.float32)
    faces = fdata[:, ::-1]  # undo reversed winding
    return Mesh(verts=verts, faces=faces, normals=normals, colors=colors)
