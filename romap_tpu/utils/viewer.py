"""Headless map viewer: renders trajectory + object cuboids + meshes to PNG.

The reference uses a live Pangolin/OpenGL window (ref src/Viewer.cc,
MapDrawer.cc, main.cpp viewer) — unavailable headless; this produces the same
content as snapshots: camera path, oriented cuboids, NeRF meshes.

CLI:  python -m romap_tpu.utils.viewer <out_dir> [--dataset-gt groundtruth.txt]
      where out_dir holds FrameTrajectory.txt / objects.txt / <i>/obj.ply
"""

from __future__ import annotations

import os

import numpy as np


def _load_tum(path: str) -> np.ndarray:
    rows = []
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        rows.append([float(x) for x in line.split()])
    return np.asarray(rows)


def _cuboid_corners(t, q, half) -> np.ndarray:
    from romap_tpu.utils.camera import quat_to_rot

    r = quat_to_rot(*q)
    corners = []
    for k in range(8):
        local = np.array(
            [half[0] if k & 1 else -half[0], half[1] if k & 2 else -half[1],
             half[2] if k & 4 else -half[2]]
        )
        corners.append(r @ local + np.asarray(t))
    return np.asarray(corners)


_CUBE_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0), (4, 5), (5, 7), (7, 6), (6, 4),
               (0, 4), (1, 5), (2, 6), (3, 7)]


def render_map_snapshot(out_dir: str, png_path: str | None = None,
                        gt_path: str | None = None) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 5))
    ax3d = fig.add_subplot(1, 2, 1, projection="3d")
    ax_top = fig.add_subplot(1, 2, 2)

    traj_file = os.path.join(out_dir, "FrameTrajectory.txt")
    if os.path.exists(traj_file):
        traj = _load_tum(traj_file)
        t = traj[:, 1:4]
        ax3d.plot(t[:, 0], t[:, 1], t[:, 2], "b-", lw=1, label="trajectory")
        ax_top.plot(t[:, 0], t[:, 1], "b-", lw=1)
    if gt_path and os.path.exists(gt_path):
        gt = _load_tum(gt_path)
        ax_top.plot(gt[:, 1], gt[:, 2], "g--", lw=0.8, label="GT (unaligned)")

    obj_file = os.path.join(out_dir, "objects.txt")
    if os.path.exists(obj_file):
        for line in open(obj_file):
            v = [float(x) for x in line.split()]
            corners = _cuboid_corners(v[2:5], v[5:9], v[9:12])
            for a, b in _CUBE_EDGES:
                ax3d.plot(*zip(corners[a], corners[b]), "r-", lw=0.8)
                ax_top.plot([corners[a][0], corners[b][0]],
                            [corners[a][1], corners[b][1]], "r-", lw=0.8)

    # meshes from per-object artifact dirs
    from romap_tpu.utils.mesh_io import load_ply

    for name in sorted(os.listdir(out_dir)):
        ply = os.path.join(out_dir, name, "obj.ply")
        if not os.path.isdir(os.path.join(out_dir, name)) or not os.path.exists(ply):
            continue
        mesh = load_ply(ply)
        if len(mesh.verts) == 0:
            continue
        sub = mesh.verts[:: max(len(mesh.verts) // 800, 1)]
        cols = (mesh.colors[:: max(len(mesh.verts) // 800, 1)]
                if mesh.colors is not None else "k")
        ax3d.scatter(sub[:, 0], sub[:, 1], sub[:, 2], c=cols, s=2)

    ax3d.set_title("map: trajectory + cuboids + meshes")
    ax_top.set_title("top view")
    ax_top.set_aspect("equal", adjustable="datalim")
    ax_top.legend(loc="best", fontsize=7)
    png_path = png_path or os.path.join(out_dir, "map_snapshot.png")
    fig.tight_layout()
    fig.savefig(png_path, dpi=110)
    plt.close(fig)
    return png_path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--dataset-gt", default=None)
    ap.add_argument("--png", default=None)
    args = ap.parse_args()
    print(render_map_snapshot(args.out_dir, args.png, args.dataset_gt))
