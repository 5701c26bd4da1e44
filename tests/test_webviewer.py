"""Live web viewer: state builder + HTTP endpoints (the interactive viewer
standing in for the reference's Pangolin window, ref src/Viewer.cc)."""

import json
import os
import urllib.request

import numpy as np


def _make_artifacts(d):
    os.makedirs(os.path.join(d, "3"), exist_ok=True)
    with open(os.path.join(d, "FrameTrajectory.txt"), "w") as f:
        for i in range(10):
            f.write(f"{i*0.1} {i*0.01} 0.1 {i*0.05} 0 0 0 1\n")
    with open(os.path.join(d, "objects.txt"), "w") as f:
        f.write("3 63 0.0 0.3 5.0 0 0 0 1 0.4 0.4 0.4\n")
    with open(os.path.join(d, "map_points.txt"), "w") as f:
        for i in range(20):
            f.write(f"{i*0.1} 0.0 4.0\n")
    from romap_tpu.ops.marching_cubes import Mesh
    from romap_tpu.utils.mesh_io import save_ply

    verts = np.random.rand(30, 3).astype(np.float32)
    faces = np.random.randint(0, 30, (12, 3)).astype(np.int32)
    save_ply(Mesh(verts=verts, faces=faces, normals=np.ones_like(verts),
                  colors=np.random.rand(30, 3).astype(np.float32)),
             os.path.join(d, "3", "obj.ply"))


def test_build_state(tmp_path):
    from romap_tpu.utils.webviewer import build_state

    _make_artifacts(str(tmp_path))
    s = build_state(str(tmp_path))
    assert len(s["traj"]) == 10
    assert len(s["points"]) == 20
    assert len(s["cuboid_edges"]) == 1
    assert len(s["cuboid_edges"][0]) == 24  # 12 edges x 2 endpoints
    assert len(s["meshes"]) == 1
    assert s["meshes"][0]["verts"] and s["meshes"][0]["edges"]


def test_http_endpoints(tmp_path):
    from romap_tpu.utils.webviewer import serve

    _make_artifacts(str(tmp_path))
    srv = serve(str(tmp_path), port=0, background=True)
    port = srv.server_address[1]
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read().decode()
        assert "<canvas" in html and "state.json" in html
        state = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/state.json", timeout=10).read())
        assert len(state["traj"]) == 10
    finally:
        srv.shutdown()


def test_frame_overlay_route(tmp_path):
    """The FrameDrawer-equivalent panel: /frame.jpg serves the live overlay
    written by mono_tum's dump_frame, 404s when absent."""
    import urllib.error
    import urllib.request

    from romap_tpu.utils.webviewer import serve

    srv = serve(str(tmp_path), port=8871, background=True)
    try:
        try:
            urllib.request.urlopen("http://127.0.0.1:8871/frame.jpg")
            assert False, "expected 404 before the frame exists"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        (tmp_path / "frame.jpg").write_bytes(b"\xff\xd8fakejpeg")
        data = urllib.request.urlopen(
            "http://127.0.0.1:8871/frame.jpg").read()
        assert data.startswith(b"\xff\xd8")
        page = urllib.request.urlopen("http://127.0.0.1:8871/").read().decode()
        assert "frame.jpg" in page
    finally:
        srv.shutdown()
