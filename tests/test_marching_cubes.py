"""Marching cubes: generated-table validity, topology, geometry, IO."""

import numpy as np
import pytest

from romap_tpu.ops.marching_cubes import (
    Mesh,
    build_triangle_table,
    compute_normals,
    marching_cubes,
)
from romap_tpu.utils.mesh_io import load_ply, save_obj, save_ply


def sphere_density(res, center=(0.5, 0.5, 0.5), r=0.3, scale=10.0):
    lin = np.arange(res) / (res - 1)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    dist = np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2 + (z - center[2]) ** 2)
    return (scale * (r - dist) + 2.0).reshape(-1)  # thresh 2.0 exactly at r


def edge_multiset(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    return e


def test_triangle_table_basics():
    t = build_triangle_table()
    assert t.shape == (256, 16)
    assert (t[0] == -1).all() and (t[255] == -1).all()
    # single inside corner -> one triangle on its three edges
    row = t[1]  # corner 0 inside
    tri = row[row >= 0]
    assert len(tri) == 3
    assert set(tri.tolist()) == {0, 3, 8}  # edges incident to corner 0
    # complement symmetry: same cut edges (orientation flips)
    for m in range(256):
        e1 = set(t[m][t[m] >= 0].tolist())
        e2 = set(t[255 - m][t[255 - m] >= 0].tolist())
        assert e1 == e2, m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_field_mesh_is_closed_oriented_manifold(seed):
    """Directed-edge matching: every edge appears exactly once in each
    direction — catches face-pairing inconsistencies AND orientation flips
    across cell boundaries."""
    rng = np.random.default_rng(seed)
    res = 8
    density = rng.normal(size=res**3) * 2.0 + 2.0
    # clamp the boundary OUTSIDE so the surface is closed inside the grid
    d3 = density.reshape(res, res, res)
    d3[0, :, :] = d3[-1, :, :] = -10.0
    d3[:, 0, :] = d3[:, -1, :] = -10.0
    d3[:, :, 0] = d3[:, :, -1] = -10.0
    mesh = marching_cubes(d3.reshape(-1), (0, 0, 0), (1, 1, 1), res)
    assert len(mesh.faces) > 0
    e = edge_multiset(mesh.faces)
    fwd = set(map(tuple, e.tolist()))
    assert len(fwd) == len(e), "duplicate directed edge -> inconsistent orientation"
    rev = set((b, a) for a, b in fwd)
    assert fwd == rev, "unmatched directed edges -> surface not closed"


def test_sphere_mesh_geometry_and_normals():
    res = 33
    mesh = marching_cubes(sphere_density(res), (0, 0, 0), (1, 1, 1), res)
    assert len(mesh.verts) > 200
    # vertices on the r=0.3 sphere
    dist = np.linalg.norm(mesh.verts - 0.5, axis=1)
    np.testing.assert_allclose(dist, 0.3, atol=0.02)
    # Euler characteristic of a sphere: V - E + F = 2
    e = edge_multiset(mesh.faces)
    n_edges = len(set(map(tuple, np.sort(e, axis=1).tolist())))
    euler = len(mesh.verts) - n_edges + len(mesh.faces)
    assert euler == 2, euler
    # outward normals (density decreases outward -> normals point away)
    mesh = compute_normals(mesh)
    outward = np.sum(mesh.normals * (mesh.verts - 0.5), axis=1)
    frac = float(np.mean(outward > 0))
    assert frac > 0.99, f"only {frac:.2%} normals outward"


def test_aabb_mapping():
    res = 17
    bmin, bmax = np.array([-2.0, 0.0, 1.0]), np.array([2.0, 1.0, 4.0])
    mesh = marching_cubes(sphere_density(res), bmin, bmax, res)
    assert (mesh.verts >= bmin - 1e-4).all() and (mesh.verts <= bmax + 1e-4).all()
    # sphere center maps to aabb center
    np.testing.assert_allclose(mesh.verts.mean(0), (bmin + bmax) / 2, atol=0.2)


def test_ply_roundtrip(tmp_path):
    res = 17
    mesh = marching_cubes(sphere_density(res), (0, 0, 0), (1, 1, 1), res)
    mesh = compute_normals(mesh)
    mesh = mesh._replace(colors=np.random.default_rng(0).uniform(size=mesh.verts.shape))
    p = tmp_path / "m.ply"
    save_ply(mesh, str(p))
    back = load_ply(str(p))
    np.testing.assert_allclose(back.verts, mesh.verts, atol=1e-4)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    np.testing.assert_allclose(back.colors, mesh.colors, atol=1 / 255.0 + 1e-6)
    save_obj(mesh, str(tmp_path / "m.obj"))  # smoke
    assert (tmp_path / "m.obj").read_text().startswith("v ")


def test_obj_uv_unwrap_and_tga(tmp_path):
    """UV-unwrapped OBJ: reference chart layout (ref marching_cubes.cu:
    522-650) — vt per face corner, mtl + TGA atlas; baked texel at a chart
    corner must equal that corner's vertex color."""
    import numpy as np

    from romap_tpu.ops.marching_cubes import Mesh
    from romap_tpu.utils import mesh_io

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [2, 1, 3]], np.int32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    mesh = Mesh(verts=verts, faces=faces, normals=normals, colors=colors)
    path = str(tmp_path / "m.obj")
    mesh_io.save_obj(mesh, path, unwrap=True)

    txt = open(path).read().splitlines()
    vts = [l for l in txt if l.startswith("vt ")]
    assert len(vts) == 3 * len(faces)
    assert txt[0].startswith("mtllib ")
    assert (tmp_path / "m.mtl").exists()

    # TGA: parse header, check dims, check a baked corner texel
    raw = open(tmp_path / "m.tga", "rb").read()
    assert raw[2] == 2 and raw[16] == 24
    w = raw[12] | (raw[13] << 8)
    h = raw[14] | (raw[15] << 8)
    img = np.frombuffer(raw[18:], np.uint8).reshape(h, w, 3)[..., ::-1]
    _, nqx, nqy, qx, qy = mesh_io._quad_layout(len(faces))
    assert (w, h) == (qx * nqx, qy * nqy)
    # chart corner (0,0) of quad 0 is triangle 0's corner 0 = vertex
    # faces[0][0] = 0, color red
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0])
    # even-triangle texel (0, d) is corner 2 = vertex 2, blue
    np.testing.assert_array_equal(img[qy - 1, 0], [0, 0, 255])
