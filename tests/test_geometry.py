"""Golden tests: ray/AABB, warp, camera rays, stratified sampling, orbit poses."""

import jax.numpy as jnp
import numpy as np
import pytest

from romap_tpu.ops.geometry import (
    camera_rays,
    orbit_pose,
    pixel_dirs,
    ray_aabb_intersect,
    stratified_distances,
    unwarp_point,
    warp_point,
)
from tests.oracles import ray_aabb_ref

RNG = np.random.default_rng(0)


def test_ray_aabb_matches_reference_oracle():
    box_min = np.array([-1.0, -0.5, -2.0])
    box_max = np.array([1.0, 0.5, 2.0])
    o = RNG.normal(size=(256, 3)) * 3.0
    d = RNG.normal(size=(256, 3))
    tmin, tmax, hit = ray_aabb_intersect(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(box_min, jnp.float32), jnp.asarray(box_max, jnp.float32),
    )
    tmin, tmax, hit = np.asarray(tmin), np.asarray(tmax), np.asarray(hit)
    n_hits = 0
    for i in range(256):
        ref = ray_aabb_ref(box_min, box_max, o[i], d[i])
        assert hit[i] == (ref is not None), i
        if ref is not None:
            n_hits += 1
            np.testing.assert_allclose(tmin[i], ref[0], rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(tmax[i], ref[1], rtol=1e-4, atol=1e-5)
    assert n_hits > 20  # sanity: the test actually exercised hits


def test_ray_aabb_axis_aligned_dirs():
    # d has zero components -> IEEE inf handling must match the slab method
    tmin, tmax, hit = ray_aabb_intersect(
        jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]),
        jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
    )
    assert bool(hit)
    np.testing.assert_allclose(float(tmin), 4.0, atol=1e-6)
    np.testing.assert_allclose(float(tmax), 6.0, atol=1e-6)
    # origin outside the slab, parallel ray -> miss
    _, _, miss = ray_aabb_intersect(
        jnp.array([5.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]),
        jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
    )
    assert not bool(miss)


def test_warp_roundtrip():
    bmin = jnp.array([-2.0, 0.0, 1.0])
    bmax = jnp.array([2.0, 4.0, 3.0])
    p = jnp.asarray(RNG.uniform(-2, 4, size=(32, 3)), jnp.float32)
    w = warp_point(p, bmin, bmax)
    np.testing.assert_allclose(np.asarray(unwarp_point(w, bmin, bmax)), p, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(warp_point(bmin, bmin, bmax)), np.zeros(3), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(warp_point(bmax, bmin, bmax)), np.ones(3), atol=1e-6
    )


def test_camera_rays_geometry():
    intr = jnp.array([320.0, 320.0, 320.0, 240.0])
    # camera at world (1,2,3), identity rotation; object frame = world shifted
    twc = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    tow = jnp.eye(4).at[:3, 3].set(jnp.array([-1.0, 0.0, 0.0]))
    o, d, dn = camera_rays(jnp.array([320.0]), jnp.array([240.0]), intr, twc, tow)
    # principal point -> straight +z, unit length
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(float(dn[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o[0]), [0.0, 2.0, 3.0], atol=1e-6)

    # off-center pixel: d_cam = ((x-cx)/fx, (y-cy)/fy, 1) normalized
    x, y = 480.0, 400.0
    o2, d2, dn2 = camera_rays(jnp.array([x]), jnp.array([y]), intr, twc, tow)
    d_cam = np.array([(x - 320) / 320, (y - 240) / 320, 1.0])
    np.testing.assert_allclose(float(dn2[0]), np.linalg.norm(d_cam), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d2[0]), d_cam / np.linalg.norm(d_cam), rtol=1e-5, atol=1e-6
    )


def test_stratified_distances_bounds_and_monotonic():
    tmin = jnp.array([1.0, 0.0])
    tmax = jnp.array([3.0, 8.0])
    jitter = jnp.asarray(RNG.uniform(size=(2, 32)), jnp.float32)
    t = np.asarray(stratified_distances(tmin, tmax, jitter, 32))
    assert t.shape == (2, 32)
    assert (np.diff(t, axis=-1) > 0).all()
    assert (t >= np.array([1.0, 0.0])[:, None]).all()
    assert (t <= np.array([3.0, 8.0])[:, None] + 1e-5).all()
    # zero jitter -> exact bin left edges
    t0 = np.asarray(stratified_distances(tmin, tmax, jnp.zeros((2, 32)), 32))
    np.testing.assert_allclose(t0[0], 1.0 + (3.0 - 1.0) / 32 * np.arange(32), rtol=1e-5)


def test_orbit_pose_matches_reference_formula():
    # ref GenerateToc nerf_model.cu:2186-2205
    theta, phi, r = 42.0, 30.0, 2.5
    toc = np.asarray(orbit_pose(theta, phi, r))
    t = np.array([
        r * np.cos(np.deg2rad(phi)) * np.cos(np.deg2rad(theta)),
        r * np.cos(np.deg2rad(phi)) * np.sin(np.deg2rad(theta)),
        r * np.sin(np.deg2rad(phi)),
    ])
    np.testing.assert_allclose(toc[:3, 3], t, rtol=1e-5)
    # z axis looks at origin
    np.testing.assert_allclose(toc[:3, 2], -t / np.linalg.norm(t), rtol=1e-5)
    # orthonormal rotation
    R = toc[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5
