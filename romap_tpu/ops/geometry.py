"""Ray/AABB geometry, camera ray generation, and stratified sampling.

Pure-jnp, batched, static-shape versions of the reference's ray kernels:
  * ray_aabb_intersect    <- ray_intersect        (ref nerf_model.cu:87-138)
  * warp_point/unwarp     <- WarpPoint/UnWarpPoint (ref nerf_model.cu:140-150)
  * camera_rays           <- the pixel->camera->world->object transform inside
                             GenerateRays          (ref nerf_model.cu:403-413)
  * stratified_distances  <- GenerateInputPoints   (ref nerf_model.cu:536-591)

Everything here broadcasts over arbitrary leading batch axes and is designed
to live under jit/vmap: no data-dependent shapes, misses are reported with a
boolean mask instead of the reference's FLT_MAX sentinel.
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_aabb_intersect(o, d, box_min, box_max):
    """Slab-method ray/AABB intersection.

    Args:
      o: [..., 3] ray origins (object frame).
      d: [..., 3] ray directions (need not be normalized).
      box_min, box_max: [3] (or broadcastable) AABB corners.

    Returns:
      (tmin, tmax, hit): [...] each. ``hit`` is False where the ray misses the
      box (the reference returns FLT_MAX, ref nerf_model.cu:106-108,125-127).
      ``tmin`` is NOT clamped to 0 here; GenerateRays clamps (ref :423).
    """
    # Safe division: an exactly-zero direction component would produce
    # +/-inf slopes. Forward, the min/max logic handles inf (CUDA
    # semantics) — but under DIFFERENTIATION w.r.t. the ray (pose
    # refinement / joint BA), the inf branch's Jacobian is inf and even a
    # zero cotangent turns it into NaN (0 * inf). Clamping |d| to 1e-12
    # keeps the slopes finite-huge (~1e12): selection behavior is
    # identical, gradients stay finite.
    d_safe = jnp.where(
        jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d
    )
    t0 = (box_min - o) / d_safe
    t1 = (box_max - o) / d_safe
    per_axis_min = jnp.minimum(t0, t1)
    per_axis_max = jnp.maximum(t0, t1)
    tmin = jnp.max(per_axis_min, axis=-1)
    tmax = jnp.min(per_axis_max, axis=-1)
    hit = tmin <= tmax
    return tmin, tmax, hit


def warp_point(p, box_min, box_max):
    """Map object-frame point(s) into the unit cube of the AABB (ref :140-144)."""
    return (p - box_min) / (box_max - box_min)


def unwarp_point(p, box_min, box_max):
    """Inverse of warp_point (ref nerf_model.cu:146-150)."""
    return box_min + p * (box_max - box_min)


def pixel_dirs(x, y, intrinsics):
    """Camera-frame ray directions for pixel coords.

    Args:
      x, y: [...] pixel coordinates (float or int).
      intrinsics: [4] = (fx, fy, cx, cy) (ref nerf_data.cu:221-227).

    Returns:
      (d_cam, d_norm): [..., 3] unnormalized camera-frame dirs (z=1) and their
      norms. The reference keeps d_norm to convert z-depth <-> ray distance
      (ref nerf_model.cu:403-406, 432).
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    d = jnp.stack([(x - cx) / fx, (y - cy) / fy, jnp.ones_like(x)], axis=-1)
    d_norm = jnp.linalg.norm(d, axis=-1)
    return d, d_norm


def camera_rays(x, y, intrinsics, pose_wc, obj_tow):
    """Pixel -> world -> object-frame rays (ref nerf_model.cu:403-413).

    Args:
      x, y: [...] pixel coordinates.
      intrinsics: [4] (fx, fy, cx, cy).
      pose_wc: [..., 4, 4] or [4, 4] camera-to-world transform(s) Twc.
      obj_tow: [4, 4] world-to-object transform Tow.

    Returns:
      (o, d, d_norm): object-frame origins [..., 3], unit directions [..., 3]
      (rotations preserve the camera-frame normalization), and d_norm [...].
    """
    d_cam, d_norm = pixel_dirs(x, y, intrinsics)
    d_cam = d_cam / d_norm[..., None]  # reference normalizes before rotating
    r_wc = pose_wc[..., :3, :3]
    t_wc = pose_wc[..., :3, 3]
    d_w = jnp.einsum("...ij,...j->...i", r_wc, d_cam)
    r_ow = obj_tow[:3, :3]
    t_ow = obj_tow[:3, 3]
    d_o = jnp.einsum("ij,...j->...i", r_ow, d_w)
    o_o = jnp.einsum("ij,...j->...i", r_ow, t_wc) + t_ow
    o_o = jnp.broadcast_to(o_o, d_o.shape)
    return o_o, d_o, d_norm


def stratified_distances(tmin, tmax, jitter, n_samples: int):
    """Jittered stratified sample distances along each ray.

    t_n = tmin + dt * (n + u_n), dt = (tmax - tmin)/S, u_n ~ U[0,1)
    (ref nerf_model.cu:546-556).

    Args:
      tmin, tmax: [...] per-ray bounds.
      jitter: [..., S] uniforms in [0, 1).
      n_samples: S (static).

    Returns:
      t: [..., S] monotonically increasing distances.
    """
    dt = (tmax - tmin) / float(n_samples)
    n = jnp.arange(n_samples, dtype=jnp.float32)
    return tmin[..., None] + dt[..., None] * (n + jitter)


def se3_exp(delta):
    """SE(3) exponential map: [..., 6] (omega, v) -> [..., 4, 4].

    Small-angle safe (Taylor fallbacks below 1e-6). Used by the photometric
    pose refiner (a capability beyond the reference, which renders eval
    views at raw tracking poses, ref nerf.cu:255-404).
    """
    w = delta[..., :3]
    v = delta[..., 3:]
    theta2_raw = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    small = theta2_raw < 1e-12
    # Safe-denominator pattern: the untaken where-branch is still
    # DIFFERENTIATED, and (theta - sin theta)/theta^3 has a divide-by-~0
    # gradient at theta=0 that would poison the whole backward pass with
    # NaN. Substitute theta=1 wherever the Taylor branch wins.
    theta2 = jnp.where(small, 1.0, theta2_raw)
    theta = jnp.sqrt(theta2)
    zeros = jnp.zeros_like(w[..., 0])
    k = jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )  # [..., 3, 3]
    kk = k @ k
    a = jnp.where(small, 1.0 - theta2_raw / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2_raw / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2_raw / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=delta.dtype), k.shape)
    r = eye + a * k + b * kk
    vmat = eye + b * k + c * kk
    t = jnp.einsum("...ij,...j->...i", vmat, v)
    top = jnp.concatenate([r, t[..., None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], delta.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def orbit_pose(theta_deg, phi_deg, radius):
    """Object-centric orbit camera pose Toc (ref GenerateToc nerf_model.cu:2186-2205).

    Camera placed on a sphere at (theta, phi, r), z-axis looking at the origin,
    x-axis horizontal at angle theta+90deg.
    Returns a [4, 4] jnp array.
    """
    theta = jnp.deg2rad(theta_deg)
    phi = jnp.deg2rad(phi_deg)
    z = radius * jnp.sin(phi)
    x = radius * jnp.cos(phi) * jnp.cos(theta)
    y = radius * jnp.cos(phi) * jnp.sin(theta)
    t = jnp.stack([x, y, z])
    z_axis = -t / jnp.linalg.norm(t)
    r_v = theta + jnp.deg2rad(90.0)
    x_axis = jnp.stack([jnp.cos(r_v), jnp.sin(r_v), jnp.zeros_like(r_v)])
    x_axis = x_axis / jnp.linalg.norm(x_axis)
    y_axis = jnp.cross(z_axis, x_axis)
    y_axis = y_axis / jnp.linalg.norm(y_axis)
    toc = jnp.eye(4, dtype=jnp.float32)
    toc = toc.at[:3, 0].set(x_axis)
    toc = toc.at[:3, 1].set(y_axis)
    toc = toc.at[:3, 2].set(z_axis)
    toc = toc.at[:3, 3].set(t)
    return toc
