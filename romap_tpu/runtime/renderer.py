"""Host-side rendering helpers: bbox-rect views and 360 orbit videos.

Wraps the jitted models.nerf.render_rays with ray-count padding (rays are
bucketed to limit recompiles — the reference instead allocates an exact-size
workspace per call, ref NeRF_Model::Render nerf_model.cu:1702-1830).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from romap_tpu.models import nerf
from romap_tpu.ops.geometry import camera_rays, orbit_pose, ray_aabb_intersect


def _bucket(n: int) -> int:
    b = 4096
    while b < n:
        b *= 2
    return b


def render_view(
    params_one,
    intrinsics: np.ndarray,
    twc: np.ndarray,
    tow,
    aabb_min,
    aabb_max,
    box_xyhw: tuple[int, int, int, int],
    cfg,
    spec,
    key=None,
    background: float = 1.0,
):
    """Render the pixel rect (x, y, h, w) of a posed view for one object.

    Returns (rgb [h,w,3] f32, depth [h,w] f32 z-depth, mask [h,w] f32),
    reference semantics: 64 samples, fp32, gray background, mask>0.5 gate
    (ref VolumeRender_Render nerf_model.cu:1134-1229).
    """
    x0, y0, h, w = (int(v) for v in box_xyhw)
    n = h * w
    m = _bucket(n)
    ys, xs = np.mgrid[y0 : y0 + h, x0 : x0 + w]
    xs = np.pad(xs.ravel().astype(np.float32), (0, m - n))
    ys = np.pad(ys.ravel().astype(np.float32), (0, m - n))

    o, d, dn = camera_rays(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(intrinsics),
        jnp.asarray(twc, jnp.float32), jnp.asarray(tow, jnp.float32),
    )
    tmin, tmax, hit = ray_aabb_intersect(
        o, d, jnp.asarray(aabb_min, jnp.float32), jnp.asarray(aabb_max, jnp.float32)
    )
    tmin = jnp.maximum(tmin, 0.0)
    key = key if key is not None else jax.random.PRNGKey(0)
    jitter = jax.random.uniform(key, (m, cfg.train.render_samples_per_ray))
    rgb, depth, mask = nerf.render_rays(
        params_one, o, d, dn, tmin, tmax, hit, jitter,
        jnp.asarray(aabb_min, jnp.float32), jnp.asarray(aabb_max, jnp.float32),
        cfg, spec, n_samples=cfg.train.render_samples_per_ray,
        background=background,
    )
    rgb = np.asarray(rgb)[:n].reshape(h, w, 3)
    depth = np.asarray(depth)[:n].reshape(h, w)
    mask = np.asarray(mask)[:n].reshape(h, w)
    return rgb, depth, mask


def orbit_poses(n_poses: int = 60, phi_deg: float = 30.0, radius: float = 1.0):
    """The reference's 360-video pose ring (ref RenderVideo nerf_model.cu:
    1834-1845: theta steps of 360/60, starting at one step)."""
    step = 360.0 / n_poses
    return [
        np.asarray(orbit_pose(step * (i + 1), phi_deg, radius))
        for i in range(n_poses)
    ]
