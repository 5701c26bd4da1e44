"""Photometric refinement of held-out eval-view poses.

The binding constraint on online eval quality is held-out POSE error, not
training budget: shutdown BA refines the keyframes the field trained on
(~1 px reprojection), but the held-out test views keep their raw per-frame
tracking poses, so the renders are compared against misaligned ground truth.
This module closes that gap by optimizing each eval view's SE(3) pose by
gradient descent on the photometric + silhouette loss against the trained,
FROZEN field (the render path is differentiable end-to-end in JAX).

This is a capability beyond the reference, which renders test views at raw
tracking poses (ref Core/src/nerf.cu:255-404); pose-refined evaluation is
standard NeRF practice (e.g. BARF / camera-opt eval protocols).

Shapes are static: V views (padded) x R sampled pixels, one jit compile per
(V_pad, R) bucket; all views refine in one batched Adam loop on device.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from romap_tpu.models.nerf import field_apply
from romap_tpu.ops.geometry import (
    camera_rays,
    ray_aabb_intersect,
    se3_exp,
    stratified_distances,
    warp_point,
)
from romap_tpu.ops.render import volume_render

N_PIXELS = 1536  # sampled pixels per view (2/3 object, 1/3 background)
N_STEPS = 300  # real-session traces still descend at 150 (scripts/debug_refine.py)
N_STARTS = 4  # multi-start basins per view (start 0 = identity)
N_SAMPLES = 32  # samples per ray (pose only needs coarse geometry)
LR = 3e-3
MASK_LAMBDA = 0.5


def _pad_views(n: int) -> int:
    """Pad the view axis to limit jit recompiles (4, 8, 16, ...)."""
    v = 4
    while v < n:
        v *= 2
    return v


def build_refine_batch(boxes, crops, n_px: int = N_PIXELS, seed: int = 0):
    """Select supervision pixels from per-view bbox crops.

    Args:
      boxes: [(x, y, h, w)] per view (absolute image coords).
      crops: [(rgb u8 [h,w,3], mask u8 [h,w])] per view, bbox-sized.
      n_px: pixels per view (static).

    Returns dict of numpy arrays (xy [V,R,2] absolute pixel coords,
    rgb [V,R,3] in [0,1], w_rgb [V,R], mask [V,R], view_valid [V]) with
    V padded; or None if no view has enough object pixels.
    """
    v_pad = _pad_views(len(boxes))
    xy = np.zeros((v_pad, n_px, 2), np.float32)
    rgb = np.zeros((v_pad, n_px, 3), np.float32)
    w_rgb = np.zeros((v_pad, n_px), np.float32)
    mask_t = np.zeros((v_pad, n_px), np.float32)
    valid = np.zeros((v_pad,), bool)
    rng = np.random.default_rng(seed)
    n_obj_px = (2 * n_px) // 3
    for i, ((x0, y0, h, w), (crgb, cmask)) in enumerate(zip(boxes, crops)):
        m = np.asarray(cmask) > 0
        oy, ox = np.nonzero(m)
        by, bx = np.nonzero(~m)
        if len(oy) < 32:
            continue  # too little object evidence to anchor the pose
        take_o = rng.choice(len(oy), n_obj_px, replace=len(oy) < n_obj_px)
        n_bg = n_px - n_obj_px
        if len(by) > 0:
            take_b = rng.choice(len(by), n_bg, replace=len(by) < n_bg)
            ys = np.concatenate([oy[take_o], by[take_b]])
            xs = np.concatenate([ox[take_o], bx[take_b]])
            is_obj = np.concatenate([np.ones(n_obj_px), np.zeros(n_bg)])
        else:
            take_o2 = rng.choice(len(oy), n_px, replace=True)
            ys, xs = oy[take_o2], ox[take_o2]
            is_obj = np.ones(n_px)
        xy[i, :, 0] = xs + x0
        xy[i, :, 1] = ys + y0
        rgb[i] = np.asarray(crgb, np.float32)[ys, xs] / 255.0
        w_rgb[i] = is_obj  # photometric term only where GT shows the object
        mask_t[i] = is_obj  # silhouette target on every sampled pixel
        valid[i] = True
    if not valid.any():
        return None
    return dict(xy=xy, rgb=rgb, w_rgb=w_rgb, mask=mask_t, valid=valid)


@partial(
    jax.jit,
    static_argnames=("cfg", "spec", "n_steps", "n_samples", "n_starts"),
)
def refine_poses(
    params_one,
    intrinsics: jax.Array,
    twc0: jax.Array,  # [V, 4, 4] initial camera-to-world poses
    tow: jax.Array,  # [4, 4] world-to-object
    aabb_min: jax.Array,
    aabb_max: jax.Array,
    xy: jax.Array,  # [V, R, 2]
    rgb_t: jax.Array,  # [V, R, 3]
    w_rgb: jax.Array,  # [V, R]
    mask_t: jax.Array,  # [V, R]
    view_valid: jax.Array,  # [V] bool
    cfg,
    spec,
    n_steps: int = N_STEPS,
    n_samples: int = N_SAMPLES,
    lr: float = LR,
    n_starts: int = N_STARTS,
):
    """Batched pose-only Adam against the frozen field.

    Multi-start: each view optimizes from n_starts initial deltas (the
    zero delta plus small random SE(3) jitters) in one widened batch; the
    per-view argmin over starts and steps wins. Escapes the shallow local
    minima a single photometric descent can stall in.

    Returns (twc_refined [V,4,4], loss0 [V], loss_final [V]).
    """
    params_one = jax.lax.stop_gradient(params_one)
    bg = jnp.full((3,), 1.0, jnp.float32)  # render path's gray background

    n_views = twc0.shape[0]
    s = n_starts
    ex = lambda a: jnp.repeat(a, s, axis=0)  # [V*S, ...], view-major
    twc0_e, xy_e = ex(twc0), ex(xy)
    rgb_e, w_e, mask_e, valid_e = ex(rgb_t), ex(w_rgb), ex(mask_t), ex(view_valid)

    def view_loss(delta):
        twc = twc0_e @ se3_exp(delta)  # [V*S, 4, 4]
        o, d, dn = camera_rays(
            xy_e[..., 0], xy_e[..., 1], intrinsics, twc[:, None, :, :], tow
        )
        tmin, tmax, hit = ray_aabb_intersect(o, d, aabb_min, aabb_max)
        # Sanitize MISS rays before sampling: their tmin/tmax can be +-inf
        # (zero direction components), and inf sample points turn into NaN
        # that survives the where(hit, ...) BACKWARD pass (0 * NaN = NaN)
        # and poisons the whole pose gradient. Give them a tiny finite
        # segment instead; their output is replaced by the background.
        tmin = jnp.where(hit, jnp.maximum(tmin, 0.0), 0.0)
        tmax = jnp.where(hit, tmax, 1e-3)
        t = stratified_distances(tmin, tmax, jnp.full_like(tmin[..., None], 0.5), n_samples)
        pts = warp_point(
            o[..., None, :] + t[..., None] * d[..., None, :], aabb_min, aabb_max
        )
        raw = field_apply(params_one, pts, cfg, spec, dtype=jnp.float32)
        out = volume_render(raw, t, bg)
        opacity = jnp.where(hit, out.mask, 0.0)
        rgb_pred = jnp.where(hit[..., None], out.rgb, bg)
        # photometric term on GT-object pixels; silhouette term everywhere
        rgb_err = jnp.sum((rgb_pred - rgb_e) ** 2, axis=-1)
        per_view = (
            jnp.sum(w_e * rgb_err, axis=-1)
            / jnp.maximum(jnp.sum(w_e, axis=-1), 1.0)
            + MASK_LAMBDA * jnp.mean(jnp.abs(opacity - mask_e), axis=-1)
        )
        per_view = jnp.where(valid_e, per_view, 0.0)
        return jnp.sum(per_view), per_view

    # start 0 = identity; the rest small random SE(3) jitters scaled to the
    # object box (translation) / ~1.7 degrees (rotation)
    box_scale = jnp.mean(aabb_max - aabb_min)
    jit_key = jax.random.PRNGKey(17)
    d0 = jax.random.normal(jit_key, (n_views, s, 6), jnp.float32)
    d0 = d0 * jnp.concatenate(
        [jnp.full((3,), 0.03), jnp.full((3,), 1.0) * 0.03 * box_scale]
    )
    d0 = d0.at[:, 0, :].set(0.0)
    delta0 = d0.reshape(n_views * s, 6)
    _, pv_init = view_loss(delta0)
    loss0 = pv_init.reshape(n_views, s)[:, 0]  # identity-start loss

    grad_fn = jax.value_and_grad(view_loss, has_aux=True)

    def body(i, carry):
        # best-so-far per view: Adam can overshoot near a shallow optimum,
        # and final-step acceptance then discards the good intermediate pose
        delta, m, v, best_delta, best_pv = carry
        (_, pv), g = grad_fn(delta)
        improved = pv < best_pv
        best_delta = jnp.where(improved[:, None], delta, best_delta)
        best_pv = jnp.minimum(pv, best_pv)
        it = jnp.asarray(i + 1, jnp.float32)
        # Adam (per-view independent; the summed loss has disjoint gradients)
        m = 0.9 * m + 0.1 * g
        v = 0.99 * v + 0.01 * g * g
        mh = m / (1.0 - 0.9 ** it)
        vh = v / (1.0 - 0.99 ** it)
        # decay one decade over the run
        step_lr = lr * 0.1 ** (jnp.asarray(i, jnp.float32) / n_steps)
        delta = delta - step_lr * mh / (jnp.sqrt(vh) + 1e-8)
        return delta, m, v, best_delta, best_pv

    delta, _, _, best_delta, best_pv = jax.lax.fori_loop(
        0, n_steps, body,
        (delta0, jnp.zeros_like(delta0), jnp.zeros_like(delta0),
         delta0, pv_init),
    )
    _, loss_last = view_loss(delta)
    use_last = loss_last < best_pv
    best_delta = jnp.where(use_last[:, None], delta, best_delta)
    best_pv = jnp.minimum(loss_last, best_pv)
    # per-view argmin over starts
    pv_vs = best_pv.reshape(n_views, s)
    start_ix = jnp.argmin(pv_vs, axis=1)  # [V]
    loss_f = jnp.take_along_axis(pv_vs, start_ix[:, None], axis=1)[:, 0]
    best_delta = jnp.take_along_axis(
        best_delta.reshape(n_views, s, 6), start_ix[:, None, None], axis=1
    )[:, 0]
    # keep a refined pose only where it actually improved on the initial
    better = (loss_f < loss0) & view_valid
    twc = jnp.where(better[:, None, None], twc0 @ se3_exp(best_delta), twc0)
    return twc, loss0, loss_f


def refine_view_poses_host(
    params_one, intrinsics, twcs, tow, aabb_min, aabb_max, boxes, crops, cfg,
    spec, n_steps: int = N_STEPS, n_starts: int = N_STARTS,
):
    """Host wrapper: pixel selection + padding + jitted refinement.

    Args mirror render_nerfs_test; `crops` is a per-view list of
    (rgb u8 [h,w,3], mask u8 [h,w]) bbox crops of the ORIGINAL images.
    Returns (refined twcs as a list of [4,4] float32 arrays, stats dict).
    """
    batch = build_refine_batch(boxes, crops)
    if batch is None:
        return [np.asarray(t, np.float32) for t in twcs], {"refined": 0}
    v_pad = batch["xy"].shape[0]
    twc0 = np.zeros((v_pad, 4, 4), np.float32)
    twc0[:] = np.eye(4)
    for i, t in enumerate(twcs):
        twc0[i] = np.asarray(t, np.float32)
    twc, loss0, loss_f = refine_poses(
        params_one,
        jnp.asarray(intrinsics, jnp.float32),
        jnp.asarray(twc0),
        jnp.asarray(tow, jnp.float32),
        jnp.asarray(aabb_min, jnp.float32),
        jnp.asarray(aabb_max, jnp.float32),
        jnp.asarray(batch["xy"]),
        jnp.asarray(batch["rgb"]),
        jnp.asarray(batch["w_rgb"]),
        jnp.asarray(batch["mask"]),
        jnp.asarray(batch["valid"]),
        cfg,
        spec,
        n_steps=n_steps,
        n_starts=n_starts,
    )
    twc = np.asarray(jax.device_get(twc))
    loss0 = np.asarray(jax.device_get(loss0))
    loss_f = np.asarray(jax.device_get(loss_f))
    n = len(twcs)
    stats = {
        "refined": int(np.sum(loss_f[:n] < loss0[:n])),
        "mean_loss_before": float(np.mean(loss0[:n][batch["valid"][:n]]))
        if batch["valid"][:n].any() else 0.0,
        "mean_loss_after": float(np.mean(
            np.minimum(loss_f, loss0)[:n][batch["valid"][:n]]))
        if batch["valid"][:n].any() else 0.0,
    }
    return [twc[i] for i in range(n)], stats
