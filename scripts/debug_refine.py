"""Offline pose-refinement iteration against a captured session.

Loads the ROMAP_SAVE_STATE checkpoint + refine-input dump from an online
run and replays the photometric refinement with step-by-step loss traces,
so the optimizer can be tuned without re-running SLAM.

usage: python scripts/debug_refine.py <ckpt_path> [--small] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--small", action="store_true",
                    help="server ran with --small config")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--obj", type=int, default=0)
    args = ap.parse_args()

    from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
    from romap_tpu.models import nerf
    from romap_tpu.runtime import pose_refine as pr
    from romap_tpu.utils.checkpoint import load_checkpoint

    if args.small:
        cfg = NerfConfig(
            encoding=EncodingConfig(kind="mxgrid", mx_levels=3,
                                    mx_max_resolution=64, mx_features=16,
                                    mx_plane_res=32, mx_plane_features=8),
            train=TrainConfig(rays_per_batch=512, samples_per_ray=16,
                              mc_resolution=17),
        )
    else:
        cfg = NerfConfig()
    spec = nerf.make_field_spec(cfg)

    ck = load_checkpoint(args.ckpt)
    state = ck["state"]
    with open(f"{args.ckpt}.refine_obj{args.obj}.pkl", "rb") as f:
        d = pickle.load(f)
    params = jax.tree.map(lambda a: jnp.asarray(a[args.obj]), state["ema"])
    # orbax restores tuples as lists; the encoding's custom VJP needs the
    # original container types back
    def _retuple(node):
        if isinstance(node, dict):
            return {k: _retuple(v) for k, v in node.items()}
        if isinstance(node, list):
            return tuple(_retuple(v) for v in node)
        return node
    params = _retuple(params)

    batch = pr.build_refine_batch(d["boxes"], d["pixels"])
    v_pad = batch["xy"].shape[0]
    twc0 = np.tile(np.eye(4, dtype=np.float32), (v_pad, 1, 1))
    for i, t in enumerate(d["twcs"]):
        twc0[i] = np.asarray(t, np.float32)

    from functools import partial

    from romap_tpu.models.nerf import field_apply
    from romap_tpu.ops.geometry import (
        camera_rays, ray_aabb_intersect, se3_exp, stratified_distances,
        warp_point)
    from romap_tpu.ops.render import volume_render

    intr = jnp.asarray(d["intrinsics"], jnp.float32)
    tow = jnp.asarray(d["tow"], jnp.float32)
    amn = jnp.asarray(d["aabb_min"], jnp.float32)
    amx = jnp.asarray(d["aabb_max"], jnp.float32)
    xy = jnp.asarray(batch["xy"])
    rgb_t = jnp.asarray(batch["rgb"])
    w_rgb = jnp.asarray(batch["w_rgb"])
    mask_t = jnp.asarray(batch["mask"])
    valid = jnp.asarray(batch["valid"])
    twc0 = jnp.asarray(twc0)
    bg = jnp.full((3,), 1.0, jnp.float32)
    params = jax.lax.stop_gradient(params)

    @jax.jit
    def view_loss(delta):
        twc = twc0 @ se3_exp(delta)
        o, dd, dn = camera_rays(xy[..., 0], xy[..., 1], intr,
                                twc[:, None, :, :], tow)
        tmin, tmax, hit = ray_aabb_intersect(o, dd, amn, amx)
        tmin = jnp.where(hit, jnp.maximum(tmin, 0.0), 0.0)
        tmax = jnp.where(hit, tmax, 1e-3)
        t = stratified_distances(tmin, tmax,
                                 jnp.full_like(tmin[..., None], 0.5), 32)
        pts = warp_point(o[..., None, :] + t[..., None] * dd[..., None, :],
                         amn, amx)
        raw = field_apply(params, pts, cfg, spec, dtype=jnp.float32)
        out = volume_render(raw, t, bg)
        opacity = jnp.where(hit, out.mask, 0.0)
        rgb_pred = jnp.where(hit[..., None], out.rgb, bg)
        rgb_err = jnp.sum((rgb_pred - rgb_t) ** 2, axis=-1)
        pv = (jnp.sum(w_rgb * rgb_err, -1)
              / jnp.maximum(jnp.sum(w_rgb, -1), 1.0)
              + 0.5 * jnp.mean(jnp.abs(opacity - mask_t), -1))
        return jnp.sum(jnp.where(valid, pv, 0.0)), pv

    grad_fn = jax.jit(jax.value_and_grad(view_loss, has_aux=True))
    delta = jnp.zeros((v_pad, 6))
    m = jnp.zeros_like(delta)
    v = jnp.zeros_like(delta)
    (_, pv0), _ = grad_fn(delta)
    print("loss0 per view:", np.round(np.asarray(pv0), 4))
    for i in range(args.steps):
        (total, pv), g = grad_fn(delta)
        if i % 10 == 0:
            gn = float(jnp.linalg.norm(g))
            print(f"step {i:4d} total {float(total):.4f} |g| {gn:.4f} "
                  f"dmax {float(jnp.abs(delta).max()):.4f}")
        m = 0.9 * m + 0.1 * g
        v = 0.99 * v + 0.01 * g * g
        mh = m / (1 - 0.9 ** (i + 1))
        vh = v / (1 - 0.99 ** (i + 1))
        lr = args.lr * 0.1 ** (i / args.steps)
        delta = delta - lr * mh / (jnp.sqrt(vh) + 1e-8)
    (_, pvf), _ = grad_fn(delta)
    print("loss_final per view:", np.round(np.asarray(pvf), 4))
    print("improved:", int(np.sum(np.asarray(pvf) < np.asarray(pv0))), "/",
          int(np.asarray(valid).sum()))


if __name__ == "__main__":
    main()
