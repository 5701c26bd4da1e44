"""End-to-end demo: train object NeRFs on a synthetic scene and render them.

Drives the public romap_tpu API exactly the way the offline runner does:
build a frame store + object table from a generated scene, run the batched
train step, then render a held-out view and report PSNR.

Usage: python examples/train_synthetic.py [--objects N] [--iters N] [--res R]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from romap_tpu.config import NerfConfig
from romap_tpu.data.frame_store import FrameStore
from romap_tpu.data.synthetic import Camera, make_scene, make_sequence
from romap_tpu.models import nerf
from romap_tpu.ops import hashgrid
from romap_tpu.ops.geometry import camera_rays, pixel_dirs, ray_aabb_intersect


def build_world(n_objects: int, n_frames: int, res: int, use_depth: bool):
    cam = Camera(fx=res * 0.9, fy=res * 0.9, cx=res / 2, cy=res / 2, h=res, w=res)
    objects = make_scene(n_objects)
    frames = make_sequence(cam, objects, n_frames, radius=2.2 if n_objects == 1 else 5.5)

    store = FrameStore(len(frames), cam.h, cam.w, cam.intrinsics, use_depth=use_depth)
    for i, f in enumerate(frames):
        store.add_frame(i, f["stamp"], f["rgb"], f["instance"], f["twc"],
                        depth=f["depth"] if use_depth else None)

    max_b = len(frames)
    capacity = n_objects
    objs = nerf.empty_objects(capacity, max_b)
    aabb_min = np.zeros((capacity, 3), np.float32)
    aabb_max = np.zeros((capacity, 3), np.float32)
    tow = np.tile(np.eye(4, dtype=np.float32), (capacity, 1, 1))
    iid = np.zeros(capacity, np.int32)
    bboxes = np.zeros((capacity, max_b, 5), np.int32)
    n_bbox = np.zeros(capacity, np.int32)
    active = np.zeros(capacity, bool)
    for oi, obj in enumerate(objects):
        half = obj.aabb_half_extents() * 1.1  # ref nerf.cu:170-172 inflation
        aabb_min[oi], aabb_max[oi] = -half, half
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = -obj.center  # Tow: world -> object (identity rotation)
        tow[oi] = t
        iid[oi] = obj.instance_id
        nb = 0
        for fi, f in enumerate(frames):
            bb = f["bboxes"][obj.instance_id]
            if bb is not None:
                bboxes[oi, nb] = (fi, *bb)
                nb += 1
        n_bbox[oi] = nb
        active[oi] = nb > 0
    objs = nerf.ObjectsState(
        aabb_min=jnp.asarray(aabb_min), aabb_max=jnp.asarray(aabb_max),
        tow=jnp.asarray(tow), instance_id=jnp.asarray(iid),
        bboxes=jnp.asarray(bboxes), n_bbox=jnp.asarray(n_bbox),
        active=jnp.asarray(active),
    )
    return cam, objects, frames, store, objs


def render_object_view(state, objs, cam, frame, obj_idx, cfg, spec, bbox):
    """Render the object's bbox rect from a frame pose, reference-style."""
    x0, y0, h, w = bbox
    ys, xs = np.mgrid[y0 : y0 + h, x0 : x0 + w]
    params = jax.tree.map(lambda a: a[obj_idx], state.ema)
    o, d, dn = camera_rays(
        jnp.asarray(xs.ravel(), jnp.float32), jnp.asarray(ys.ravel(), jnp.float32),
        jnp.asarray(cam.intrinsics), jnp.asarray(frame["twc"]),
        objs.tow[obj_idx],
    )
    tmin, tmax, hit = ray_aabb_intersect(o, d, objs.aabb_min[obj_idx], objs.aabb_max[obj_idx])
    tmin = jnp.maximum(tmin, 0.0)
    jitter = jax.random.uniform(jax.random.PRNGKey(0), (o.shape[0], cfg.train.render_samples_per_ray))
    rgb, depth, mask = nerf.render_rays(
        params, o, d, dn, tmin, tmax, hit, jitter,
        objs.aabb_min[obj_idx], objs.aabb_max[obj_idx], cfg, spec,
        n_samples=cfg.train.render_samples_per_ray,
    )
    return (np.asarray(rgb).reshape(h, w, 3), np.asarray(depth).reshape(h, w),
            np.asarray(mask).reshape(h, w))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=1)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--use-depth", action="store_true")
    ap.add_argument("--encoding", default="mxgrid", choices=["mxgrid", "hashgrid"])
    args = ap.parse_args()

    import dataclasses
    cfg = NerfConfig()
    cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(cfg.encoding, kind=args.encoding))
    spec = nerf.make_field_spec(cfg)
    cam, objects, frames, store, objs = build_world(
        args.objects, args.frames, args.res, args.use_depth
    )
    print(f"devices: {jax.devices()}")
    print(f"objects: {args.objects}, frames: {len(frames)}, img {args.res}x{args.res}")

    state = nerf.init_train_state(jax.random.PRNGKey(cfg.seed), args.objects, cfg, spec)
    arrays = store.arrays()

    # compile
    t0 = time.perf_counter()
    state = nerf.train_objects(state, objs, arrays, cfg, spec, 1, args.use_depth)
    jax.block_until_ready(state.loss)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s  loss={np.asarray(state.loss)}")

    waves = 4
    per_wave = max(args.iters // waves, 1)
    for wv in range(waves):
        t0 = time.perf_counter()
        state = nerf.train_objects(state, objs, arrays, cfg, spec, per_wave, args.use_depth)
        jax.block_until_ready(state.loss)
        dt = time.perf_counter() - t0
        print(
            f"wave {wv}: {per_wave} iters x {args.objects} obj in {dt:.2f}s "
            f"({per_wave * args.objects / dt:.1f} obj-iters/s) loss={np.asarray(state.loss)}"
        )

    # held-out render vs analytic ground truth
    test_frame = frames[len(frames) // 2]
    for oi, obj in enumerate(objects):
        bb = test_frame["bboxes"][obj.instance_id]
        if bb is None:
            continue
        rgb, depth, mask = render_object_view(state, objs, cam, test_frame, oi, cfg, spec, bb)
        x0, y0, h, w = bb
        gt = test_frame["rgb"][y0 : y0 + h, x0 : x0 + w].astype(np.float32) / 255.0
        gt_inst = test_frame["instance"][y0 : y0 + h, x0 : x0 + w] == obj.instance_id
        mse = float(np.mean((rgb[gt_inst] - gt[gt_inst]) ** 2))
        psnr = -10 * np.log10(mse) if mse > 0 else np.inf
        iou = float(np.sum((mask > 0.5) & gt_inst) / max(np.sum((mask > 0.5) | gt_inst), 1))
        print(f"object {oi}: held-out PSNR(obj px) = {psnr:.2f} dB, mask IoU = {iou:.3f}")


if __name__ == "__main__":
    main()
