"""Build a (FrameStore, ObjectsState) pair from a synthetic scene.

Shared by tests, examples, bench.py and the driver entry — the same wiring
the offline runner performs from on-disk datasets (data/formats.py), but fed
from analytic ground truth.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from romap_tpu.data.frame_store import FrameStore
from romap_tpu.data.synthetic import Camera, make_scene, make_sequence
from romap_tpu.models import nerf


def build_synthetic_world(
    n_objects: int,
    n_frames: int,
    res: int,
    use_depth: bool = False,
    capacity: int | None = None,
    seed: int = 0,
):
    """Returns (cam, objects, frames, store, objs_state)."""
    cam = Camera(fx=res * 0.9, fy=res * 0.9, cx=res / 2, cy=res / 2, h=res, w=res)
    objects = make_scene(n_objects, seed=seed)
    frames = make_sequence(
        cam, objects, n_frames, radius=2.2 if n_objects == 1 else 5.5, seed=seed
    )

    store = FrameStore(len(frames), cam.h, cam.w, cam.intrinsics, use_depth=use_depth)
    for i, f in enumerate(frames):
        store.add_frame(
            i, f["stamp"], f["rgb"], f["instance"], f["twc"],
            depth=f["depth"] if use_depth else None,
        )

    capacity = capacity or n_objects
    max_b = len(frames)
    aabb_min = np.zeros((capacity, 3), np.float32)
    aabb_max = np.ones((capacity, 3), np.float32)
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


def write_room_dataset(root: str, n_frames: int = 80, res: int = 480,
                       n_objects: int = 1, seed: int = 0) -> None:
    """The canonical synthetic 'room' sequence for the online pipeline:
    textured box room + hash-noise spheres, partial orbit (stable monocular
    geometry), written in the reference's on-disk layout including
    bbox/<stamp>.txt detections, instance masks and GT depth."""
    import numpy as np

    from romap_tpu.data.formats import write_dataset
    from romap_tpu.data.synthetic import Camera, Room, make_scene, make_sequence

    cam = Camera(fx=res * 0.95, fy=res * 0.95, cx=res * 2 / 3, cy=res / 2,
                 h=res, w=int(res * 4 / 3))
    objs = make_scene(n_objects, seed=seed)
    if n_objects == 1:
        objs[0].radius = 0.6
    frames = make_sequence(cam, objs, n_frames, radius=2.4, room=Room(),
                           arc=2.2)
    write_dataset(root, cam, frames, objects=objs, use_depth=True)
    # GT geometry sidecar (not part of the reference layout — consumed by
    # the eval harness's mesh-geometry metric, romap_tpu/utils/eval_psnr.py)
    import json
    import os

    with open(os.path.join(root, "gt_objects.json"), "w") as f:
        json.dump(
            {str(i): {"center": [float(c) for c in o.center],
                      "radius": float(o.radius)}
             for i, o in enumerate(objs)}, f, indent=1)
