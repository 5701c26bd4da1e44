"""Hashgrid (tcnn-parity) 5000-step PSNR on TPU with short waves.

The 500-iter wave used by quality() is a single ~7-minute XLA program at
hashgrid speed (~0.9 s/iter, gather-bound) and flakily crashes the remote
TPU worker; 25-iter waves (~20 s programs) with checkpoint-free retry get
the same 5000 steps through reliably. Writes psnr.hashgrid_tcnn into
QUALITY.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
from romap_tpu.data.world import build_synthetic_world
from romap_tpu.models import nerf
from romap_tpu.ops.geometry import camera_rays, ray_aabb_intersect

WAVE = 25
ITERS = 5000


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0,
                    help="scene + init seed; the parity gate compares "
                    "3-seed means (VERDICT r4 next #3)")
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()
    seed = args.seed

    cfg = NerfConfig(encoding=EncodingConfig(kind="hashgrid"),
                     train=TrainConfig(compute_dtype="bfloat16"))
    spec = nerf.make_field_spec(cfg)
    cam, objects, frames, store, objs = build_synthetic_world(
        1, 24, 192, seed=seed)
    arrays = store.arrays()
    state = nerf.init_train_state(jax.random.PRNGKey(seed), 1, cfg, spec)
    host_state = jax.device_get(state)  # restart point on worker crash

    done = 0
    t0 = time.perf_counter()
    while done < args.iters:
        try:
            state = nerf.train_objects(state, objs, arrays, cfg, spec, WAVE)
            host_state = jax.device_get(state)
            done += WAVE
            if done % 500 == 0:
                print(json.dumps({"done": done,
                                  "loss": float(host_state.loss[0]),
                                  "s": round(time.perf_counter() - t0, 1)}),
                      flush=True)
        except Exception as e:  # worker crash: re-upload and continue
            print(json.dumps({"retry_at": done, "err": str(e)[-120:]}),
                  flush=True)
            time.sleep(20)
            state = jax.device_put(host_state)

    test = frames[len(frames) // 2]
    bb = test["bboxes"][objects[0].instance_id]
    x0, y0, h, w = bb
    ys, xs = np.mgrid[y0:y0 + h, x0:x0 + w]
    params = jax.tree.map(lambda a: a[0], state.ema)
    o, d, dn = camera_rays(
        jnp.asarray(xs.ravel(), jnp.float32), jnp.asarray(ys.ravel(), jnp.float32),
        jnp.asarray(cam.intrinsics), jnp.asarray(test["twc"]), objs.tow[0])
    tmin, tmax, hit = ray_aabb_intersect(o, d, objs.aabb_min[0], objs.aabb_max[0])
    jitter = jax.random.uniform(jax.random.PRNGKey(1), (o.shape[0], 64))
    rgb, _, _ = nerf.render_rays(
        params, o, d, dn, jnp.maximum(tmin, 0), tmax, hit, jitter,
        objs.aabb_min[0], objs.aabb_max[0], cfg, spec, n_samples=64)
    rgb = np.asarray(rgb).reshape(h, w, 3)
    gt = test["rgb"][y0:y0 + h, x0:x0 + w].astype(np.float32) / 255.0
    m = test["instance"][y0:y0 + h, x0:x0 + w] == objects[0].instance_id
    mse = float(np.mean((rgb[m] - gt[m]) ** 2))
    psnr = -10 * float(np.log10(max(mse, 1e-9)))
    print(json.dumps({"quality": "hashgrid_tcnn", "seed": seed,
                      "psnr_db": round(psnr, 2)}), flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY.json")
    d = json.load(open(path))
    # per-seed anchors: the parity gate compares 3-seed means so a ladder
    # step cannot win seed 0 while losing the mean (VERDICT r4 weak #2)
    d.setdefault("psnr_hashgrid_seeds", {})[str(seed)] = psnr
    if seed == 0:
        d["psnr"]["hashgrid_tcnn"] = psnr
    with open(path, "w") as f:
        json.dump(d, f, indent=1)


if __name__ == "__main__":
    main()
