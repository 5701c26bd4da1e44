"""Speed + quality ladder on the real TPU.

Phase 1: bench remaining flagship config candidates (50-iter waves, 10 obj).
Phase 2: the BASELINE.md 0.5 dB criterion — train ONE object for 5000 steps
         (the reference's offline budget, ref nerf_manager.cu:89 x
         nerf_model.cu:1635) at full batch geometry on the adversarial
         hash-noise sphere, measure held-out PSNR, for each candidate AND
         the tcnn-semantics hashgrid. Writes QUALITY.json.
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

BF16 = TrainConfig(compute_dtype="bfloat16")

CANDIDATES = {
    "cp512_k128_p8": EncodingConfig(mx_levels=7, mx_max_resolution=512,
                                    mx_features=128, mx_plane_specs=((128, 8),)),
    "cp512_k64_p8": EncodingConfig(mx_levels=7, mx_max_resolution=512,
                                   mx_features=64, mx_plane_specs=((128, 8),)),
    "cp256_k128_p8": EncodingConfig(mx_levels=6, mx_max_resolution=256,
                                    mx_features=128, mx_plane_specs=((128, 8),)),
    "cp512_k64_p16": EncodingConfig(mx_levels=7, mx_max_resolution=512,
                                    mx_features=64, mx_plane_specs=((128, 16),)),
    "r1_flagship": EncodingConfig(),  # 8/1024 K64 planes (128,16)
}
HASHGRID = EncodingConfig(kind="hashgrid")  # tcnn parity, base.json:23-29


def bench(name, cfg, objs, frames):
    try:
        spec = nerf.make_field_spec(cfg)
        state = nerf.init_train_state(jax.random.PRNGKey(0), 10, cfg, spec)
        state = nerf.train_objects(state, objs, frames, cfg, spec, 50)
        jax.device_get(state.loss)
        t0 = time.perf_counter()
        for _ in range(3):
            state = nerf.train_objects(state, objs, frames, cfg, spec, 50)
        jax.device_get(state.loss)
        dt = time.perf_counter() - t0
        v = round(10 * 50 * 3 / dt, 1)
        print(json.dumps({"bench": name, "obj_iters_per_s": v}), flush=True)
        return v
    except Exception as e:
        print(json.dumps({"bench": name, "error": str(e)[-400:]}), flush=True)
        return 0.0


def quality(name, enc, iters=5000, seed=0):
    """Held-out PSNR after `iters` steps at reference batch geometry.

    seed varies the scene draw (single-seed spread is ~0.3 dB — average
    over >=3 seeds when comparing configs closer than that)."""
    try:
        cfg = NerfConfig(encoding=enc, train=BF16)
        spec = nerf.make_field_spec(cfg)
        cam, objects, frames, store, objs = build_synthetic_world(
            1, 24, 192, seed=seed)
        state = nerf.init_train_state(jax.random.PRNGKey(0), 1, cfg, spec)
        arrays = store.arrays()
        t0 = time.perf_counter()
        done = 0
        while done < iters:
            n = min(500, iters - done)
            state = nerf.train_objects(state, objs, arrays, cfg, spec, n)
            done += n
        jax.device_get(state.loss)
        train_s = time.perf_counter() - t0

        test = frames[len(frames) // 2]
        bb = test["bboxes"][objects[0].instance_id]
        x0, y0, h, w = bb
        ys, xs = np.mgrid[y0:y0 + h, x0:x0 + w]
        params = jax.tree.map(lambda a: a[0], state.ema)
        o, d, dn = camera_rays(
            jnp.asarray(xs.ravel(), jnp.float32),
            jnp.asarray(ys.ravel(), jnp.float32),
            jnp.asarray(cam.intrinsics), jnp.asarray(test["twc"]), objs.tow[0])
        tmin, tmax, hit = ray_aabb_intersect(o, d, objs.aabb_min[0],
                                             objs.aabb_max[0])
        jitter = jax.random.uniform(jax.random.PRNGKey(1), (o.shape[0], 64))
        rgb, _, _ = nerf.render_rays(
            params, o, d, dn, jnp.maximum(tmin, 0), tmax, hit, jitter,
            objs.aabb_min[0], objs.aabb_max[0], cfg, spec, n_samples=64)
        rgb = np.asarray(rgb).reshape(h, w, 3)
        gt = test["rgb"][y0:y0 + h, x0:x0 + w].astype(np.float32) / 255.0
        m = test["instance"][y0:y0 + h, x0:x0 + w] == objects[0].instance_id
        mse = float(np.mean((rgb[m] - gt[m]) ** 2))
        psnr = -10 * float(np.log10(max(mse, 1e-9)))
        print(json.dumps({"quality": name, "seed": seed,
                          "psnr_db": round(psnr, 2),
                          "train_s": round(train_s, 1)}), flush=True)
        return psnr
    except Exception as e:
        print(json.dumps({"quality": name, "error": str(e)[-400:]}), flush=True)
        return 0.0


def main():
    _, _, _, store, objs = build_synthetic_world(n_objects=10, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    speeds = {}
    for name, enc in CANDIDATES.items():
        speeds[name] = bench(name, NerfConfig(encoding=enc, train=BF16),
                             objs, frames)

    results = {"speeds": speeds, "psnr": {}}
    for name in ("cp512_k128_p8", "cp512_k64_p16", "r1_flagship"):
        results["psnr"][name] = quality(name, CANDIDATES[name])
    results["psnr"]["hashgrid_tcnn"] = quality("hashgrid_tcnn", HASHGRID)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "QUALITY.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
