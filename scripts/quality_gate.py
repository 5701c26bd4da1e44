"""Automated 0.5 dB flagship-parity gate (BASELINE.md acceptance criterion).

Trains the FLAGSHIP encoding (EncodingConfig defaults, the MX-grid config
every runner uses) for the full 5000-step budget on the standard synthetic
world and compares held-out PSNR against the tcnn-semantics hashgrid
anchor recorded in QUALITY.json (re-measure it with
scripts/quality_hashgrid_tpu.py). Exits nonzero when the flagship falls
more than THRESHOLD_DB below the anchor, so an encoding/kernel regression
cannot ship silently. Records the result under QUALITY.json["parity_gate"].

Run on TPU (the shipping configuration):   python scripts/quality_gate.py
Quick CPU smoke (tiny budget, no gate):    python scripts/quality_gate.py --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

THRESHOLD_DB = 0.5  # BASELINE.md parity budget
WAVE = 25  # short waves survive remote-TPU worker flakes (see
           # quality_hashgrid_tpu.py); retry re-uploads the last good state
ITERS = 5000


def measure_flagship_psnr(iters: int, wave: int, res: int = 192,
                          frames_n: int = 24, seed: int = 0) -> float:
    from romap_tpu.config import NerfConfig, TrainConfig
    from romap_tpu.data.world import build_synthetic_world
    from romap_tpu.models import nerf
    from romap_tpu.ops.geometry import camera_rays, ray_aabb_intersect

    cfg = NerfConfig(train=TrainConfig(compute_dtype="bfloat16"))
    spec = nerf.make_field_spec(cfg)
    cam, objects, frames, store, objs = build_synthetic_world(
        1, frames_n, res, seed=seed)
    arrays = store.arrays()
    state = nerf.init_train_state(jax.random.PRNGKey(seed), 1, cfg, spec)
    host_state = jax.device_get(state)

    done = 0
    t0 = time.perf_counter()
    while done < iters:
        try:
            state = nerf.train_objects(state, objs, arrays, cfg, spec, wave)
            host_state = jax.device_get(state)
            done += wave
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
    x0, y0, h, w = test["bboxes"][objects[0].instance_id]
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
    return -10 * float(np.log10(max(mse, 1e-9)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU budget; prints PSNR, never gates")
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--seeds", default="0,1,2",
                    help="comma list; the gate compares the flagship MEAN "
                    "over these seeds against the anchor MEAN over the same "
                    "seeds (a 1-seed gate let ladder steps shave quality "
                    "inside the seed spread — VERDICT r4 weak #2)")
    ap.add_argument("--record-key", default="parity_gate",
                    help="QUALITY.json key to write under; candidate-config "
                    "A/Bs (e.g. MX_SNAP=1) record under their own key so "
                    "the shipping flagship's gate record is never clobbered")
    args = ap.parse_args()

    if args.smoke:
        psnr = measure_flagship_psnr(100, 25, res=64, frames_n=8)
        print(json.dumps({"smoke_psnr_db": round(psnr, 2)}))
        return 0

    seeds = [int(s) for s in args.seeds.split(",") if s != ""]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY.json")
    d = json.load(open(path))
    anchors = d.get("psnr_hashgrid_seeds", {})
    missing = [s for s in seeds if str(s) not in anchors]
    if missing:
        print(f"PARITY GATE: no hashgrid anchor for seed(s) {missing} — "
              f"run scripts/quality_hashgrid_tpu.py --seed <s> first",
              file=sys.stderr)
        return 2
    anchor_by_seed = {s: float(anchors[str(s)]) for s in seeds}
    anchor = float(np.mean(list(anchor_by_seed.values())))
    psnr_by_seed = {}
    for s in seeds:
        psnr_by_seed[s] = measure_flagship_psnr(args.iters, WAVE, seed=s)
        print(json.dumps({"seed": s,
                          "flagship_psnr_db": round(psnr_by_seed[s], 3),
                          "anchor_db": round(anchor_by_seed[s], 3)}),
              flush=True)
    psnr = float(np.mean(list(psnr_by_seed.values())))
    gap = anchor - psnr
    ok = gap <= THRESHOLD_DB
    d[args.record_key] = {
        "flagship_psnr_db": round(psnr, 3),
        "hashgrid_anchor_db": round(anchor, 3),
        "gap_db": round(gap, 3),
        "threshold_db": THRESHOLD_DB,
        "pass": bool(ok),
        "iters": args.iters,
        "seeds": seeds,
        "flagship_by_seed": {str(k): round(v, 3)
                             for k, v in psnr_by_seed.items()},
        "anchor_by_seed": {str(k): round(v, 3)
                           for k, v in anchor_by_seed.items()},
    }
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
    print(json.dumps(d[args.record_key]))
    if not ok:
        print(f"PARITY GATE FAILED: flagship mean {psnr:.2f} dB is "
              f"{gap:.2f} dB below the hashgrid anchor mean {anchor:.2f} dB "
              f"over seeds {seeds} (budget {THRESHOLD_DB} dB)",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
