"""Time train_objects (50-iter waves, 10 objects) across encoder configs on
the real TPU. Prints one JSON line per variant. Each variant costs a remote
compile (30-300s) — run in background.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
from romap_tpu.data.world import build_synthetic_world
from romap_tpu.models import nerf

N_OBJ = 10
ITERS = 50


def run_variant(name, cfg, objs, frames):
    try:
        spec = nerf.make_field_spec(cfg)
        state = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg, spec)
        t_c0 = time.perf_counter()
        state = nerf.train_objects(state, objs, frames, cfg, spec, ITERS)
        jax.device_get(state.loss)
        compile_s = time.perf_counter() - t_c0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            state = nerf.train_objects(state, objs, frames, cfg, spec, ITERS)
        loss = jax.device_get(state.loss)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": name,
            "obj_iters_per_s": round(N_OBJ * ITERS * reps / dt, 1),
            "ms_per_iter": round(dt / (ITERS * reps) * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "loss0": round(float(loss[0]), 4),
        }), flush=True)
    except Exception as e:  # keep going through variants
        print(json.dumps({"variant": name, "error": str(e)[-500:]}), flush=True)


def main():
    _, _, _, store, objs = build_synthetic_world(n_objects=N_OBJ, n_frames=16, res=128)
    frames = store.arrays()
    bf16 = TrainConfig(compute_dtype="bfloat16")

    variants = [
        ("rest_only", NerfConfig(  # encode ~ free: measures batchgen+mlp+render+opt
            train=bf16,
            encoding=EncodingConfig(mx_levels=1, mx_max_resolution=16,
                                    mx_features=8, mx_plane_specs=()))),
        ("flagship_bf16_v4T", NerfConfig(train=bf16)),
        ("k128_p8_bf16_T", NerfConfig(
            train=bf16,
            encoding=EncodingConfig(mx_features=128,
                                    mx_plane_specs=((128, 8),)))),
        ("cp512_k128_p8_T_T", NerfConfig(
            train=bf16,
            encoding=EncodingConfig(mx_levels=7, mx_max_resolution=512,
                                    mx_features=128,
                                    mx_plane_specs=((128, 8),)))),
        ("k64_p16_T", NerfConfig(
            train=bf16,
            encoding=EncodingConfig(mx_plane_specs=((128, 16),)))),
    ]
    for name, cfg in variants:
        run_variant(name, cfg, objs, frames)


if __name__ == "__main__":
    main()
