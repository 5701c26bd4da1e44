"""Component-level timing of the train step on the real TPU.

Times (per 10-object iteration): full step, CP-only encode step, encode
forward, encode fwd+bwd, batch generation alone, MLP alone. Prints one JSON
line per measurement. Run on the axon TPU (several minutes of compiles).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from romap_tpu.config import NerfConfig, EncodingConfig, TrainConfig
from romap_tpu.data.world import build_synthetic_world
from romap_tpu.models import nerf

N_OBJ = 10


def timeit(name, fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    jax.device_get(jax.tree.leaves(out)[0])  # compile + sync (relay needs readback)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"what": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    cfg = NerfConfig()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_synthetic_world(n_objects=N_OBJ, n_frames=16, res=128)
    frames = store.arrays()
    state = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg, spec)

    r, s = cfg.train.rays_per_batch, cfg.train.samples_per_ray
    pts = jax.random.uniform(jax.random.PRNGKey(1), (N_OBJ, r, s, 3))

    # encode forward only
    @jax.jit
    def enc_fwd(params, pts):
        return jax.vmap(lambda p, x: nerf.field_apply(p, x, cfg, spec))(params, pts)

    timeit("field_fwd(enc+mlp)", enc_fwd, state.params, pts)

    # encode fwd+bwd (sum-of-outputs gradient)
    @jax.jit
    def enc_grad(params, pts):
        return jax.grad(lambda p: jnp.sum(enc_fwd(p, pts).astype(jnp.float32)))(params)

    timeit("field_grad(enc+mlp)", enc_grad, state.params, pts)

    # batch generation alone
    obj_tuple = (objs.aabb_min, objs.aabb_max, objs.tow, objs.instance_id,
                 objs.bboxes, objs.n_bbox)

    @jax.jit
    def batch_only(key, obj_tuple):
        def one(k, am, ax, tow, iid, bb, nb):
            return nerf.generate_batch(k, frames, am, ax, tow, iid, bb, nb,
                                       cfg, use_depth=False)
        keys = jax.random.split(key, N_OBJ)
        return jax.vmap(one)(keys, *obj_tuple)

    timeit("generate_batch", batch_only, jax.random.PRNGKey(2), obj_tuple)

    # full train step, 1 iter and 50 iters
    t1 = timeit("train_1iter", functools.partial(
        nerf.train_objects, n_iters=1), state, objs, frames, cfg, spec)
    state = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg, spec)
    t50 = timeit("train_50iter", functools.partial(
        nerf.train_objects, n_iters=50), state, objs, frames, cfg, spec, reps=2)
    print(json.dumps({"what": "obj-iters/s @50", "value": round(N_OBJ * 50 / t50, 1)}),
          flush=True)

    # CP-only (planes disabled)
    cfg2 = NerfConfig(encoding=EncodingConfig(mx_plane_res=0, mx_plane_features=0))
    spec2 = nerf.make_field_spec(cfg2)
    state2 = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg2, spec2)
    t50b = timeit("train_50iter_cp_only", functools.partial(
        nerf.train_objects, n_iters=50), state2, objs, frames, cfg2, spec2, reps=2)
    print(json.dumps({"what": "obj-iters/s cp-only", "value": round(N_OBJ * 50 / t50b, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
