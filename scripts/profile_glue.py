"""Isolate the non-encode 'glue' cost of the train step on the real TPU:
full train_objects vs batch-generation-only, both loop-carried inside one
jit (20 iters x 10 objects) so the relay round-trip amortizes away.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from romap_tpu.config import NerfConfig
from romap_tpu.data.world import build_synthetic_world
from romap_tpu.models import nerf

N_OBJ = 10
ITERS = 20


def bench(name, fn, reps=3):
    out = fn()
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps / ITERS * 1e3
    print(json.dumps({"what": name, "ms_per_iter": round(dt, 2)}), flush=True)


def main():
    cfg = NerfConfig()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_synthetic_world(n_objects=N_OBJ, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    state0 = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg, spec)

    # full step chain — train_objects DONATES its state, so the state must
    # be threaded through calls (reusing state0 trips a deleted-buffer error
    # on TPU; CPU silently ignores donation, which hid this)
    st = [state0]

    def step_chain():
        st[0] = nerf.train_objects(st[0], objs, frames, cfg, spec, ITERS)
        return st[0].loss

    bench("train_objects", step_chain)

    # batch generation only, loop-carried on the rng key
    @jax.jit
    def gen_only():
        def body(i, key):
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, N_OBJ)
            batch = jax.vmap(
                lambda k, amin, amax, tow, iid, bb, nb: nerf.generate_batch(
                    k, frames, amin, amax, tow, iid, bb, nb, cfg,
                    use_depth=False)
            )(keys, objs.aabb_min, objs.aabb_max, objs.tow,
              objs.instance_id, objs.bboxes, objs.n_bbox)
            # fold a data-dependent scalar back into the carry so nothing
            # hoists out of the loop
            leaf = jax.tree.leaves(batch)[0]
            return jax.random.fold_in(key, jnp.sum(leaf).astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, body, jax.random.PRNGKey(1))

    try:
        bench("generate_batch_only", gen_only)
    except Exception as e:  # signature drift: report instead of dying
        print(json.dumps({"what": "generate_batch_only", "error": str(e)[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
