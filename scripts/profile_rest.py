"""Break down the non-encode remainder of the train step on TPU:
RNG uniforms (threefry), render+loss fwd+bwd, optimizer+EMA+masking.
Loop-carried like profile_kernels so nothing hoists.
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
from romap_tpu.ops.losses import composite_loss

N_OBJ = 10
ITERS = 20


def bench(name, fn, carry, reps=3):
    out = fn(carry)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps / ITERS * 1e3
    print(json.dumps({"what": name, "ms_per_iter": round(dt, 2)}), flush=True)
    return dt


def main():
    cfg = NerfConfig()
    spec = nerf.make_field_spec(cfg)
    r, s = cfg.train.rays_per_batch, cfg.train.samples_per_ray
    _, _, _, store, objs = build_synthetic_world(n_objects=N_OBJ, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    state0 = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg, spec)

    def loop(body):
        def run(carry):
            return jax.lax.fori_loop(0, ITERS, lambda _, c: body(c), carry)
        return jax.jit(run)

    # RNG: the uniforms one full batch-gen draws (r*2 + r + r*3 + r*s per
    # object) under the default threefry impl
    def rng_only(key):
        def one(k):
            k, k1, k2, k3 = jax.random.split(k, 4)
            a = jax.random.uniform(k1, (r, 2))
            b = jax.random.uniform(k2, (r, 3))
            c = jax.random.uniform(k3, (r, s))
            return k, jnp.sum(a) + jnp.sum(b) + jnp.sum(c)
        keys, v = jax.vmap(one)(key)
        return jax.vmap(jax.random.fold_in)(keys, (v != 0).astype(jnp.uint32))

    bench("rng_uniforms_threefry", loop(rng_only),
          jax.random.split(jax.random.PRNGKey(0), N_OBJ))

    # render + composite loss fwd+bwd on a fixed batch, grads wrt raw
    # network output (isolates the XLA render/loss section)
    key = jax.random.PRNGKey(1)
    batch = jax.vmap(
        lambda k, amin, amax, tow, iid, bb, nb: nerf.generate_batch(
            k, frames, amin, amax, tow, iid, bb, nb, cfg, use_depth=False)
    )(jax.random.split(key, N_OBJ), objs.aabb_min, objs.aabb_max, objs.tow,
      objs.instance_id, objs.bboxes, objs.n_bbox)
    raw0 = jax.random.normal(key, (N_OBJ, r, s, 4), jnp.float32) * 0.1

    def render_loss(raw):
        def one(rw, bt):
            (l, _), g = jax.value_and_grad(
                lambda x: composite_loss(x, bt, cfg.train), has_aux=True)(rw)
            return g + 0.0 * l
        g = jax.vmap(one)(raw, batch)
        return raw * 0.9999 + 0.0001 * g

    bench("render_loss_fwd_bwd", loop(render_loss), raw0)

    # optimizer + EMA + where-masking on the real param tree (grads = params)
    tx = nerf.make_optimizer(cfg)

    def opt_only(carry):
        params, opt_state, ema = carry
        def one(p, o, e):
            upd, o2 = tx.update(jax.tree.map(lambda a: a * 1e-6, p), o, p)
            p2 = jax.tree.map(lambda a, u: a - 0.01 * u, p, upd)
            e2 = jax.tree.map(lambda x, y: 0.95 * x + 0.05 * y, e, p2)
            keep = lambda old, new: jax.tree.map(
                lambda a, b: jnp.where(True, b, a), old, new)
            return keep(p, p2), keep(o, o2), keep(e, e2)
        return jax.vmap(one)(params, opt_state, ema)

    bench("adam_ema_mask", loop(opt_only),
          (state0.params, state0.opt_state, state0.ema))


if __name__ == "__main__":
    main()
