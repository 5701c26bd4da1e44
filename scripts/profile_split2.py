"""Bisect the 36 ms/iter fixed-batch step: loss path vs optimizer."""

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
ITERS = 50


def bench_loop(name, fn, state, reps=3):
    out = fn(state)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"what": name, "ms_per_iter": round(dt / ITERS * 1e3, 2)}),
          flush=True)
    return out


def main():
    cfg = NerfConfig()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_synthetic_world(n_objects=N_OBJ, n_frames=16, res=128)
    frames = store.arrays()
    tx = nerf.make_optimizer(cfg)
    obj_tuple = (objs.aabb_min, objs.aabb_max, objs.tow, objs.instance_id,
                 objs.bboxes, objs.n_bbox, objs.active)
    state0 = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg, spec)
    keys = jax.random.split(jax.random.PRNGKey(1), N_OBJ)

    @jax.jit
    def make_batches():
        def one(k, am, ax, tow, iid, bb, nb, act):
            return nerf.generate_batch(k, frames, am, ax, tow, iid, bb, nb,
                                       cfg, use_depth=False)
        return jax.vmap(one)(keys, *obj_tuple)

    batches = make_batches()

    # A: composite-loss grad, NO optimizer (accumulate grad norm into carry)
    @jax.jit
    def loss_grad_only(carry):
        acc, params = carry
        def body(_, c):
            acc, params = c
            def one(p, batch):
                def loss_fn(pp):
                    raw = nerf.field_apply(pp, batch.points, cfg, spec)
                    return composite_loss(raw, batch, cfg.train)
                (_, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
                return g
            g = jax.vmap(one)(params, batches)
            leaf = jax.tree.leaves(g)[0]
            return acc + jnp.sum(leaf.astype(jnp.float32)), params
        return jax.lax.fori_loop(0, ITERS, body, (acc, params))

    bench_loop("loss_grad_no_opt", loss_grad_only, (jnp.float32(0), state0.params))

    # B: sum-loss grad + FULL optimizer/EMA/where machinery
    @jax.jit
    def opt_only(state):
        def one_step(params, ema, opt_state, key, step):
            def loss_fn(p):
                raw = nerf.field_apply(p, batches.points[0], cfg, spec)
                return jnp.sum(raw.astype(jnp.float32))
            g = jax.grad(loss_fn)(params)
            updates, new_opt = tx.update(g, opt_state, params)
            lr = nerf.learning_rate(cfg, step)
            new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            d = cfg.optimizer.ema_decay
            new_ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, new_params)
            return new_params, new_ema, new_opt, key, step + 1
        step_fn = jax.vmap(one_step, in_axes=(0, 0, 0, 0, 0))
        def body(_, st):
            params, ema, opt_state, key, step, logged = st.params, st.ema, st.opt_state, st.key, st.step, st.loss
            params, ema, opt_state, key, step = step_fn(params, ema, opt_state, key, step)
            return nerf.TrainState(params, ema, opt_state, key, step, logged)
        return jax.lax.fori_loop(0, ITERS, body, state)

    bench_loop("sumloss_full_opt", opt_only, state0)

    # C: composite loss forward only (no grad)
    @jax.jit
    def loss_fwd_only(carry):
        def body(_, c):
            acc, params = c
            def one(p, batch):
                raw = nerf.field_apply(p, batch.points, cfg, spec)
                loss, aux = composite_loss(raw, batch, cfg.train)
                return loss
            l = jax.vmap(one)(params, batches)
            return acc + jnp.sum(l), params
        return jax.lax.fori_loop(0, ITERS, body, carry)

    bench_loop("loss_fwd_only", loss_fwd_only, (jnp.float32(0), state0.params))


if __name__ == "__main__":
    main()
