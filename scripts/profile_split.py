"""True per-iteration component split, measured as 50-iter fori_loops so the
relay dispatch latency amortizes. Variants:

  full        — the real train step (batch gen + field + loss + optimizer)
  fixed_batch — same step but the batch is generated once outside the loop
  batch_only  — only generate_batch in the loop body (folds into the carry)

full - fixed_batch ~ batch-gen cost; fixed_batch ~ compute cost.
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
import optax

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
    per_iter = dt / ITERS * 1e3
    print(json.dumps({"what": name, "ms_per_iter": round(per_iter, 2),
                      "obj_iters_s": round(N_OBJ * ITERS / dt, 1)}), flush=True)
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

    # ---- full step (no donation so we can re-feed)
    @jax.jit
    def full(state):
        step_fn = jax.vmap(
            lambda p, e, s, k, st, ob: nerf._object_train_step(
                p, e, s, k, st, frames, ob, cfg, spec, tx, False))
        def body(_, st):
            params, ema, opt_state, key, step, logged = step_fn(
                st.params, st.ema, st.opt_state, st.key, st.step, obj_tuple)
            return nerf.TrainState(params, ema, opt_state, key, step, logged)
        return jax.lax.fori_loop(0, ITERS, body, state)

    bench_loop("full", full, state0)

    # ---- fixed batch: batch generated once, loop is field+loss+opt only
    keys = jax.random.split(jax.random.PRNGKey(1), N_OBJ)

    @jax.jit
    def make_batches():
        def one(k, am, ax, tow, iid, bb, nb, act):
            return nerf.generate_batch(k, frames, am, ax, tow, iid, bb, nb,
                                       cfg, use_depth=False)
        return jax.vmap(one)(keys, *obj_tuple)

    batches = make_batches()

    @jax.jit
    def fixed_batch(state):
        def one_step(params, ema, opt_state, key, step, batch):
            def loss_fn(p):
                raw = nerf.field_apply(p, batch.points, cfg, spec)
                return composite_loss(raw, batch, cfg.train)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            lr = nerf.learning_rate(cfg, step)
            new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            d = cfg.optimizer.ema_decay
            new_ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, new_params)
            return new_params, new_ema, new_opt, key, step + 1, aux["logged_loss"]
        step_fn = jax.vmap(one_step)
        def body(_, st):
            params, ema, opt_state, key, step, logged = step_fn(
                st.params, st.ema, st.opt_state, st.key, st.step, batches)
            return nerf.TrainState(params, ema, opt_state, key, step, logged)
        return jax.lax.fori_loop(0, ITERS, body, state)

    bench_loop("fixed_batch", fixed_batch, state0)

    # ---- batch only: loop generates batches, reduces them into the carry
    @jax.jit
    def batch_only(carry):
        def body(_, c):
            acc, key = c
            keys = jax.random.split(key, N_OBJ + 1)
            def one(k, am, ax, tow, iid, bb, nb, act):
                return nerf.generate_batch(k, frames, am, ax, tow, iid, bb, nb,
                                           cfg, use_depth=False)
            b = jax.vmap(one)(keys[1:], *obj_tuple)
            return acc + jnp.sum(b.points) + jnp.sum(b.rgb_target), keys[0]
        return jax.lax.fori_loop(0, ITERS, body, carry)

    bench_loop("batch_only", batch_only, (jnp.float32(0), jax.random.PRNGKey(2)))

    # ---- fwd+bwd of field only (no optimizer), fixed points
    pts = batches.points

    @jax.jit
    def field_grad_loop(carry):
        def body(_, c):
            acc, params = c
            def loss_fn(p):
                raw = jax.vmap(lambda pp, x: nerf.field_apply(pp, x, cfg, spec))(p, pts)
                return jnp.sum(raw.astype(jnp.float32))
            g = jax.grad(loss_fn)(params)
            leaf = jax.tree.leaves(g)[0]
            return acc + jnp.sum(leaf.astype(jnp.float32)), params
        return jax.lax.fori_loop(0, ITERS, body, carry)

    bench_loop("field_grad_only", field_grad_loop, (jnp.float32(0), state0.params))


if __name__ == "__main__":
    main()
