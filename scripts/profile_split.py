"""Isolate the optimizer cost: tx.update vs lr-apply vs EMA vs zero_nans."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from romap_tpu.config import NerfConfig
from romap_tpu.models import nerf

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
    print(json.dumps({"what": name, "ms_per_iter": round(dt / ITERS * 1e3, 3)}),
          flush=True)
    return out


def main():
    cfg = NerfConfig()
    spec = nerf.make_field_spec(cfg)
    state0 = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg, spec)
    tx = nerf.make_optimizer(cfg)

    for path, leaf in jax.tree_util.tree_flatten_with_path(state0.params)[0]:
        print("param", jax.tree_util.keystr(path), leaf.shape, leaf.dtype)
    n = sum(l.size for l in jax.tree.leaves(state0.params))
    print("total params:", n, flush=True)

    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, state0.params)

    # full update machinery
    @jax.jit
    def upd_full(carry):
        params, ema, opt_state, step = carry
        def body(_, c):
            params, ema, opt_state, step = c
            u, new_opt = jax.vmap(tx.update)(grads, opt_state, params)
            lr = nerf.learning_rate(cfg, step)
            new_params = jax.tree.map(
                lambda p, uu: p - lr[:, None, None, None] * uu
                if uu.ndim == 4 else p - lr.reshape((-1,) + (1,) * (uu.ndim - 1)) * uu,
                params, u)
            d = cfg.optimizer.ema_decay
            new_ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, new_params)
            return new_params, new_ema, new_opt, step + 1
        return jax.lax.fori_loop(0, ITERS, body, carry)

    bench_loop("update_full", upd_full,
               (state0.params, state0.ema, state0.opt_state, state0.step))

    # adam only (no zero_nans, no weight decay), not vmapped semantics change?
    tx2 = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
    opt2 = jax.vmap(tx2.init)(state0.params)

    @jax.jit
    def upd_adam(carry):
        params, opt_state = carry
        def body(_, c):
            params, opt_state = c
            u, new_opt = jax.vmap(tx2.update)(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, uu: p - 0.01 * uu, params, u)
            return new_params, new_opt
        return jax.lax.fori_loop(0, ITERS, body, carry)

    bench_loop("adam_only", upd_adam, (state0.params, opt2))

    # zero_nans only
    tx3 = optax.zero_nans()
    opt3 = jax.vmap(tx3.init)(state0.params)

    @jax.jit
    def upd_zn(carry):
        params, opt_state = carry
        def body(_, c):
            params, opt_state = c
            u, new_opt = jax.vmap(tx3.update)(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, uu: p - 0.01 * uu, params, u)
            return new_params, new_opt
        return jax.lax.fori_loop(0, ITERS, body, carry)

    bench_loop("zero_nans_only", upd_zn, (state0.params, opt3))

    # plain sgd tree_map
    @jax.jit
    def upd_sgd(params):
        def body(_, p):
            return jax.tree.map(lambda x: x - 0.01 * 1e-3, p)
        return jax.lax.fori_loop(0, ITERS, body, params)

    bench_loop("sgd_treemap", upd_sgd, state0.params)


if __name__ == "__main__":
    main()
