"""Time the individual Pallas kernels (CP fwd/bwd, planes fwd/bwd), the MLP,
and the XLA glue, with loop-carried dependencies so nothing hoists.

Each loop carries the params (scaled slightly each iter) so the kernel must
re-run; cost of the scale pass itself is measured by the `carry_only` row.
Usage: TILE / PLANE_TILE can be overridden via env MX_TILE / MX_PLANE_TILE.
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
from romap_tpu.models import nerf
from romap_tpu.ops import mxgrid_pallas as mp
from romap_tpu.ops.mlp import apply_mlp

if os.environ.get("MX_TILE"):
    mp.TILE = int(os.environ["MX_TILE"])
if os.environ.get("MX_PLANE_TILE"):
    mp.PLANE_TILE = int(os.environ["MX_PLANE_TILE"])

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
    state = nerf.init_train_state(jax.random.PRNGKey(0), N_OBJ, cfg, spec)
    r, s = cfg.train.rays_per_batch, cfg.train.samples_per_ray
    pts = jax.random.uniform(jax.random.PRNGKey(1), (N_OBJ, r * s, 3))
    print(json.dumps({"tile": mp.TILE, "plane_tile": mp.PLANE_TILE}), flush=True)

    def loop(body):
        def run(params):
            return jax.lax.fori_loop(
                0, ITERS, lambda _, p: body(jax.tree.map(lambda x: x * 0.9999, p)),
                params)
        return jax.jit(run)

    table = state.params["table"]
    tb16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), table)

    # carry only (the scale pass)
    bench("carry_only", loop(lambda p: p), table)

    # CP fwd only
    def cp_fwd(p):
        def one(tb):
            tb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), tb)
            xt, n, npad = mp._pad_and_tile(pts[0], mp.TILE)
            afac = mp._cp_forward(tb, jnp.broadcast_to(xt, xt.shape), npad, spec, False)
            return jnp.sum(afac.astype(jnp.float32))
        v = jax.vmap(one)(p)
        return jax.tree.map(lambda x: x * (1 + 0 * jnp.sum(v)), p)

    bench("cp_fwd", loop(cp_fwd), table)

    # planes fwd only
    def pl_fwd(p):
        def one(tb):
            tb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), tb)
            xt, n, npad = mp._pad_and_tile(pts[0], mp.PLANE_TILE)
            fpl, fli = mp._planes_forward(tb, xt, npad, spec, False)
            return jnp.sum(fpl.astype(jnp.float32)) + jnp.sum(fli.astype(jnp.float32))
        v = jax.vmap(one)(p)
        return jax.tree.map(lambda x: x * (1 + 0 * jnp.sum(v)), p)

    bench("planes_fwd", loop(pl_fwd), table)

    # full encode fwd+bwd (custom vjp) via value_and_grad of sum
    def enc_grad(p):
        def one(tb):
            tb16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), tb)
            out = mp.encode_pallas(tb16, pts[0], spec)
            return jnp.sum(out.astype(jnp.float32))
        g = jax.grad(lambda pp: jnp.sum(jax.vmap(one)(pp)))(p)
        return jax.tree.map(lambda a, b: a + 0.0 * b.astype(a.dtype), p, g)

    bench("encode_fwd_bwd", loop(enc_grad), table)

    # encode fwd only through the public path
    def enc_fwd(p):
        def one(tb):
            tb16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), tb)
            out = mp.encode_pallas(tb16, pts[0], spec)
            return jnp.sum(out.astype(jnp.float32))
        v = jax.vmap(one)(p)
        return jax.tree.map(lambda x: x * (1 + 0 * jnp.sum(v)), p)

    bench("encode_fwd", loop(enc_fwd), table)

    # MLP fwd+bwd on encoder-sized features
    feats = jax.random.uniform(
        jax.random.PRNGKey(2), (N_OBJ, r * s, spec.n_output_dims),
        dtype=jnp.bfloat16)
    mlp0 = state.params["mlp"]

    def mlp_grad(p):
        def one(m):
            m16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), m)
            return jnp.sum(
                jax.vmap(lambda f: apply_mlp(m16, f, cfg.network))(feats[:1])
                .astype(jnp.float32))
        g = jax.grad(one)(p)
        return jax.tree.map(lambda a, b: a + 0.0 * b.astype(a.dtype), p, g)

    # note: one object's batch at a time inside, vmapped outside below
    def mlp_all(p):
        def one(m, f):
            m16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), m)
            return jnp.sum(apply_mlp(m16, f, cfg.network).astype(jnp.float32))
        g = jax.grad(lambda pp: jnp.sum(jax.vmap(one)(pp, feats)))(p)
        return jax.tree.map(lambda a, b: a + 0.0 * b.astype(a.dtype), p, g)

    bench("mlp_fwd_bwd", loop(mlp_all), mlp0)


if __name__ == "__main__":
    main()
