"""Split the tcnn-parity hash-grid cost into encode-forward vs
table-gradient (the gather vs the scatter-add) at the reference batch
geometry (131072 points — ref nerf_model.h:172), so a rework of the
gather/scatter lowering can be justified from data.

The loop carries the table (scaled each iter) so nothing hoists; sync via
device_get (block_until_ready does not block over the TPU relay).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from romap_tpu.config import EncodingConfig
from romap_tpu.ops import hashgrid

N_POINTS = 131072
REPS = 3
ITERS = 10


def bench(name, fn, carry):
    out = fn(carry)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(out)
    jax.device_get(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / (REPS * ITERS) * 1e3
    print(json.dumps({"stage": name, "ms_per_iter": round(ms, 3)}))
    return ms


def main() -> None:
    spec = hashgrid.make_spec(EncodingConfig(kind="hashgrid"))
    key = jax.random.PRNGKey(0)
    table = hashgrid.init_table(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N_POINTS, 3))

    for impl in ("gather", "sorted"):
        @jax.jit
        def fwd_only(t, impl=impl):
            def body(t, _):
                out = hashgrid.encode(t, x, spec, impl=impl)
                return t * (1.0 + 1e-9 * out[0, 0]), None
            return jax.lax.scan(body, t, None, length=ITERS)[0]

        @jax.jit
        def fwd_bwd(t, impl=impl):
            def body(t, _):
                g = jax.grad(
                    lambda tt: hashgrid.encode(tt, x, spec, impl=impl).sum()
                )(t)
                return t + 1e-9 * g, None
            return jax.lax.scan(body, t, None, length=ITERS)[0]

        ms_f = bench(f"encode fwd ({impl})", fwd_only, table)
        ms_fb = bench(f"encode fwd+bwd ({impl})", fwd_bwd, table)
        print(json.dumps({
            "stage": f"bwd approx ({impl})",
            "ms_per_iter": round(ms_fb - ms_f, 3),
            "n_points": N_POINTS,
            "levels": spec.n_levels,
        }))


if __name__ == "__main__":
    main()
