"""Worker process for tests/test_multihost.py — NOT a pytest module.

Joins a 2-process jax distributed job (4 virtual CPU devices each, global
mesh of 8), runs the object-sharded train step on its local rows of the
object table, and prints its local per-object losses as one JSON line
prefixed with RESULT. The parent compares against a single-process oracle.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from romap_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

    from romap_tpu.data.world import build_synthetic_world
    from romap_tpu.models import nerf
    from tests.test_train_step import tiny_cfg

    cfg = tiny_cfg()
    spec = nerf.make_field_spec(cfg)
    capacity = 8
    _, _, _, store, objs = build_synthetic_world(
        n_objects=4, n_frames=4, res=48, capacity=capacity
    )
    frames = store.arrays()
    state0 = nerf.init_train_state(jax.random.PRNGKey(0), capacity, cfg, spec)

    mesh = multihost.global_mesh()
    sl = multihost.local_object_slice(capacity, mesh)
    take = lambda x: np.asarray(x)[sl]
    state_g = multihost.shard_objects_global(jax.tree.map(take, state0), mesh)
    objs_g = multihost.shard_objects_global(jax.tree.map(take, objs), mesh)
    frames_g = multihost.replicate_global(frames, mesh)

    out = nerf.train_objects(state_g, objs_g, frames_g, cfg, spec, 3)
    losses = multihost.local_losses(out.loss)
    print("RESULT " + json.dumps(
        {"pid": pid, "rows": [sl.start, sl.stop], "loss": losses.tolist()}
    ), flush=True)


if __name__ == "__main__":
    main()
