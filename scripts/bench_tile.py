"""Single-point flagship speed bench, parameterized by the Pallas kernel
env knobs (MX_TILE / MX_PLANE_TILE / MX_HAT_BF16). Run one setting per
process — the knobs are module globals baked into the jit cache at trace
time, so in-process sweeps would silently reuse the first executable.

usage: MX_TILE=4096 python scripts/bench_tile.py [label]
Prints one JSON line {label, knobs, obj_iters_per_s}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # quality_ladder

from romap_tpu.config import NerfConfig
from romap_tpu.data.world import build_synthetic_world

from quality_ladder import BF16, bench


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    knobs = {k: os.environ.get(k, "") for k in
             ("MX_TILE", "MX_PLANE_TILE", "MX_HAT_BF16")}
    _, _, _, store, objs = build_synthetic_world(n_objects=10, n_frames=16,
                                                 res=128)
    v = bench(label, NerfConfig(train=BF16), objs, store.arrays())
    print(json.dumps({"label": label, "knobs": knobs,
                      "obj_iters_per_s": v}), flush=True)
    if v <= 0.0:  # bench() swallows exceptions and returns 0.0
        sys.exit(1)


if __name__ == "__main__":
    main()
