"""Round-4 (build round) ladder: rectangular-v planes after the v-block
granularity fix (mxgrid_pallas._plane_block 128 -> 16).

Plane cost per point per pair is K * B(rv) * ceil128(ru) MACs; with B now
padding rv to 16 instead of 128, shrinking rv buys real FLOPs for the first
time (the r4 rect64x128 point measured ZERO speedup because B stayed 128).
Phase 1 benches speed, phase 2 runs the 5000-step PSNR criterion for
candidates that beat the flagship's 628 obj-iters/s, appending to
QUALITY.json (speeds_r7 / psnr).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from romap_tpu.config import EncodingConfig, NerfConfig
from romap_tpu.data.world import build_synthetic_world

from quality_ladder import BF16, bench, quality


def enc(rv: int, kp: int) -> EncodingConfig:
    # flagship CP (6 levels to 192, K=48) + one rectangular plane level:
    # u (contracted on the MXU) stays 128, v (VPU-reduced) shrinks to rv
    return EncodingConfig(mx_plane_specs=((128, rv, kp),))


CANDIDATES = {
    "flagship_B16": EncodingConfig(),  # sanity: B change must be neutral
    "rect128x96x4": enc(96, 4),
    "rect128x64x4": enc(64, 4),
    "rect128x48x4": enc(48, 4),
    "rect128x64x6": enc(64, 6),  # same cost as 96x4, +2 channels
    "rect128x64x8": enc(64, 8),  # same cost as flagship p4, 2x channels
}


def main() -> None:
    _, _, _, store, objs = build_synthetic_world(n_objects=10, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    speeds = {}
    for name, e in CANDIDATES.items():
        speeds[name] = bench(name, NerfConfig(encoding=e, train=BF16),
                             objs, frames)

    qpath = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY.json")
    results = json.load(open(qpath))
    results.setdefault("speeds_r7_rect_planes", {}).update(
        {k: v for k, v in speeds.items()})

    # 5000-step PSNR for everything that actually got faster
    for name, e in CANDIDATES.items():
        if name != "flagship_B16" and speeds.get(name, 0) <= speeds.get(
                "flagship_B16", 0) * 1.02:
            continue
        results["psnr"][name] = quality(name, e)

    with open(qpath, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
