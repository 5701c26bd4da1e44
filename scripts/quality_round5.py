"""Round-5 ladder: push past 700 obj-iters/s inside the 0.5 dB parity gate.

The p8->p4 step (421 -> 560) showed plane cost is dominated by the
per-plane channel count K (matmul rows K*B and the [K, B, T] VPU
contraction both scale with K); the u-contraction barely matters
(rect64x128x8 == p8). Round-5 candidates therefore cut K further (p2),
cut the CP channel count (k48), and shorten the CP ladder (cp192) around
the cp256_k64_p4 flagship (580 obj-iters/s, 28.95 dB, gate gap 0.21 dB;
anchor: hashgrid 29.05 dB, budget 0.5 dB -> floor 28.55 dB).
Appends speeds_r5 / psnr entries to QUALITY.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from romap_tpu.config import EncodingConfig, NerfConfig
from romap_tpu.data.world import build_synthetic_world

from quality_ladder import BF16, bench, quality

CANDS = {
    "cp256_k64_p2": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=64,
        mx_plane_specs=((128, 2),)),
    "cp256_k48_p4": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=48,
        mx_plane_specs=((128, 4),)),
    "cp192_k64_p4": EncodingConfig(
        mx_levels=6, mx_max_resolution=192, mx_features=64,
        mx_plane_specs=((128, 4),)),
    "cp256_k48_p2": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=48,
        mx_plane_specs=((128, 2),)),
    "cp192_k48_p4": EncodingConfig(
        mx_levels=6, mx_max_resolution=192, mx_features=48,
        mx_plane_specs=((128, 4),)),
}


def main():
    _, _, _, store, objs = build_synthetic_world(n_objects=10, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY.json")
    results = json.load(open(path)) if os.path.exists(path) else {}
    r5 = results.setdefault("speeds_r5", {})
    psnr = results.setdefault("psnr", {})

    for name, enc in CANDS.items():
        r5[name] = bench(name, NerfConfig(encoding=enc, train=BF16),
                         objs, frames)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)

    # 5000-step quality only for the candidates fast enough to matter
    fast = [n for n, v in r5.items() if v >= 650]
    for name in fast:
        psnr[name] = quality(name, CANDS[name])
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"done": True, "fast": fast}), flush=True)


if __name__ == "__main__":
    main()
