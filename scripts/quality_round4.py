"""Round-4 ladder: plane-cost variants around the cp256_k64 flagship.
Planes run at the bf16 MXU peak, so the only way they get faster is fewer
FLOPs — p4 (half channels), rect u64 (half contraction), and a no-plane
control. Speed on the 10-object bench world + 5000-step PSNR.
Appends speeds_r4 / psnr entries to QUALITY.json.
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
    "cp256_k64_p8": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=64,
        mx_plane_specs=((128, 8),)),
    "cp256_k64_p4": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=64,
        mx_plane_specs=((128, 4),)),
    "cp256_k64_rect64x128x8": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=64,
        mx_plane_specs=((64, 128, 8),)),
    "cp256_k64_noplanes": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=64,
        mx_plane_specs=()),
}


def main():
    _, _, _, store, objs = build_synthetic_world(n_objects=10, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY.json")
    results = json.load(open(path)) if os.path.exists(path) else {}
    r4 = results.setdefault("speeds_r4", {})
    psnr = results.setdefault("psnr", {})

    for name, enc in CANDS.items():
        r4[name] = bench(name, NerfConfig(encoding=enc, train=BF16),
                         objs, frames)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)

    for name in ("cp256_k64_p4", "cp256_k64_rect64x128x8",
                 "cp256_k64_noplanes"):
        psnr[name] = quality(name, CANDS[name])
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
