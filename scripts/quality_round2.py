"""Second TPU speed+quality round: rectangular planes + kp8 quality.
Appends to QUALITY.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
from romap_tpu.data.world import build_synthetic_world

from quality_ladder import BF16, bench, quality  # reuse harness

CANDS = {
    # rect planes: v-res 128 costs nothing on the MXU; u-res 64 halves MACs
    "cp512_k64_rect64x128x16": EncodingConfig(
        mx_levels=7, mx_max_resolution=512, mx_features=64,
        mx_plane_specs=((64, 128, 16),)),
    "cp512_k64_rect96x128x16": EncodingConfig(
        mx_levels=7, mx_max_resolution=512, mx_features=64,
        mx_plane_specs=((96, 128, 16),)),
    "cp512_k64_p8": EncodingConfig(
        mx_levels=7, mx_max_resolution=512, mx_features=64,
        mx_plane_specs=((128, 8),)),
}


def main():
    _, _, _, store, objs = build_synthetic_world(n_objects=10, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY.json")
    results = json.load(open(path)) if os.path.exists(path) else {
        "speeds": {}, "psnr": {}}
    for name, enc in CANDS.items():
        results["speeds"][name] = bench(
            name, NerfConfig(encoding=enc, train=BF16), objs, frames)
    for name in CANDS:
        results["psnr"][name] = quality(name, CANDS[name])
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
