"""Round-3 TPU speed+quality ladder after the tile/transpose/batch-gen
speedups: can a cheaper CP ladder (fewer rows = less VPU hat work and
fewer MXU FLOPs) or a bigger plane level hold/raise PSNR?

Also (re)measures the tcnn-semantics hashgrid at the same 5000-step budget
on TPU — the BASELINE.md 0.5 dB criterion needs that number (it crashed on
TPU in round 1 and QUALITY.json recorded 0.0).

Appends to QUALITY.json with keys speeds_r3 / psnr (updating stale speeds).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from romap_tpu.config import EncodingConfig, NerfConfig
from romap_tpu.data.world import build_synthetic_world

from quality_ladder import BF16, HASHGRID, bench, quality  # reuse harness

CANDS = {
    "cp512_k64_p8": EncodingConfig(
        mx_levels=7, mx_max_resolution=512, mx_features=64,
        mx_plane_specs=((128, 8),)),
    "cp256_k64_p8": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=64,
        mx_plane_specs=((128, 8),)),
    "cp384_k64_p8": EncodingConfig(
        mx_levels=7, mx_max_resolution=384, mx_features=64,
        mx_plane_specs=((128, 8),)),
    "cp256_k64_p8x2": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=64,
        mx_plane_specs=((128, 8), (64, 8))),
    "cp256_k64_pp256": EncodingConfig(
        mx_levels=6, mx_max_resolution=256, mx_features=64,
        mx_plane_specs=((256, 8),)),
}


def main():
    _, _, _, store, objs = build_synthetic_world(n_objects=10, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY.json")
    results = json.load(open(path)) if os.path.exists(path) else {}
    r3 = results.setdefault("speeds_r3", {})
    psnr = results.setdefault("psnr", {})

    for name, enc in CANDS.items():
        r3[name] = bench(name, NerfConfig(encoding=enc, train=BF16),
                         objs, frames)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)

    for name in ("cp256_k64_p8", "cp384_k64_p8", "cp256_k64_p8x2",
                 "cp256_k64_pp256"):
        psnr[name] = quality(name, CANDS[name])
        with open(path, "w") as f:
            json.dump(results, f, indent=1)

    if os.environ.get("RUN_HASHGRID"):
        psnr["hashgrid_tcnn"] = quality("hashgrid_tcnn", HASHGRID)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
