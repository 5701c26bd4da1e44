"""All encoding speed/quality sweeps, consolidated (was quality_round2-7).

Each sweep below is one historical TPU experiment whose results live in
QUALITY.json (key names preserved); re-run any of them with

    python scripts/quality_sweep.py --sweep <name> [--seeds 0,1,2]
        [--iters 5000] [--psnr all|none|name,name,...]

Speed = quality_ladder.bench (50-iter waves, 10 objects, reference batch
geometry); quality = quality_ladder.quality (5000-step held-out PSNR on
the adversarial hash-noise sphere). Defaults reproduce each sweep's
original PSNR selection; --seeds >1 records per-seed values + mean under
psnr_multiseed (single-seed spread is ~0.3 dB).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from romap_tpu.config import EncodingConfig, NerfConfig
from romap_tpu.data.world import build_synthetic_world

from quality_ladder import BF16, bench, quality


def _cp(levels, res, k, planes=(), axes=None):
    kw = dict(mx_levels=levels, mx_max_resolution=res, mx_features=k,
              mx_plane_specs=planes)
    if axes:
        kw["mx_plane_axes"] = axes
    return EncodingConfig(**kw)


def _rect(rv, kp):  # flagship CP + one (128, rv, kp) rectangular plane
    return EncodingConfig(mx_plane_specs=((128, rv, kp),))


# sweep -> (QUALITY.json speeds key, candidates, default psnr selection)
SWEEPS = {
    # r2 (build round 3): rectangular planes BEFORE the v-block fix —
    # rect showed zero speedup because Pallas padded v back to 128
    "rect_v128pad": ("speeds", {
        "cp512_k64_rect64x128x16": _cp(7, 512, 64, ((64, 128, 16),)),
        "cp512_k64_rect96x128x16": _cp(7, 512, 64, ((96, 128, 16),)),
        "cp512_k64_p8": _cp(7, 512, 64, ((128, 8),)),
    }, "all"),
    # r3: cheaper CP ladders / bigger planes after the tile+transpose wins
    "cp_ladder": ("speeds_r3", {
        "cp512_k64_p8": _cp(7, 512, 64, ((128, 8),)),
        "cp256_k64_p8": _cp(6, 256, 64, ((128, 8),)),
        "cp384_k64_p8": _cp(6, 384, 64, ((128, 8),)),
        "cp256_k64_p8x2": _cp(6, 256, 64, ((128, 8), (128, 8))),
        "cp256_k64_pp256": _cp(6, 256, 64, ((256, 8),)),
    }, "all"),
    # r4: plane-cost variants around cp256_k64 (p4 became the flagship)
    "plane_cost": ("speeds_r4", {
        "cp256_k64_p8": _cp(6, 256, 64, ((128, 8),)),
        "cp256_k64_p4": _cp(6, 256, 64, ((128, 4),)),
        "cp256_k64_rect64x128x8": _cp(6, 256, 64, ((64, 128, 8),)),
        "cp256_k64_noplanes": _cp(6, 256, 64),
    }, "cp256_k64_p4,cp256_k64_rect64x128x8,cp256_k64_noplanes"),
    # r5: cut K / shorten CP around cp256_k64_p4 (cp192_k48_p4 won)
    "cut_channels": ("speeds_r5", {
        "cp256_k64_p2": _cp(6, 256, 64, ((128, 2),)),
        "cp256_k48_p4": _cp(6, 256, 48, ((128, 4),)),
        "cp192_k64_p4": _cp(6, 192, 64, ((128, 4),)),
        "cp256_k48_p2": _cp(6, 256, 48, ((128, 2),)),
        "cp192_k48_p4": _cp(6, 192, 48, ((128, 4),)),
    }, "all"),
    # r7 (build round 4): rectangular v AFTER the 16-row v-block fix
    "rect_v16pad": ("speeds_r7_rect_planes", {
        "flagship_B16": EncodingConfig(),  # sanity: B change is neutral
        "rect128x96x4": _rect(96, 4),
        "rect128x64x4": _rect(64, 4),
        "rect128x48x4": _rect(48, 4),
        "rect128x64x6": _rect(64, 6),
        "rect128x64x8": _rect(64, 8),
    }, "rect128x96x4,rect128x64x4,rect128x48x4"),
    # r8 (build round 4): balanced axis assignment for rect planes — the
    # promoted flagship is rect64x4_bal; run with --seeds 0,1,2
    "rect_balanced": ("speeds_r8_balanced", {
        "flagship": EncodingConfig(),
        "rect64x4_bal": EncodingConfig(mx_plane_specs=((128, 64, 4),),
                                       mx_plane_axes="balanced"),
        "rect96x4_bal": EncodingConfig(mx_plane_specs=((128, 96, 4),),
                                       mx_plane_axes="balanced"),
        "rect64x6_bal": EncodingConfig(mx_plane_specs=((128, 64, 6),),
                                       mx_plane_axes="balanced"),
    }, "all"),
}

QPATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "QUALITY.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", required=True, choices=sorted(SWEEPS))
    ap.add_argument("--seeds", default="0",
                    help="comma-separated scene seeds for the PSNR phase")
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--psnr", default=None,
                    help="all | none | comma-separated candidate names "
                         "(default: the sweep's original selection)")
    args = ap.parse_args()

    speeds_key, cands, default_sel = SWEEPS[args.sweep]
    sel = args.psnr if args.psnr is not None else default_sel
    psnr_names = (list(cands) if sel == "all"
                  else [] if sel == "none"
                  else [s for s in sel.split(",") if s])
    seeds = [int(s) for s in args.seeds.split(",")]

    _, _, _, store, objs = build_synthetic_world(n_objects=10, n_frames=16,
                                                 res=128)
    frames = store.arrays()
    results = json.load(open(QPATH)) if os.path.exists(QPATH) else {}

    sp = results.setdefault(speeds_key, {})
    for name, enc in cands.items():
        sp[name] = bench(name, NerfConfig(encoding=enc, train=BF16),
                         objs, frames)
        with open(QPATH, "w") as f:
            json.dump(results, f, indent=1)

    for name in psnr_names:
        vals = [quality(name, cands[name], iters=args.iters, seed=s)
                for s in seeds]
        if len(seeds) == 1:
            results.setdefault("psnr", {})[name] = vals[0]
        else:
            results.setdefault("psnr_multiseed", {})[name] = {
                "per_seed": [round(v, 2) for v in vals],
                "mean": round(sum(vals) / len(vals), 3)}
        with open(QPATH, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"done": True, "sweep": args.sweep}), flush=True)


if __name__ == "__main__":
    main()
