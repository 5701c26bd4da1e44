"""Why is online SSIM ~0.6 when offline GT-pose SSIM is ~0.9? (VERDICT r4
weak #7)

Hypothesis: residual eval-pose error. SSIM's 11x11 structural comparison
punishes sub-pixel/one-pixel misalignment far harder than masked-mean PSNR
does, and online eval poses are *refined estimates* while offline eval uses
the dataset's exact GT camera. If that's the cause, re-scoring each online
view at the best integer translation of the render (a cheap stand-in for
the unknown residual reprojection) should recover most of the SSIM gap —
and the same probe on an offline run should show ~no headroom.

Usage:  python scripts/ssim_shift_probe.py <output_dir> <dataset_dir>
            [--radius 3] [--json out.json]

Prints per-object zero-shift vs best-shift SSIM/PSNR and the mean |shift|.
This is a diagnostic, not a metric: reported headline numbers stay
zero-shift (the honest protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from romap_tpu.utils.eval_psnr import (  # noqa: E402
    _imread, _read_manifest, _ssim, _stamp_to_image)


def _score(renf, gt, obj_px):
    mse = float(np.mean((renf[obj_px] - gt[obj_px]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-9))
    ga = renf[..., :3].mean(-1) * obj_px
    gb = gt[..., :3].mean(-1) * obj_px
    return psnr, _ssim(ga, gb, obj_px)


def _sharpness_ratio(renf, gt, obj_px):
    """High-frequency energy of the render relative to GT (Laplacian
    variance over object pixels). A ratio well below 1 means the field is
    BLURRED relative to GT — SSIM's contrast/structure terms collapse on
    blur even where masked-mean PSNR stays decent, so this one number can
    explain a low SSIM that integer-shift alignment cannot recover."""
    import cv2

    lap = lambda x: cv2.Laplacian(
        x[..., :3].mean(-1).astype(np.float64), cv2.CV_64F)
    la, lb = lap(renf)[obj_px], lap(gt)[obj_px]
    vb = float(np.var(lb))
    return float(np.var(la)) / vb if vb > 0 else float("nan")


def probe_object(obj_dir: str, dataset: str, radius: int):
    manifest = os.path.join(obj_dir, "test.txt")
    if not os.path.exists(manifest):
        return None
    stamp_map = _stamp_to_image(dataset)
    rows = []
    for v in _read_manifest(manifest):
        name = stamp_map.get(f"{float(v['stamp']):.6f}")
        if name is None:
            continue
        ren = _imread(os.path.join(obj_dir, "test_img", f"{v['stamp']}.png"))
        gt_full = _imread(os.path.join(dataset, "rgb", name))
        inst_full = _imread(os.path.join(dataset, "instance", name))
        if ren is None or gt_full is None or inst_full is None:
            continue
        x, y, h, w = v["x"], v["y"], v["h"], v["w"]
        gt = gt_full[y:y + h, x:x + w].astype(np.float32) / 255.0
        inst = inst_full[y:y + h, x:x + w]
        if inst.ndim == 3:
            inst = inst[..., 0]
        obj_px = inst > 0
        if gt.shape[:2] != ren.shape[:2] or obj_px.sum() < 16:
            continue
        renf = ren.astype(np.float32) / 255.0
        p0, s0 = _score(renf, gt, obj_px)
        best = (s0, p0, 0, 0)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                if dy == 0 and dx == 0:
                    continue
                shifted = np.roll(renf, (dy, dx), axis=(0, 1))
                # interior mask: drop the wrap band so np.roll's wrapped
                # pixels never score
                m = obj_px.copy()
                if dy > 0:
                    m[:dy] = False
                elif dy < 0:
                    m[dy:] = False
                if dx > 0:
                    m[:, :dx] = False
                elif dx < 0:
                    m[:, dx:] = False
                if m.sum() < 16:
                    continue
                p, s = _score(shifted, gt, m)
                if s > best[0]:
                    best = (s, p, dy, dx)
        rows.append(dict(stamp=v["stamp"], ssim0=s0, psnr0=p0,
                         ssim_best=best[0], psnr_best=best[1],
                         dy=best[2], dx=best[3],
                         sharp=_sharpness_ratio(renf, gt, obj_px)))
    if not rows:
        return None
    arr = lambda k: np.array([r[k] for r in rows])
    return {
        "n_views": len(rows),
        "ssim_zero_shift": round(float(arr("ssim0").mean()), 4),
        "ssim_best_shift": round(float(arr("ssim_best").mean()), 4),
        "psnr_zero_shift_db": round(float(arr("psnr0").mean()), 2),
        "psnr_best_shift_db": round(float(arr("psnr_best").mean()), 2),
        "mean_abs_shift_px": round(float(
            np.abs(np.stack([arr("dy"), arr("dx")], -1)).max(-1).mean()), 2),
        "views_preferring_nonzero_shift": int(
            ((arr("dy") != 0) | (arr("dx") != 0)).sum()),
        "sharpness_ratio_vs_gt": round(float(np.nanmean(arr("sharp"))), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("dataset_dir")
    ap.add_argument("--radius", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    out = {}
    for entry in sorted(os.listdir(args.output_dir)):
        obj_dir = os.path.join(args.output_dir, entry)
        if not entry.isdigit() or not os.path.isdir(obj_dir):
            continue
        r = probe_object(obj_dir, args.dataset_dir, args.radius)
        if r:
            out[entry] = r
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if out else 1


if __name__ == "__main__":
    sys.exit(main())
